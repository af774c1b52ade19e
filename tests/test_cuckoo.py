"""Cuckoo seen-filter: no false negatives, bounded FPP, deletion works
(the visited.Delete property Bloom lacks)."""

from __future__ import annotations

import numpy as np

from webcrawler_go_spark.operators.cuckoo import NumpyCuckoo


def test_no_false_negatives_and_fpp():
    n = 20_000
    keys = np.arange(n, dtype=np.int64) * 2_654_435_761
    cf = NumpyCuckoo(n)
    assert cf.add_many(keys) == n
    assert cf.contains_many(keys).all()
    absent = np.arange(n, dtype=np.int64) * 2_654_435_761 + 1
    fpp = cf.contains_many(absent).mean()
    assert fpp < 0.05, fpp


def test_delete_restores_negative():
    cf = NumpyCuckoo(1000)
    keys = np.arange(100, dtype=np.int64) * 7919
    cf.add_many(keys)
    assert cf.contains_many(keys[:1]).all()
    assert cf.delete(int(np.uint64(keys[0])))
    # deleted key usually reads absent (unless another key shares its
    # fingerprint+buckets — not the case in this tiny fixture)
    assert not cf.contains_many(keys[:1]).any()
    # the rest are untouched
    assert cf.contains_many(keys[1:]).all()
