"""WARC reader/writer: member framing, offsets, per-row isolation, CDX."""

import hashlib
import zlib

import pytest

from webcrawler_go_spark.sources.warc import (
    iter_warc_members,
    make_warc_gz,
    make_warc_record,
    parse_warc_record,
)


def _recs(n=5):
    return [
        make_warc_record(
            f"https://h{i}.example.org/p/{i}",
            f"2024-03-15T10:00:{i:02d}Z",
            f"payload number {i} with some text".encode(),
            status=404 if i % 3 == 0 else 200,
            content_type="text/plain" if i % 3 == 0 else "text/html",
        )
        for i in range(n)
    ]


def test_roundtrip_fields_and_payload():
    blob = make_warc_gz(_recs())
    out = [parse_warc_record(raw) for _o, _l, raw in iter_warc_members(blob)]
    assert len(out) == 5
    for i, rec in enumerate(out):
        assert rec["target_uri"] == f"https://h{i}.example.org/p/{i}"
        assert rec["warc_type"] == "response"
        assert rec["http_status"] == (404 if i % 3 == 0 else 200)
        assert rec["payload"] == f"payload number {i} with some text".encode()
        assert rec["mime"] == ("text/plain" if i % 3 == 0 else "text/html")


def test_member_offsets_allow_random_access():
    """The CDX promise: seek to offset, read length bytes, inflate ONE
    member — without touching the rest of the archive."""
    blob = make_warc_gz(_recs())
    members = list(iter_warc_members(blob))
    assert [m[0] for m in members] == sorted(m[0] for m in members)
    assert members[0][0] == 0
    for off, ln, raw in members:
        one = zlib.decompressobj(wbits=31).decompress(blob[off : off + ln])
        assert one == raw
    # members tile the file exactly
    assert members[-1][0] + members[-1][1] == len(blob)


def test_writer_bytes_deterministic():
    assert make_warc_gz(_recs()) == make_warc_gz(_recs())


def test_truncated_tail_tolerated():
    blob = make_warc_gz(_recs(3))
    cut = blob[: len(blob) - 7]  # slice into the last member
    members = list(iter_warc_members(cut))
    assert len(members) == 2  # complete members survive, truncation stops the walk


def test_garbage_member_stops_walk_cleanly():
    blob = make_warc_gz(_recs(2)) + b"not gzip at all"
    assert len(list(iter_warc_members(blob))) == 2


def test_parse_error_isolated_per_row(spark):
    """One malformed member in an archive yields a parse_error row; the
    good members still come through — the decode_media contract."""
    import pandas as pd

    from webcrawler_go_spark.sources.warc import warc_records

    bad = zlib.compressobj(wbits=31)
    bad_member = bad.compress(b"GARBAGE no warc head here") + bad.flush()
    blob = make_warc_gz(_recs(2)) + bad_member + make_warc_gz(_recs(1))
    files = spark.createDataFrame(
        pd.DataFrame({"filename": ["f.warc.gz"], "content": [blob]})
    )
    rows = warc_records(files).collect()
    assert len(rows) == 4
    errs = [r for r in rows if r.parse_error is not None]
    assert len(errs) == 1 and "WARC" in errs[0].parse_error
    assert sum(r.http_status == 200 for r in rows if r.parse_error is None) >= 1


def test_record_budget_guard():
    """A small member inflating past the per-record budget raises inside
    iter (the kernel maps it to parse_error-free task failure is NOT ok,
    so warc_records wraps per file — here we check the guard exists)."""
    from webcrawler_go_spark.sources import warc as W

    old = W._MAX_RECORD_BYTES
    W._MAX_RECORD_BYTES = 64
    try:
        blob = make_warc_gz([make_warc_record("https://x.example.org/", "2024-01-01T00:00:00Z", b"A" * 1000)])
        with pytest.raises(ValueError, match="budget"):
            list(iter_warc_members(blob))
    finally:
        W._MAX_RECORD_BYTES = old


def test_cdx_matches_python_reference(spark):
    """cdx_index's codegen SURT/digest/timestamp vs an independent
    Python derivation."""
    import pandas as pd

    from webcrawler_go_spark.sources.warc import cdx_index, warc_records

    blob = make_warc_gz(_recs())
    files = spark.createDataFrame(
        pd.DataFrame({"filename": ["f.warc.gz"], "content": [blob]})
    )
    got = {r.urlkey: r for r in cdx_index(warc_records(files)).collect()}
    members = list(iter_warc_members(blob))
    assert len(got) == 5
    for i, (off, ln, _raw) in enumerate(members):
        key = f"org,example,h{i})/p/{i}"
        r = got[key]
        assert r.timestamp == f"202403151000{i:02d}"
        assert r.offset == off and r.length == ln
        payload = f"payload number {i} with some text".encode()
        assert r.digest == hashlib.sha1(payload).hexdigest()
        assert r.status == (404 if i % 3 == 0 else 200)
