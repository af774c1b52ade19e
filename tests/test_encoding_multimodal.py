"""gzip decode kernel (C13) + multimodal decode plumbing."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from webcrawler_go_spark.functions.encoding import gzip_decode_udf
from webcrawler_go_spark.operators.multimodal import (
    decode_media,
    media_blobs_from_documents,
)


def test_gzip_decode_roundtrip(spark):
    rows = [
        (gzip.compress("hello <a href='/x'>link</a>".encode()), "gzip"),
        (b"plain body", None),
        (None, "gzip"),
    ]
    df = spark.createDataFrame(rows, "body binary, encoding string")
    got = [
        r.decoded
        for r in df.select(
            gzip_decode_udf()(F.col("body"), F.col("encoding")).alias("decoded")
        ).collect()
    ]
    assert got == ["hello <a href='/x'>link</a>", "plain body", None]


def test_media_decode_fake(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 100, "en", "s"), (1, "y" * 50, "en", "s"),
         (2, "z" * 75, "en", "s"), (3, "w" * 20, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    feats = decode_media(media_blobs_from_documents(docs), use_fake_decoder=True)
    rows = {r.media_ref: r for r in feats.collect()}
    assert rows["media://0"].media_type == "image"
    assert rows["media://0"].width == 100 % 1920 + 1
    assert rows["media://1"].media_type == "audio"
    assert rows["media://1"].width is None
    assert rows["media://2"].media_type == "video"
    assert rows["media://2"].n_frames == 75 % 240 + 1
    assert rows["media://3"].n_bytes == 20


def test_media_decode_real_path_unknown_format_error_row(spark):
    """Text bytes are no known container: the real path emits a
    null-feature decode_error row rather than raising (per-row
    isolation)."""
    docs = spark.createDataFrame(
        [(0, "x", "en", "s")], "doc_id long, text string, lang string, source string"
    )
    feats = decode_media(media_blobs_from_documents(docs), use_fake_decoder=False)
    rows = feats.collect()
    assert len(rows) == 1
    assert rows[0].width is None and "codec" in rows[0].decode_error


def test_sample_frames_plumbing(spark):
    """Frame sampling: only video blobs emit rows; every 10th frame up to
    8; 24fps integer timestamps; the real-decoder path emits per-row
    decode_error rows (honest no-codec-libs boundary), never raises."""
    from webcrawler_go_spark.operators.multimodal import sample_frames

    blobs = spark.createDataFrame(
        [
            ("media://v", "video", bytearray(b"x" * 95), {}),
            ("media://i", "image", bytearray(b"y" * 500), {}),
        ],
        "media_ref string, media_type string, payload binary, meta map<string,string>",
    )
    rows = sample_frames(blobs, every=10, max_frames=8, use_fake_decoder=True).collect()
    # 95 bytes → 96 frames → idx 0,10,...,70 (max 8)
    assert [(r.media_ref, r.frame_idx, r.ts_ms) for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        ("media://v", fi, fi * 1000 // 24) for fi in range(0, 80, 10)
    ]
    assert all(r.decode_error is None for r in rows)
    real = sample_frames(blobs, use_fake_decoder=False).collect()
    assert len(real) == 1  # one error row per video blob, image skipped
    assert real[0].media_ref == "media://v"
    assert real[0].frame_idx is None and real[0].ts_ms is None
    assert "codec" in real[0].decode_error


def test_sample_frames_bad_blob_isolated(spark):
    """Round-5 directive #6 contract: ONE bad blob (null payload) emits
    an error row while the good blobs in the same batch still sample —
    the job never fails (symmetric with decode_media)."""
    from webcrawler_go_spark.operators.multimodal import sample_frames

    blobs = spark.createDataFrame(
        [
            ("media://good", "video", bytearray(b"x" * 25), {}),
            ("media://bad", "video", None, {}),
        ],
        "media_ref string, media_type string, payload binary, meta map<string,string>",
    )
    rows = sample_frames(blobs, every=10, max_frames=8, use_fake_decoder=True).collect()
    good = [r for r in rows if r.media_ref == "media://good"]
    bad = [r for r in rows if r.media_ref == "media://bad"]
    # 25 bytes → 26 frames → idx 0,10,20
    assert sorted(r.frame_idx for r in good) == [0, 10, 20]
    assert all(r.decode_error is None for r in good)
    assert len(bad) == 1 and bad[0].frame_idx is None
    assert bad[0].decode_error
