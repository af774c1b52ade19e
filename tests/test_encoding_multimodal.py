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
    8; 24fps integer timestamps; real-decoder path raises."""
    import pytest

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
    with pytest.raises(Exception):
        sample_frames(blobs, use_fake_decoder=False).collect()
