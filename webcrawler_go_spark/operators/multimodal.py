"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode paths (round 3: the container probe found no PIL/cv2/pyav, but
stdlib codecs are real — functions/media_codecs.py):

* ``use_fake_decoder=False`` → REAL decode for formats the stdlib can
  express: PNG (signature/CRC/inflate/filter-reversal pixel math) and
  RIFF/WAV PCM (header parse + sample stats), sniffed by magic bytes.
  Other formats (JPEG/MP4/...) and corrupt payloads emit a NULL-feature
  row with ``decode_error`` set — an honest container boundary that
  keeps per-row isolation (one bad blob never aborts the job).
* ``use_fake_decoder=True`` → deterministic fake features derived from
  payload length (keeps the full Spark path testable for formats with
  no stdlib codec).

Pipeline shape for the 100 TB case:
  blobs (media_ref, media_type, payload binary, meta map)
    → repartition by media_type (codec-homogeneous tasks)
    → mapInPandas decode/extract (Arrow batches of binary)
    → typed feature table (width/height/duration/frames/embedding)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        # per-row decode failure channel: unknown container / corrupt
        # payload yields a null-feature row with the reason here instead
        # of failing the whole Spark task — one bad blob in a 100 TB
        # crawl batch must not abort the job (the extract-empty-never-
        # crash contract the PDF/DOCX extractors follow)
        StructField("decode_error", StringType(), True),
    ]
)


def media_blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Derive deterministic opaque blobs from the documents table —
    payload = UTF-8 bytes of the text (stand-in for image bytes), typed
    by doc_id arithmetic. Real crawls fill this from the fetch kernel's
    media responses."""
    mt = (
        F.when(F.col("doc_id") % 4 == 0, "image")
        .when(F.col("doc_id") % 4 == 1, "audio")
        .when(F.col("doc_id") % 4 == 2, "video")
        .otherwise("pdf")
    )
    return docs.select(
        F.concat(F.lit("media://"), F.col("doc_id").cast("string")).alias("media_ref"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"),
            F.lit("lang"), F.col("lang"),
        ).alias("meta"),
    )


def decode_media(blobs: DataFrame, use_fake_decoder: bool = False) -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas.

    ``use_fake_decoder=True`` → deterministic fake features derived from
    payload length (keeps the full Spark path testable with no codec
    libs). ``False`` → real stdlib decode (PNG, WAV by magic sniff);
    formats with no stdlib codec or corrupt payloads emit a NULL-feature
    row with ``decode_error`` set — per-row isolation, one bad blob
    never aborts the Spark job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake_decoder:
                # real path: stdlib codecs by magic sniff (PNG, WAV);
                # anything else → decode_error row — honest boundary,
                # crash-isolated per row
                from webcrawler_go_spark.functions.media_codecs import (
                    decode_png,
                    decode_wav,
                )

                rows = []
                for ref, mt, payload in zip(
                    b["media_ref"], b["media_type"], b["payload"]
                ):
                    blob = bytes(payload)
                    try:
                        if blob[:8] == b"\x89PNG\r\n\x1a\n":
                            w, h, _ch, _px = decode_png(blob)
                            rows.append((ref, mt, len(blob), w, h, None, None))
                        elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                            d = decode_wav(blob)
                            rows.append(
                                (ref, mt, len(blob), None, None, d["n_samples"], None)
                            )
                        else:
                            rows.append(
                                (ref, mt, len(blob), None, None, None,
                                 "no stdlib codec for this format "
                                 "(real paths: PNG, WAV)")
                            )
                    except Exception as exc:  # noqa: BLE001 — per-row isolation
                        rows.append(
                            (ref, mt, len(blob), None, None, None,
                             f"{type(exc).__name__}: {exc}")
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_ref", "media_type", "n_bytes",
                        "width", "height", "n_frames", "decode_error",
                    ],
                ).astype(
                    {"n_bytes": "int64", "width": "Int32",
                     "height": "Int32", "n_frames": "Int32"}
                )
                continue
            n = b["payload"].map(len)
            is_img = b["media_type"] == "image"
            is_vid = b["media_type"] == "video"
            yield pd.DataFrame(
                {
                    "media_ref": b["media_ref"],
                    "media_type": b["media_type"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 1920 + 1).where(is_img | is_vid).astype("Int32"),
                    "height": (n % 1080 + 1).where(is_img | is_vid).astype("Int32"),
                    "n_frames": (n % 240 + 1).where(is_vid).astype("Int32"),
                    "decode_error": pd.Series([None] * len(b), dtype="object"),
                }
            )

    # codec-homogeneous tasks: one partition decodes one media_type batch
    return blobs.repartition("media_type").mapInPandas(kernel, MEDIA_FEATURES)


FRAME_ROWS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("decode_error", StringType(), True),
    ]
)

FAKE_FPS = 24


def sample_frames(
    blobs: DataFrame,
    every: int = 10,
    max_frames: int = 8,
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Frame sampling over video blobs via mapInPandas: every ``every``-th
    frame, at most ``max_frames`` per video, with the frame timestamp at
    the fake container's 24 fps. Same stub policy as ``decode_media`` —
    the batch/partitioning/schema plumbing is real; the codec math is a
    deterministic fake (frame count = payload length mod 240 + 1).

    Per-row isolation (round-5 directive #6, symmetric with
    ``decode_media``): a blob the kernel cannot sample — including the
    honest no-codec-libs boundary on the real path — emits ONE row with
    NULL frame columns and ``decode_error`` set; it never raises in-kernel,
    so one bad blob never aborts the Spark job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            vids = b[b["media_type"] == "video"]
            refs: list = []
            idxs: list = []
            tss: list = []
            errs: list = []
            for ref, payload in zip(vids["media_ref"], vids["payload"]):
                try:
                    if not use_fake_decoder:
                        raise NotImplementedError(
                            "video decoding requires codec libraries not "
                            "present in this container; pass "
                            "use_fake_decoder=True"
                        )
                    n_frames = len(payload) % 240 + 1
                    taken = 0
                    for fi in range(0, n_frames, every):
                        if taken >= max_frames:
                            break
                        refs.append(ref)
                        idxs.append(fi)
                        tss.append(fi * 1000 // FAKE_FPS)
                        errs.append(None)
                        taken += 1
                except Exception as exc:  # noqa: BLE001 — per-row isolation
                    refs.append(ref)
                    idxs.append(None)
                    tss.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="Int32"),
                    "ts_ms": pd.Series(tss, dtype="Int64"),
                    "decode_error": pd.Series(errs, dtype="object"),
                }
            )

    return blobs.repartition("media_type").mapInPandas(kernel, FRAME_ROWS)
