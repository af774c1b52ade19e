"""Content-encoding kernels (SURVEY §2.6 C13).

The reference gunzips response bodies when ``Content-Encoding: gzip``
(crawler.go:681-689, sitemap.go:260-268, jsonfeed.go:208-216). The real
HTTP backend's client auto-decodes; this kernel exists for pre-fetched
corpora (WARC-style blobs) where bodies arrive still compressed."""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql.functions import pandas_udf


def gzip_decode_udf():
    """binary (maybe-gzip) → string body. Non-gzip passthrough (the
    reference only wraps the reader when the header says gzip)."""

    @pandas_udf("string")
    def gzip_decode(body: pd.Series, encoding: pd.Series) -> pd.Series:
        def one(b: bytes | None, enc: str | None) -> str | None:
            if b is None:
                return None
            if enc == "gzip":
                return gzip.decompress(b).decode("utf-8", errors="replace")
            return bytes(b).decode("utf-8", errors="replace")

        return pd.Series([one(b, e) for b, e in zip(body, encoding)], dtype="object")

    return gzip_decode
