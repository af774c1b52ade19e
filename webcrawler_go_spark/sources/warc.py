"""WARC (ISO 28500 / WARC 1.0) reader + writer, Spark-first.

The reference crawler saves each capture as a loose file on disk
(`filesave.go:21-60`, one sanitized filename per page); the archival
ecosystem's interchange format for exactly that payload is WARC, and
every large public crawl corpus (Common Crawl among them) ships as
`.warc.gz`. This module gives the engine a real ingest path for it:

* **Writer** (`make_warc_gz`): response records, each compressed as its
  OWN gzip member and concatenated — the Common Crawl convention. That
  per-record framing is what makes a 1 GB archive random-accessible
  (seek to a member offset, inflate one record) and is the scale story
  for the CDX query below.
* **Parser** (`iter_warc_members` / `parse_warc_record`): walks gzip
  members with `zlib.decompressobj(wbits=31)` and its `unused_data`
  tail, recording each member's byte offset and compressed length,
  then parses the WARC named-field head and the wrapped HTTP response.
  Stdlib only; per-record decode budget (the decompression-bomb guard
  `doc_extract._MAX_STREAM_BYTES` established for PDF streams).
* **Distributed read** (`warc_records`): `mapInPandas` over one row
  per archive file — file-per-task granularity, which is how real
  WARC processing distributes (a 100 TB crawl is ~100k files of ~1 GB;
  the unit of parallelism is the file, and within-file member offsets
  enable finer splits when needed). Output is a flat record table.
* **CDX index** (`cdx_index`): the capture-index row per record —
  SURT url key, 14-digit timestamp, status, SHA-1 payload digest,
  member offset/length, filename — computed entirely with codegen
  built-ins (split/reverse/sha1), no Python in the hot path.

Malformed members/records never raise out of the kernel: a bad record
becomes a row with `parse_error` set (the `decode_media` per-row
isolation contract).
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-record inflate budget — same rationale and size as the PDF
# stream budget (doc_extract._MAX_STREAM_BYTES): fetched bytes are
# untrusted, a few-KB member must not inflate to GBs on an executor.
_MAX_RECORD_BYTES = 64 * 1024 * 1024

_REASON = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
           403: "Forbidden", 500: "Internal Server Error"}


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def make_warc_record(
    uri: str,
    date: str,
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html",
    record_id: str | None = None,
) -> bytes:
    """One uncompressed WARC response record: WARC named-field head,
    blank line, HTTP response block, two CRLF record separators."""
    http_head = (
        f"HTTP/1.1 {status} {_REASON.get(status, 'Unknown')}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    block = http_head + payload
    if record_id is None:
        record_id = f"<urn:uuid:{zlib.crc32(uri.encode()):08x}>"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + b"\r\n\r\n"


def make_warc_gz(records: list[bytes]) -> bytes:
    """Concatenated per-record gzip members (the splittable framing).

    `zlib.compressobj(wbits=31)` writes a gzip wrapper with mtime 0 —
    byte-deterministic for a given input, which the CDX offset oracle
    relies on (distributed and sequential runs produce identical
    archives)."""
    out = bytearray()
    for rec in records:
        c = zlib.compressobj(level=6, wbits=31)
        out += c.compress(rec) + c.flush()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def iter_warc_members(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, inflated_bytes) per gzip
    member. An undecodable REGION (zlib error mid-archive) yields a
    marker tuple (offset, skipped_length, None) and the walk resyncs at
    the next gzip magic — the record kernels turn markers into
    `parse_error` rows, so one corrupt member never silently drops the
    rest of the archive (and the file-per-task and split readers emit
    the SAME rows on corrupt input). A member whose inflation exceeds
    the per-record budget (decompression-bomb guard) yields the same
    marker shape with ``_BUDGET_EXCEEDED`` as the third element — an
    error ROW downstream, never a task failure. A truncated final
    member still ends the walk silently, mirroring real-world
    truncated archives."""
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(blob[pos:], _MAX_RECORD_BYTES + 1)
        except zlib.error:
            nxt = blob.find(b"\x1f\x8b\x08", pos + 1)
            end = nxt if nxt != -1 else n
            yield pos, end - pos, None
            pos = end
            continue
        if len(raw) > _MAX_RECORD_BYTES:
            # Decompression-bomb guard. Find the member's TRUE extent by
            # DRAINING the inflater in bounded chunks (output discarded)
            # instead of scanning for the next gzip magic: a multi-MB
            # hostile member's compressed bytes near-certainly contain a
            # false \x1f\x8b\x08, and a magic-scan marker would record a
            # wrong member_length — the split reader then inflates the
            # truncated slice WITHOUT error and ingests the bomb as a
            # clean record (round-7 review finding, test-reproduced with
            # an incompressible bomb). Draining costs CPU bounded by the
            # attacker's own compressed bytes and ≤1 MiB memory.
            try:
                while not d.eof and d.unconsumed_tail:
                    d.decompress(d.unconsumed_tail, 1 << 20)
            except zlib.error:
                nxt = blob.find(b"\x1f\x8b\x08", pos + 1)
                end = nxt if nxt != -1 else n
                yield pos, end - pos, None
                pos = end
                continue
            if not d.eof:  # truncated over-budget tail ends the walk
                return
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                return
            yield pos, consumed, _BUDGET_EXCEEDED  # the str marker
            pos += consumed
            continue
        if not d.eof:  # truncated member
            return
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            return
        yield pos, consumed, raw
        pos += consumed


def parse_warc_record(raw: bytes) -> dict:
    """Parse one inflated record → flat field dict. WARC field names
    are case-insensitive (ISO 28500 §5.1); the HTTP block is split off
    by the record head's Content-Length."""
    head, sep, rest = raw.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("no WARC head terminator")
    lines = head.split(b"\r\n")
    if not lines[0].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        k, s, v = ln.partition(b":")
        if s:
            fields[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
    clen = int(fields.get("content-length", "0"))
    block = rest[:clen]
    rec = {
        "record_id": fields.get("warc-record-id", ""),
        "warc_type": fields.get("warc-type", ""),
        "target_uri": fields.get("warc-target-uri", ""),
        "warc_date": fields.get("warc-date", ""),
        "http_status": None,
        "mime": None,
        "payload": b"",
    }
    if rec["warc_type"] == "response" and fields.get("content-type", "").startswith(
        "application/http"
    ):
        http_head, hsep, body = block.partition(b"\r\n\r\n")
        status_line = http_head.split(b"\r\n", 1)[0].split()
        if len(status_line) >= 2 and status_line[0].startswith(b"HTTP/"):
            rec["http_status"] = int(status_line[1])
        for ln in http_head.split(b"\r\n")[1:]:
            k, s, v = ln.partition(b":")
            if s and k.strip().lower() == b"content-type":
                rec["mime"] = v.strip().decode("ascii", "replace")
        rec["payload"] = body if hsep else b""
    else:
        rec["payload"] = block
    return rec


# ---------------------------------------------------------------------------
# distributed read
# ---------------------------------------------------------------------------

_RECORDS_SCHEMA = (
    "filename string, member_offset long, member_length long, "
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, http_status int, mime string, "
    "content_length long, payload string, parse_error string"
)


# Canonical parse_error text for a member that does not inflate: both
# read paths emit THIS string (not the zlib exception text, which varies
# with where in the stream zlib gives up) so the file-per-task and
# split readers stay row-identical on corrupt archives.
_ZLIB_ERROR_ROW = "zlib.error: undecodable member"
# Canonical row for a member tripping the decompression-bomb budget —
# an ERROR ROW, never a task failure: at 10^5 archives per job one
# hostile member must not kill the run. Sentinel distinguishes it from
# the zlib marker in iter_warc_members' (offset, length, raw) stream.
_BUDGET_ERROR_ROW = "ValueError: WARC member exceeds per-record budget"
# The budget marker travels through iter_warc_members' raw slot as this
# STRING (bytes = real member, None = zlib marker, str = budget marker):
# a plain `object()` sentinel breaks identity across the cloudpickle
# boundary — nested kernels capture module globals BY VALUE, so the
# worker-side copy would never `is`-match the module's own sentinel.
_BUDGET_EXCEEDED = _BUDGET_ERROR_ROW

_RECORDS_COLUMNS = [
    "filename", "member_offset", "member_length", "record_id",
    "warc_type", "target_uri", "warc_date", "http_status",
    "mime", "content_length", "payload", "parse_error",
]


def _record_row(fname: str, off: int, ln: int, raw: bytes) -> dict:
    """One inflated member → one flat record-table row; parse failures
    become `parse_error` rows (per-row isolation, never a task
    failure). Shared by the file-per-task and split-read kernels so
    both paths produce byte-identical rows."""
    base = {
        "filename": fname, "member_offset": off,
        "member_length": ln, "record_id": None,
        "warc_type": None, "target_uri": None,
        "warc_date": None, "http_status": None,
        "mime": None, "content_length": None,
        "payload": None, "parse_error": None,
    }
    try:
        rec = parse_warc_record(raw)
        base.update(
            record_id=rec["record_id"],
            warc_type=rec["warc_type"],
            target_uri=rec["target_uri"],
            warc_date=rec["warc_date"],
            http_status=rec["http_status"],
            mime=rec["mime"],
            content_length=len(rec["payload"]),
            payload=rec["payload"].decode("utf-8", "replace"),
        )
    except (ValueError, UnicodeDecodeError) as exc:
        base["parse_error"] = f"{type(exc).__name__}: {exc}"
    return base


def warc_records(
    files: DataFrame, name_col: str = "filename", blob_col: str = "content"
) -> DataFrame:
    """Archive files → one row per WARC record.

    Input is one row per archive (`binaryFile` layout: path + bytes);
    parallelism is per file, the real-world WARC processing unit. A
    malformed member yields a `parse_error` row for that member and the
    walk continues — one bad record never fails the task, whether the
    member inflates-but-misparses (WARC error) or doesn't inflate at
    all (zlib error → resync at the next gzip magic). Record-set
    equality with `warc_records_split` holds on corrupt archives too:
    both paths emit the same canonical `zlib.error` row for an
    undecodable region. When one hot archive would pin a task, use
    `warc_records_split`."""

    def kernel(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for fname, blob in zip(b[name_col], b[blob_col]):
                blob = bytes(blob)
                for off, ln, raw in iter_warc_members(blob):
                    if raw is None or isinstance(raw, str):
                        row = dict.fromkeys(_RECORDS_COLUMNS)
                        row.update(
                            filename=fname, member_offset=off,
                            member_length=ln,
                            parse_error=(
                                _ZLIB_ERROR_ROW if raw is None else raw
                            ),
                        )
                        rows.append(row)
                    else:
                        rows.append(_record_row(fname, off, ln, raw))
            yield pd.DataFrame(rows, columns=_RECORDS_COLUMNS)

    return files.mapInPandas(kernel, _RECORDS_SCHEMA)


def warc_member_splits(
    offsets: DataFrame, n_splits: int = 2
) -> DataFrame:
    """Member-offset sidecar (filename, member_offset, member_length) →
    one row per (filename, split_id) with that split's pos-sorted member
    list. Members are bucketed by BYTE position into ``n_splits``
    equal byte-range buckets per file (split_id = ⌊offset·n/filelen⌋,
    clamped) — so a split covers a contiguous compressed byte range,
    the unit a ranged read fetches."""
    flen = offsets.groupBy("filename").agg(
        F.max(F.col("member_offset") + F.col("member_length")).alias("_flen")
    )
    bucketed = offsets.join(F.broadcast(flen), "filename").select(
        "filename",
        "member_offset",
        "member_length",
        # integer div, not float floor: float64 ⌊a·n/b⌋ can round up at
        # the boundary once a·n approaches 2^53 (multi-PB archives);
        # `div` matches the oracle's `//` bit-for-bit at every size
        F.least(
            F.expr(f"member_offset * {n_splits} div _flen"),
            F.lit(n_splits - 1).cast("long"),
        ).cast("int").alias("split_id"),
    )
    return bucketed.groupBy("filename", "split_id").agg(
        F.array_sort(
            F.collect_list(F.struct("member_offset", "member_length"))
        ).alias("members")
    )


def warc_records_split(
    files: DataFrame,
    offsets: DataFrame,
    n_splits: int = 2,
    name_col: str = "filename",
    blob_col: str = "content",
    num_partitions: int | None = None,
) -> DataFrame:
    """(file, offset-range)-split WARC read: the per-record gzip framing
    makes an archive random-accessible, and the member offsets the CDX
    path already computes are the split table. Each (file, split_id)
    task inflates ONLY its byte slices [offset, offset+length) — so one
    hot 1 GB archive spreads across ``n_splits`` tasks instead of
    pinning one. Record-set equality with `warc_records` is the
    contract (asserted in tests): same rows, same offsets, same
    parse-error isolation.

    ``offsets`` is (filename, member_offset, member_length) — in
    production the CDX sidecar, here typically a prior light pass. The
    explicit repartition on (filename, split_id) is what turns the
    buckets into separate tasks; in this sandbox the blob column rides
    the join once per split, where a real object store serves the slice
    as a ranged GET (the join stands in for it — keys + offsets are
    what shuffles, plus n_splits blob copies, not one row per member)."""
    groups = warc_member_splits(offsets, n_splits=n_splits)
    joined = files.select(
        F.col(name_col).alias("filename"), F.col(blob_col).alias("_blob")
    ).join(groups, "filename")
    # rangepartitioning, not hash: with few (file, split) keys — the
    # hot-archive case this path exists for — hash can collide both
    # splits into one task; range boundaries separate distinct keys
    # whenever partitions ≥ keys. An EXPLICIT num_partitions pins the
    # spread (user-specified repartition is exempt from AQE partition
    # coalescing — the mechanism demo on small data); the default lets
    # AQE size the tasks, which is right when slices are ~100s of MB.
    if num_partitions is not None:
        joined = joined.repartitionByRange(
            num_partitions, F.col("filename"), F.col("split_id")
        )
    else:
        joined = joined.repartitionByRange(F.col("filename"), F.col("split_id"))

    def kernel(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for fname, blob, split_id, members in zip(
                b["filename"], b["_blob"], b["split_id"], b["members"]
            ):
                blob = bytes(blob)
                for mem in members:
                    off = int(mem["member_offset"])
                    ln = int(mem["member_length"])
                    d = zlib.decompressobj(wbits=31)
                    try:
                        raw = d.decompress(
                            blob[off : off + ln], _MAX_RECORD_BYTES + 1
                        )
                        if len(raw) > _MAX_RECORD_BYTES:
                            raise ValueError(_BUDGET_ERROR_ROW)
                        if not d.eof:
                            # slice didn't contain a complete member
                            # (wrong/foreign sidecar offsets): corrupt
                            # row, never a silently-truncated payload
                            raise zlib.error("incomplete member slice")
                        row = _record_row(fname, off, ln, raw)
                    except (zlib.error, ValueError) as exc:
                        row = dict.fromkeys(_RECORDS_COLUMNS)
                        row.update(
                            filename=fname, member_offset=off,
                            member_length=ln,
                            parse_error=(
                                _BUDGET_ERROR_ROW
                                if isinstance(exc, ValueError)
                                else _ZLIB_ERROR_ROW
                            ),
                        )
                    row["split_id"] = int(split_id)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=_RECORDS_COLUMNS + ["split_id"])

    return joined.mapInPandas(kernel, _RECORDS_SCHEMA + ", split_id int")


# ---------------------------------------------------------------------------
# CDX capture index
# ---------------------------------------------------------------------------


def cdx_index(records: DataFrame) -> DataFrame:
    """Record table → CDX capture-index rows, all codegen built-ins.

    * `urlkey` — SURT form: host split on '.', segments reversed and
      comma-joined, then ')' + path (`com,example)/page`).
    * `timestamp` — the WARC-Date's digits (14-digit CDX form).
    * `digest` — SHA-1 hex of the payload (CDX convention is SHA-1;
      hex here rather than base32 to stay in one built-in).
    * `member_offset`/`member_length`/`filename` — the random-access
      triple: seek, read `member_length` bytes, inflate one member.

    Sorted by (urlkey, timestamp): CDX files are merge-sorted shards,
    and a global sort on the key is exactly Spark's range-partitioned
    `orderBy` — no single-reducer bottleneck at scale."""
    host = F.regexp_extract("target_uri", r"^[a-z+]+://([^/]+)", 1)
    path = F.regexp_extract("target_uri", r"^[a-z+]+://[^/]+(/.*)?$", 1)
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(path == "", "/").otherwise(path),
    )
    return (
        records.filter(F.col("parse_error").isNull())
        .select(
            urlkey.alias("urlkey"),
            F.regexp_replace("warc_date", r"[^0-9]", "").alias("timestamp"),
            F.col("target_uri").alias("original"),
            F.col("mime"),
            F.col("http_status").alias("status"),
            F.sha1(F.encode("payload", "UTF-8")).alias("digest"),
            F.col("member_length").alias("length"),
            F.col("member_offset").alias("offset"),
            F.col("filename"),
        )
        .orderBy("urlkey", "timestamp")
    )
