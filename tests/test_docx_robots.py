"""Real DOCX extraction (X5) + robots.txt parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_go_spark.functions.robots import parse_robots_txt
from webcrawler_go_spark.operators.doc_extract import (
    docx_contains,
    docx_paragraphs,
    extract_docx_documents,
    make_docx,
)
from webcrawler_go_spark.operators.politeness import apply_robots


def test_docx_paragraph_run_order():
    payload = make_docx(["First paragraph here", "Second one", "needle inside"])
    assert docx_paragraphs(payload) == [
        "First paragraph here",
        "Second one",
        "needle inside",
    ]
    assert docx_contains(payload, "needle")       # parser/docx.go:25
    assert not docx_contains(payload, "absent")


def test_extract_docx_documents_df(spark):
    blobs = spark.createDataFrame(
        [("doc://a", make_docx(["alpha", "beta"])), ("doc://b", make_docx(["gamma"]))],
        "media_ref string, payload binary",
    )
    got = {r.doc_id: [(s.kind, s.text, s.offset) for s in r.spans]
           for r in extract_docx_documents(blobs).collect()}
    assert got["doc://a"] == [("text", "alpha", 0), ("text", "beta", 1)]
    assert got["doc://b"] == [("text", "gamma", 0)]


ROBOTS = """
# comments ignored
User-agent: *
Disallow: /private/
Allow: /private/public/

User-agent: evilbot
Disallow: /

User-agent: goodbot
Disallow: /only-for-good/
"""


def test_parse_robots_txt(spark):
    bodies = spark.createDataFrame([("h.test", ROBOTS)], "host string, body string")
    rules = {
        (r.rule, r.path_pfx) for r in parse_robots_txt(bodies).collect()
    }
    assert rules == {("deny", "/private/"), ("allow", "/private/public/")}
    good = {
        (r.rule, r.path_pfx)
        for r in parse_robots_txt(bodies, user_agent="goodbot").collect()
    }
    # RFC 9309 §2.2.1: the specific group REPLACES '*' — goodbot gets
    # only its own rules, not evilbot's and not the '*' group's
    assert good == {("deny", "/only-for-good/")}


def test_robots_star_applies_only_without_specific_group(spark):
    """'*' rules apply on hosts with no exact-agent group; hosts with one
    use it exclusively."""
    both = "User-agent: *\nDisallow: /a/\n\nUser-agent: mybot\nDisallow: /b/\n"
    star_only = "User-agent: *\nDisallow: /c/\n"
    bodies = spark.createDataFrame(
        [("h1.test", both), ("h2.test", star_only)], "host string, body string"
    )
    rules = {
        (r.host, r.rule, r.path_pfx)
        for r in parse_robots_txt(bodies, user_agent="mybot").collect()
    }
    assert rules == {("h1.test", "deny", "/b/"), ("h2.test", "deny", "/c/")}


def test_robots_end_to_end_with_apply(spark):
    """Parsed rules drive the scheduler filter: longest prefix wins,
    tie → allow."""
    bodies = spark.createDataFrame([("h.test", ROBOTS)], "host string, body string")
    rules = parse_robots_txt(bodies)
    frontier = spark.createDataFrame(
        [
            ("u1", "h.test", "/private/secret", 1),
            ("u2", "h.test", "/private/public/page", 2),
            ("u3", "h.test", "/open", 3),
            ("u4", "other.test", "/private/x", 4),  # host without rules
        ],
        "url_norm string, host string, path string, url_hash long",
    )
    allowed = {r.url_norm for r in apply_robots(frontier, rules).collect()}
    assert allowed == {"u2", "u3", "u4"}


# --- PDF (X4) ---------------------------------------------------------------

PDF_TRICKY = "parens (nested) \\ backslash\ttab"


def test_pdf_roundtrip_and_escapes():
    from webcrawler_go_spark.operators.doc_extract import (
        make_pdf,
        pdf_contains,
        pdf_text_blocks,
    )

    pdf = make_pdf(["Hello PDF world", PDF_TRICKY, "find https://h.test/x here"])
    blocks = pdf_text_blocks(pdf)
    assert blocks == ["Hello PDF world", PDF_TRICKY, "find https://h.test/x here"]
    assert pdf_contains(pdf, "https://h.test/x")       # parser/pdf.go contract
    assert not pdf_contains(pdf, "absent-needle")
    # uncompressed stream path
    blocks_u = pdf_text_blocks(make_pdf(["plain"], compress=False))
    assert blocks_u == ["plain"]


def test_pdf_tj_arrays_hex_and_octal():
    import zlib

    from webcrawler_go_spark.operators.doc_extract import pdf_text_blocks

    content = (
        b"BT [(kern) -120 (ed)] TJ <2048455821> Tj (\\101\\102) Tj "
        b"(line\\nbreak) ' ET"
    )
    comp = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream endobj\n"
    )
    assert pdf_text_blocks(pdf) == ["kerned HEX!ABline\nbreak"]


def test_pdf_garbage_and_unsupported_filters_extract_nothing():
    from webcrawler_go_spark.operators.doc_extract import pdf_text_blocks

    assert pdf_text_blocks(b"not a pdf at all") == []
    bad = (
        b"1 0 obj << /Length 4 /Filter /LZWDecode >>\nstream\nXXXX\nendstream"
    )
    assert pdf_text_blocks(bad) == []  # skip, don't raise (pdf.go contract)


def test_pdf_extract_documents_spark(spark):
    from webcrawler_go_spark.operators.doc_extract import (
        extract_pdf_documents,
        make_pdf,
    )

    blobs = spark.createDataFrame(
        [("a.pdf", bytearray(make_pdf(["page one", "page two"])))],
        "media_ref string, payload binary",
    )
    rows = extract_pdf_documents(blobs).collect()
    assert len(rows) == 1
    assert [(s["kind"], s["text"], s["offset"]) for s in rows[0].spans] == [
        ("text", "page one", 0),
        ("text", "page two", 1),
    ]


def test_robots_ruleless_specific_group_overrides_star(spark):
    """A specific group with NO allow/disallow rules (e.g. only
    Crawl-delay) still overrides '*' — per RFC 9309 that agent is fully
    allowed, not subject to the '*' denies."""
    body = "User-agent: ourbot\nCrawl-delay: 10\n\nUser-agent: *\nDisallow: /\n"
    bodies = spark.createDataFrame([("h.test", body)], "host string, body string")
    rules = parse_robots_txt(bodies, user_agent="ourbot").collect()
    assert rules == []  # no rules → everything allowed for ourbot


# -- CID / Identity-H PDFs (round-3 directive #7) ---------------------------

def test_pdf_cid_roundtrip_bfchar_and_bfrange():
    from webcrawler_go_spark.operators.doc_extract import (
        make_pdf_cid,
        pdf_cid_fonts,
        pdf_text_blocks,
    )

    texts = ["Hello CID 0123!", "page two (parens) \\ slash", "42 digits 9876543210"]
    blob = make_pdf_cid(texts)
    fonts = pdf_cid_fonts(blob)
    assert "F1" in fonts and len(fonts["F1"]) > 0
    # digits arrive via the scalar bfrange; letters via bfchar — both must
    # survive the non-identity (cid = cp + 7) mapping
    assert pdf_text_blocks(blob) == texts
    assert pdf_text_blocks(make_pdf_cid(texts, compress=False)) == texts


def test_pdf_cid_unmapped_codes_extract_empty_not_wrong():
    """CID strings whose codes have no ToUnicode entry extract as empty —
    the documented boundary (reference shells to pdfcpu which has full
    font machinery; parser/pdf.go:40-46 substring-search tolerates empty)."""
    from webcrawler_go_spark.operators.doc_extract import (
        make_pdf_cid,
        pdf_text_blocks,
    )

    blob = make_pdf_cid(["abc"])
    # splice a show string with CIDs far outside the cmap into the page
    import re
    import zlib

    m = re.search(rb"5 0 obj .*?stream\r?\n(.*?)\nendstream", blob, re.S)
    content = zlib.decompress(m.group(1))
    hacked = content.replace(b" Tj ET", b" Tj <EEEEEFFF> Tj ET")
    blob2 = blob.replace(m.group(1), zlib.compress(hacked))
    assert pdf_text_blocks(blob2) == ["abc"]  # unknown CIDs vanish


def test_pdf_stream_filters_roundtrip_all():
    """Round-4 directive #6: pdfcpu-parity stream filters — RunLength,
    ASCIIHex, ASCII85, LZW (+ chains) all round-trip; the LZW encoder
    reproduces the PDF 1.7 §7.4.4 worked example byte-for-byte."""
    from webcrawler_go_spark.operators.doc_extract import (
        _lzw_decode,
        _lzw_encode,
        make_pdf,
        pdf_text_blocks,
    )

    spec_in = bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])
    assert _lzw_encode(spec_in).hex() == "800b6050220c0c8501"  # spec example
    assert _lzw_decode(bytes.fromhex("800b6050220c0c8501")) == spec_in
    # width transitions 9->12 bits (dict past 511/1023/2047)
    import random

    rnd = random.Random(7)
    blob = bytes(rnd.randrange(256) for _ in range(8000))
    assert _lzw_decode(_lzw_encode(blob)) == blob
    # table-FULL regime (round-5 bomb-guard cap): >4096 entries would be
    # needed — encoder stops adding at 4095, decoder must mirror that
    # (skip-add, keep decoding) rather than raise or desync
    big = bytes(rnd.randrange(256) for _ in range(60_000))
    assert _lzw_decode(_lzw_encode(big)) == big
    rep = b"abcabdabeabf" * 6_000
    assert _lzw_decode(_lzw_encode(rep)) == rep

    texts = ["mixed filter page", "two (with) escapes \\ fin"]
    for filt in (["RunLengthDecode"], ["ASCIIHexDecode"], ["ASCII85Decode"],
                 ["LZWDecode"], ["ASCII85Decode", "FlateDecode"],
                 ["ASCIIHexDecode", "RunLengthDecode"], []):
        assert pdf_text_blocks(make_pdf(texts, filters=filt)) == texts, filt


def test_pdf_encrypted_and_unsupported_filters_extract_empty():
    """Encrypted documents and unsupported filters (DCTDecode et al.)
    extract NOTHING — empty, never wrong (parser/pdf.go contract)."""
    from webcrawler_go_spark.operators.doc_extract import make_pdf, pdf_text_blocks

    assert pdf_text_blocks(make_pdf(["secret"], encrypted=True)) == []
    blob = make_pdf(["visible"], filters=["LZWDecode"])
    assert pdf_text_blocks(blob.replace(b"/LZWDecode", b"/DCTDecode")) == []
    # corrupt stream under a supported filter: skip stream, no crash
    blob2 = make_pdf(["ok page"], filters=["LZWDecode"])
    import re as _re

    m = _re.search(rb"stream\r?\n(.*?)\nendstream", blob2, _re.S)
    corrupted = blob2.replace(m.group(1), b"\xff" * len(m.group(1)))
    assert pdf_text_blocks(corrupted) == []


def test_parse_tounicode_empty_destination_keeps_pairing():
    """A legal empty <> destination must NOT shift the flat code/dst
    pairing — every subsequent mapping in the block stays correct (the
    old parser dropped the empty token and silently corrupted them)."""
    from webcrawler_go_spark.operators.doc_extract import _parse_tounicode

    data = (b"begincmap\n3 beginbfchar\n"
            b"<0041> <0061>\n"       # A -> 'a'
            b"<0042> <>\n"           # B -> empty string (legal)
            b"<0043> <0063>\n"       # C -> 'c'  (must not become <0043>-><0063> shifted)
            b"endbfchar\nendcmap")
    cmap = _parse_tounicode(data)
    assert cmap[0x41] == "a"
    assert cmap[0x42] == ""
    assert cmap[0x43] == "c"
    # malformed empty SOURCE code: skip that pair, later pairs unharmed
    data2 = (b"2 beginbfchar\n<> <0078>\n<0044> <0064>\nendbfchar")
    cmap2 = _parse_tounicode(data2)
    assert cmap2 == {0x44: "d"}


def test_pdf_cid_font_without_tounicode_extracts_empty():
    from webcrawler_go_spark.operators.doc_extract import (
        make_pdf_cid,
        pdf_text_blocks,
    )

    blob = make_pdf_cid(["xyz"], compress=False)
    blob = blob.replace(b" /ToUnicode 4 0 R", b"")
    assert pdf_text_blocks(blob) == []


def test_pdf_simple_font_still_latin1():
    """Type1 pages must not be routed through any cmap (regression)."""
    from webcrawler_go_spark.operators.doc_extract import make_pdf, pdf_text_blocks

    texts = ["plain latin-1 text", "café naïve"]
    assert pdf_text_blocks(make_pdf(texts)) == texts


def test_pdf_cid_surrogate_pair_bfrange_extracts_empty_not_crash():
    """A ToUnicode bfrange whose destination is a UTF-16 surrogate PAIR
    (math alphanumerics) must not crash extraction (round-3 review
    finding): increment-by-codepoint doesn't apply to multi-unit
    destinations, so those codes extract empty."""
    import zlib as _z

    from webcrawler_go_spark.operators.doc_extract import (
        make_pdf_cid,
        pdf_text_blocks,
    )

    blob = make_pdf_cid(["ab"], compress=False)
    # splice a surrogate-pair bfrange into the cmap stream
    bad = b"begincmap\n1 beginbfrange\n<0000> <0001> <D835DC00>\nendbfrange\nendcmap"
    m = b"begincmap"
    start = blob.index(m)
    end = blob.index(b"endcmap") + len(b"endcmap")
    patched = blob[:start] + bad + blob[end:]
    # the spliced cmap replaced the real one: every CID is now unmapped
    # (or in the skipped surrogate range) -> extract empty, never raise
    assert pdf_text_blocks(patched) == []
    # and a 4-digit LONE surrogate base is skipped rather than emitting
    # unpaired surrogates
    bad2 = b"begincmap\n1 beginbfrange\n<0000> <0003> <D835>\nendbfrange\nendcmap"
    patched2 = blob[:start] + bad2 + blob[end:]
    for t in pdf_text_blocks(patched2):
        t.encode("utf-8")  # must be valid UTF-8 (no lone surrogates)


def test_pdf_decodeparms_early_change_and_predictor():
    """/EarlyChange 0 LZW streams decode correctly; /Predictor-coded
    streams decode through the PNG/TIFF reversal (round-5 directive #3);
    geometry-mismatched or unknown predictors skip — empty, never
    wrong."""
    import re as _re

    from webcrawler_go_spark.operators.doc_extract import (
        _lzw_encode,
        make_pdf,
        pdf_text_blocks,
    )

    blob = make_pdf(["early change zero page"], filters=["LZWDecode"])
    m = _re.search(
        rb"<< /Length (\d+) /Filter /LZWDecode >>\nstream\r?\n(.*?)\nendstream",
        blob, _re.S,
    )
    content = b"BT /F1 12 Tf 72 720 Td (early change zero page) Tj ET"
    enc0 = _lzw_encode(content, early=0)
    blob0 = blob.replace(
        m.group(0),
        b"<< /Length %d /Filter /LZWDecode /DecodeParms "
        b"<< /EarlyChange 0 >> >>\nstream\n%s\nendstream" % (len(enc0), enc0),
    )
    assert pdf_text_blocks(blob0) == ["early change zero page"]
    # a stream CLAIMING a predictor whose geometry doesn't match the
    # decoded bytes (here: plain LZW data, not predictor-coded) must be
    # skipped, not unfiltered into garbage text
    blobp = blob.replace(
        b"/Filter /LZWDecode",
        b"/Filter /LZWDecode /DecodeParms << /Predictor 12 /Columns 4 >>",
    )
    assert pdf_text_blocks(blobp) == []


def test_pdf_predictor_streams_decode():
    """PNG predictors 10-15 (per-row filters 0-4 incl. Paeth, reusing
    the PNG decoder's unfilter) and TIFF predictor 2 reverse correctly
    on Flate AND LZW streams; unknown predictor values skip."""
    from webcrawler_go_spark.operators.doc_extract import make_pdf, pdf_text_blocks

    texts = ["predictor page one (escaped) \\ fin", "page two 0123456789"]
    for pred in (2, 10, 11, 12, 13, 14, 15):
        for filt in (["FlateDecode"], ["LZWDecode"],
                     ["ASCII85Decode", "FlateDecode"]):
            for cols in (7, 32):
                blob = make_pdf(texts, filters=filt, predictor=pred,
                                pred_columns=cols)
                assert pdf_text_blocks(blob) == texts, (pred, filt, cols)
    bad = make_pdf(["x"], filters=["FlateDecode"], predictor=12)
    bad = bad.replace(b"/Predictor 12", b"/Predictor 99")
    assert pdf_text_blocks(bad) == []


def test_pdf_stream_bomb_guards():
    """Decompression bombs in any supported filter are skipped before
    materializing (per-stream decoded-size budget — same threat model
    as the PNG decoder's _PNG_MAX_RAW_BYTES)."""
    import zlib as _z

    from webcrawler_go_spark.operators.doc_extract import (
        _MAX_STREAM_BYTES,
        _decode_stream,
        _lzw_encode,
        _rle_encode,
    )

    big = b"\x00" * (_MAX_STREAM_BYTES + 1024)
    assert _decode_stream(b"/Filter /FlateDecode", _z.compress(big)) is None
    assert _decode_stream(b"/Filter /RunLengthDecode", _rle_encode(big)) is None
    assert _decode_stream(b"/Filter /LZWDecode", _lzw_encode(big)) is None
    # sane streams still decode
    ok = b"hello" * 100
    assert _decode_stream(b"/Filter /FlateDecode", _z.compress(ok)) == ok


def test_pdf_encrypt_only_counts_in_trailer():
    """/Encrypt N M R appearing in BODY content (a document about PDF
    internals) must not misclassify the document as encrypted; a real
    trailer /Encrypt still extracts empty (advisor r4 finding)."""
    from webcrawler_go_spark.operators.doc_extract import (
        _pdf_is_encrypted,
        make_pdf,
        pdf_text_blocks,
    )

    body = make_pdf(["the /Encrypt 12 0 R entry marks encryption"],
                    compress=False)
    assert not _pdf_is_encrypted(body)
    assert pdf_text_blocks(body) == [
        "the /Encrypt 12 0 R entry marks encryption"
    ]
    assert pdf_text_blocks(make_pdf(["secret"], encrypted=True)) == []
