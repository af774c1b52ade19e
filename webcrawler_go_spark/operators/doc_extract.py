"""Real DOCX text extraction (SURVEY §2.7 X5; reference parser/docx.go).

The reference walks document paragraphs → runs → run text with gooxml
(parser/docx.go:11-31). A .docx file is a zip whose word/document.xml
holds ``<w:p>`` paragraphs containing ``<w:r>`` runs containing ``<w:t>``
text — all parseable with the stdlib (zipfile + ElementTree), so this is
a REAL extractor with zero external dependencies, run as a vectorized
``mapInPandas`` kernel over binary payloads.

Paragraph/run order maps to span order (SURVEY §1.2: the ordered
paragraph runs are the reference's span-sequence analogue).

PDF text extraction (X4; reference parser/pdf.go:11-53, which shells out
to ``pdfcpu extract -mode text`` then substring-searches the text files):
a REAL minimal extractor in pure Python — FlateDecode content streams
(zlib is stdlib) walked for BT…ET text blocks, decoding ``(…) Tj``,
``[…] TJ`` and ``<hex> Tj`` show operators with PDF string escapes.
Covers fixture-grade PDFs (standard simple fonts); CID/cmap-encoded text
is out of scope without pdfminer and extracts as empty rather than
raising.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from webcrawler_go_spark.schemas import DOCUMENTS

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_paragraphs(payload: bytes) -> list[str]:
    """One string per paragraph: the concatenated run texts, in document
    order (parser/docx.go:23-28 iterates paragraphs → runs → text)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        xml_bytes = z.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    out = []
    for p in root.iter(f"{_W}p"):
        runs = [t.text or "" for r in p.iter(f"{_W}r") for t in r.iter(f"{_W}t")]
        text = "".join(runs)
        if text:
            out.append(text)
    return out


def docx_contains(payload: bytes, target: str) -> bool:
    """Search-mode predicate over DOCX content (parser/docx.go:25:
    substring over the extracted text)."""
    return any(target in p for p in docx_paragraphs(payload))


def extract_docx_documents(
    blobs: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """(media_ref, payload binary) → documents(doc_id, spans): one text
    span per paragraph, offsets in paragraph order."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            spans = []
            for pl in b[payload_col]:
                paras = docx_paragraphs(bytes(pl))
                spans.append(
                    [
                        {"kind": "text", "text": t, "media_ref": "", "offset": i}
                        for i, t in enumerate(paras)
                    ]
                )
            yield pd.DataFrame({"doc_id": b[ref_col], "spans": spans})

    return blobs.mapInPandas(kernel, schema=DOCUMENTS)


def make_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid .docx builder (test fixture helper — deterministic,
    no wall clock in the zip entries)."""
    doc = ET.Element(f"{_W}document")
    body = ET.SubElement(doc, f"{_W}body")
    for text in paragraphs:
        p = ET.SubElement(body, f"{_W}p")
        # split each paragraph into two runs to exercise run-concat order
        mid = max(1, len(text) // 2)
        for part in (text[:mid], text[mid:]):
            r = ET.SubElement(p, f"{_W}r")
            t = ET.SubElement(r, f"{_W}t")
            t.text = part
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        info = zipfile.ZipInfo("word/document.xml", date_time=(2026, 1, 1, 0, 0, 0))
        z.writestr(info, ET.tostring(doc, xml_declaration=True, encoding="unicode"))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF (X4) — parser/pdf.go:11-53 re-expressed without the pdfcpu binary
# ---------------------------------------------------------------------------

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# (…) literal strings with escapes, <…> hex strings — each followed by a
# show operator (Tj, ', ") or inside a […] TJ array
_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")"
    rb"|<([0-9A-Fa-f\s]+)>\s*(?:Tj|'|\")"
    rb"|\[((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ",
    re.S,
)
_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>", re.S)

_ESCAPES = {
    ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12,
    ord("("): 40, ord(")"): 41, ord("\\"): 92,
}


def _unescape_pdf_string(s: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == 0x5C and i + 1 < len(s):  # backslash
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
            elif 0x30 <= n <= 0x37:  # \ddd octal, 1-3 digits
                j = i + 1
                end = min(len(s), i + 4)
                while j < end and 0x30 <= s[j] <= 0x37:
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
            elif n in (0x0A, 0x0D):  # line continuation
                i += 2
            else:
                out.append(n)
                i += 2
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _decode_hex(h: bytes) -> str:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"  # PDF spec: odd-length hex pads with 0
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _block_text(content: bytes) -> str:
    parts: list[str] = []
    for m in _SHOW_RE.finditer(content):
        lit, hexs, arr = m.group(1), m.group(2), m.group(3)
        if lit is not None:
            parts.append(_unescape_pdf_string(lit))
        elif hexs is not None:
            parts.append(_decode_hex(hexs))
        else:  # TJ array: concatenate its strings (numbers are kerning)
            for am in _ARRAY_STR_RE.finditer(arr):
                if am.group(1) is not None:
                    parts.append(_unescape_pdf_string(am.group(1)))
                else:
                    parts.append(_decode_hex(am.group(2)))
    return "".join(parts)


def pdf_text_blocks(payload: bytes) -> list[str]:
    """One string per BT…ET text block across all content streams, in
    document order. FlateDecode streams are inflated; other filters are
    skipped (extract nothing rather than raise — parser/pdf.go returns
    false on extraction failure, same contract)."""
    blocks: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        d, data = m.group(1), m.group(2)
        if b"/FlateDecode" in d:
            # decompressobj, NOT decompress+strip: compressed payloads can
            # legitimately END in 0x0a/0x0d bytes, which a strip() of the
            # EOL-before-endstream would eat; decompressobj stops at the
            # stream end and ignores the trailing EOL on its own
            try:
                data = zlib.decompressobj().decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in d:
            continue  # unsupported filter: skip stream
        for bt in _BT_RE.finditer(data):
            text = _block_text(bt.group(1))
            if text:
                blocks.append(text)
    return blocks


def pdf_contains(payload: bytes, target: str) -> bool:
    """Search-mode predicate over PDF text (parser/pdf.go:40-46:
    substring over the extracted text files)."""
    return any(target in b for b in pdf_text_blocks(payload))


def extract_pdf_documents(
    blobs: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """(media_ref, payload binary) → documents(doc_id, spans): one text
    span per BT…ET block, offsets in document order."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            spans = []
            for pl in b[payload_col]:
                blocks = pdf_text_blocks(bytes(pl))
                spans.append(
                    [
                        {"kind": "text", "text": t, "media_ref": "", "offset": i}
                        for i, t in enumerate(blocks)
                    ]
                )
            yield pd.DataFrame({"doc_id": b[ref_col], "spans": spans})

    return blobs.mapInPandas(kernel, schema=DOCUMENTS)


def make_pdf(texts: list[str], compress: bool = True) -> bytes:
    """Minimal valid single-font PDF builder (test fixture helper —
    deterministic; one page per text, one BT block per page)."""
    objs: list[bytes] = []
    n_pages = len(texts)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, text in enumerate(texts):
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        content = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {page_ids[i] + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/MediaBox [0 0 612 792] >>".encode()
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj %s endobj\n" % (i, body))
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer << /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return out.getvalue()
