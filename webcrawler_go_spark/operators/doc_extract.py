"""Real DOCX text extraction (SURVEY §2.7 X5; reference parser/docx.go).

The reference walks document paragraphs → runs → run text with gooxml
(parser/docx.go:11-31). A .docx file is a zip whose word/document.xml
holds ``<w:p>`` paragraphs containing ``<w:r>`` runs containing ``<w:t>``
text — all parseable with the stdlib (zipfile + ElementTree), so this is
a REAL extractor with zero external dependencies, run as a vectorized
``mapInPandas`` kernel over binary payloads.

Paragraph/run order maps to span order (SURVEY §1.2: the ordered
paragraph runs are the reference's span-sequence analogue).

PDF text extraction (X4) stays stubbed: a correct PDF text extractor
needs content-stream + font-cmap decoding (pypdf/pdfminer, not in this
container); the kernel raises NotImplementedError on real PDFs unless
given the deterministic fake.
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
