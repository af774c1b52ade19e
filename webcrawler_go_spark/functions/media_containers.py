"""S10's CONTAINER layer — the CMYK TIFF and DeviceCMYK-PDF wrappers.

The reference shells out for these (pdfcapture.go:729-790:
``convertToCMYKTIFF`` runs ImageMagick ``convert -colorspace CMYK
-compress LZW``; ``convertToCMYKPDF`` runs Ghostscript ``pdfwrite`` with
``-dProcessColorModel=/DeviceCMYK``). Neither binary exists in this
environment, so the wrappers are re-expressed stdlib-only and for real:

* a baseline TIFF 6.0 writer/reader — little- or big-endian header,
  PhotometricInterpretation 5 (Separated) + InkSet 1 (CMYK),
  SamplesPerPixel 4, per-strip TIFF-LZW (the EarlyChange-1 variant the
  PDF codec in ``operators/doc_extract.py`` already implements) or
  uncompressed strips, optional horizontal-differencing Predictor 2
  (tag 317 — what ImageMagick's ``-compress LZW`` emits);
* a minimal single-page PDF writer embedding the CMYK pixels as a
  ``/DeviceCMYK`` ``/FlateDecode`` Image XObject, with a byte-accurate
  xref table, plus the matching un-wrapper.

Ghostscript's color *conversion* step is `rgb_to_cmyk` in
``media_codecs.py``; this module supplies only the container around it,
so together they cover the reference's CMYK capture modes end to end.
Decoders carry the same per-stream byte budgets as the PDF/PNG codecs
(decompression-bomb guard).
"""
from __future__ import annotations

import struct
import zlib

# same budget philosophy as doc_extract._MAX_STREAM_BYTES / the PNG guard
_MAX_PIXEL_BYTES = 64 * 1024 * 1024

# TIFF tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITSPERSAMPLE = 258
_T_COMPRESSION = 259        # 1 = none, 5 = LZW
_T_PHOTOMETRIC = 262        # 5 = Separated (ink) — CMYK with InkSet 1
_T_STRIPOFFSETS = 273
_T_SAMPLESPERPIXEL = 277
_T_ROWSPERSTRIP = 278
_T_STRIPBYTECOUNTS = 279
_T_XRES = 282
_T_YRES = 283
_T_PLANARCONFIG = 284       # 1 = chunky
_T_RESUNIT = 296            # 2 = inch
_T_PREDICTOR = 317          # 1 = none, 2 = horizontal differencing
_T_INKSET = 332             # 1 = CMYK

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _diff_rows(raw: bytes, width: int, spp: int) -> bytes:
    """Predictor-2 forward pass: per row, each sample becomes the delta
    (mod 256) against the same channel of the previous pixel."""
    import numpy as np

    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, width, spp).astype(np.int16)
    a[:, 1:, :] -= a[:, :-1, :].copy()
    return (a & 0xFF).astype(np.uint8).tobytes()


def _undiff_rows(raw: bytes, width: int, spp: int) -> bytes:
    """Predictor-2 reversal: cumulative sum (mod 256) along each row,
    per channel."""
    import numpy as np

    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, width, spp)
    return np.cumsum(a, axis=1, dtype=np.uint32).astype(np.uint8).tobytes()


def encode_tiff_cmyk(
    cmyk: bytes,
    width: int,
    height: int,
    compression: str = "lzw",
    predictor: int = 1,
    rows_per_strip: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """Write interleaved 8-bit CMYK pixels as a baseline TIFF 6.0 file.

    ``compression``: ``"lzw"`` (TIFF-LZW, restarted per strip, as the
    spec requires) or ``"none"``. ``predictor=2`` applies horizontal
    differencing before compression (tag 317). ``byte_order``: ``"II"``
    (little-endian, what ImageMagick writes on x86) or ``"MM"``.
    """
    spp = 4
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if len(cmyk) != width * height * spp:
        raise ValueError(f"expected {width * height * spp} CMYK bytes, got {len(cmyk)}")
    if compression not in ("lzw", "none"):
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if byte_order not in ("II", "MM"):
        raise ValueError(f"bad byte order {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    comp_code = 5 if compression == "lzw" else 1
    if rows_per_strip is None:
        # target ~8 KiB strips (TIFF 6.0 recommendation), at least 1 row
        rows_per_strip = max(1, 8192 // (width * spp))
    rows_per_strip = min(rows_per_strip, height)

    # strips — LZW state restarts at every strip boundary (TIFF 6.0 §13)
    from webcrawler_go_spark.operators.doc_extract import _lzw_encode

    row_bytes = width * spp
    strips: list[bytes] = []
    for y0 in range(0, height, rows_per_strip):
        rows = cmyk[y0 * row_bytes:(y0 + min(rows_per_strip, height - y0)) * row_bytes]
        if predictor == 2:
            rows = _diff_rows(rows, width, spp)
        strips.append(_lzw_encode(rows) if comp_code == 5 else rows)

    # layout: header(8) | strip data (even-padded) | IFD | overflow values
    strip_offsets: list[int] = []
    pos = 8
    data = bytearray()
    for s in strips:
        strip_offsets.append(pos)
        data += s
        pos += len(s)
        if pos % 2:                      # word-align the next strip / IFD
            data += b"\x00"
            pos += 1
    ifd_offset = pos

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def short(v: int) -> bytes:
        return struct.pack(e + "H", v)

    def long_(v: int) -> bytes:
        return struct.pack(e + "I", v)

    entries.append((_T_WIDTH, _TYPE_LONG, 1, long_(width)))
    entries.append((_T_LENGTH, _TYPE_LONG, 1, long_(height)))
    entries.append((_T_BITSPERSAMPLE, _TYPE_SHORT, 4, short(8) * 4))
    entries.append((_T_COMPRESSION, _TYPE_SHORT, 1, short(comp_code)))
    entries.append((_T_PHOTOMETRIC, _TYPE_SHORT, 1, short(5)))
    entries.append((_T_STRIPOFFSETS, _TYPE_LONG, len(strips),
                    b"".join(long_(o) for o in strip_offsets)))
    entries.append((_T_SAMPLESPERPIXEL, _TYPE_SHORT, 1, short(spp)))
    entries.append((_T_ROWSPERSTRIP, _TYPE_LONG, 1, long_(rows_per_strip)))
    entries.append((_T_STRIPBYTECOUNTS, _TYPE_LONG, len(strips),
                    b"".join(long_(len(s)) for s in strips)))
    entries.append((_T_XRES, _TYPE_RATIONAL, 1, struct.pack(e + "II", 72, 1)))
    entries.append((_T_YRES, _TYPE_RATIONAL, 1, struct.pack(e + "II", 72, 1)))
    entries.append((_T_PLANARCONFIG, _TYPE_SHORT, 1, short(1)))
    entries.append((_T_RESUNIT, _TYPE_SHORT, 1, short(2)))
    if predictor == 2:
        entries.append((_T_PREDICTOR, _TYPE_SHORT, 1, short(2)))
    entries.append((_T_INKSET, _TYPE_SHORT, 1, short(1)))
    entries.sort(key=lambda t: t[0])     # IFD entries must be tag-ascending

    ifd_size = 2 + 12 * len(entries) + 4
    overflow_pos = ifd_offset + ifd_size
    ifd = bytearray(struct.pack(e + "H", len(entries)))
    overflow = bytearray()
    for tag, typ, count, payload in entries:
        ifd += struct.pack(e + "HHI", tag, typ, count)
        if len(payload) <= 4:
            ifd += payload.ljust(4, b"\x00")
        else:
            ifd += struct.pack(e + "I", overflow_pos + len(overflow))
            overflow += payload
    ifd += struct.pack(e + "I", 0)       # no next IFD

    header = byte_order.encode("ascii") + struct.pack(e + "HI", 42, ifd_offset)
    return bytes(header) + bytes(data) + bytes(ifd) + bytes(overflow)


def decode_tiff(blob: bytes) -> dict:
    """Parse a single-IFD TIFF (either byte order) and return its fields
    plus the reassembled interleaved pixel bytes.

    Handles compression 1 (none) and 5 (TIFF-LZW), Predictor 2, chunky
    planar config, multi-strip images. Raises ``ValueError`` on
    malformed input or when declared dimensions exceed the pixel-byte
    budget (bomb guard).
    """
    if len(blob) < 8:
        raise ValueError("not a TIFF: too short")
    order = blob[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_offset = struct.unpack_from(e + "HI", blob, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    if ifd_offset + 2 > len(blob):
        raise ValueError("truncated IFD")

    (n_entries,) = struct.unpack_from(e + "H", blob, ifd_offset)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_offset + 2 + 12 * i
        if off + 12 > len(blob):
            raise ValueError("truncated IFD entry")
        tag, typ, count = struct.unpack_from(e + "HHI", blob, off)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            payload = blob[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack_from(e + "I", blob, off + 8)
            if voff + size > len(blob):
                raise ValueError("IFD value overflows file")
            payload = blob[voff:voff + size]
        if typ == _TYPE_SHORT:
            tags[tag] = list(struct.unpack(e + f"{count}H", payload))
        elif typ == _TYPE_LONG:
            tags[tag] = list(struct.unpack(e + f"{count}I", payload))
        elif typ == _TYPE_RATIONAL:
            vals = struct.unpack(e + f"{2 * count}I", payload)
            tags[tag] = [vals[2 * j] // max(vals[2 * j + 1], 1) for j in range(count)]
        # other types (ASCII etc.) are ignored — not needed for pixels

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"missing required TIFF tag {tag}")
        return default

    width = one(_T_WIDTH)
    height = one(_T_LENGTH)
    spp = one(_T_SAMPLESPERPIXEL, 1)
    comp = one(_T_COMPRESSION, 1)
    predictor = one(_T_PREDICTOR, 1)
    rows_per_strip = one(_T_ROWSPERSTRIP, height)
    if one(_T_PLANARCONFIG, 1) != 1:
        raise ValueError("planar TIFF unsupported")
    bps = tags.get(_T_BITSPERSAMPLE, [8])
    if any(b != 8 for b in bps):
        raise ValueError("only 8-bit samples supported")
    if comp not in (1, 5):
        raise ValueError(f"unsupported compression {comp}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if width <= 0 or height <= 0 or spp <= 0 or rows_per_strip <= 0:
        raise ValueError("bad dimensions")
    total = width * height * spp
    if total > _MAX_PIXEL_BYTES:
        raise ValueError("declared pixel size exceeds budget")

    offsets = tags.get(_T_STRIPOFFSETS)
    counts = tags.get(_T_STRIPBYTECOUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/mismatched strip tables")

    from webcrawler_go_spark.operators.doc_extract import _lzw_decode

    row_bytes = width * spp
    out = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(blob):
            raise ValueError("strip overflows file")
        raw = blob[o:o + c]
        if comp == 5:
            raw = _lzw_decode(raw)
        n_rows = min(rows_per_strip, height - i * rows_per_strip)
        expect = n_rows * row_bytes
        if len(raw) < expect:
            raise ValueError("short strip")
        raw = raw[:expect]               # writers may pad the final strip
        if predictor == 2:
            raw = _undiff_rows(raw, width, spp)
        out += raw
    if len(out) != total:
        raise ValueError("pixel bytes != width*height*spp")

    return {
        "width": width,
        "height": height,
        "samples_per_pixel": spp,
        "photometric": one(_T_PHOTOMETRIC, 1),
        "compression": comp,
        "predictor": predictor,
        "inkset": one(_T_INKSET, 0),
        "n_strips": len(offsets),
        "byte_order": order.decode("ascii"),
        "pixels": bytes(out),
    }


# ---------------------------------------------------------------------------
# Minimal DeviceCMYK-image PDF (the Ghostscript pdfwrite counterpart)
# ---------------------------------------------------------------------------

def wrap_pdf_cmyk(cmyk: bytes, width: int, height: int) -> bytes:
    """Wrap interleaved 8-bit CMYK pixels in a valid single-page PDF 1.4:
    Catalog → Pages → Page → ``/DeviceCMYK`` ``/FlateDecode`` Image
    XObject + a content stream painting it full-page, with a
    byte-accurate xref table and trailer."""
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if len(cmyk) != width * height * 4:
        raise ValueError(f"expected {width * height * 4} CMYK bytes, got {len(cmyk)}")

    img = zlib.compress(cmyk, 9)
    content = f"q {width} 0 0 {height} 0 0 cm /Im0 Do Q".encode("ascii")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {width} {height}] "
         f"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>"
         ).encode("ascii"),
        (f"<< /Type /XObject /Subtype /Image /Width {width} /Height {height} "
         f"/ColorSpace /DeviceCMYK /BitsPerComponent 8 /Filter /FlateDecode "
         f"/Length {len(img)} >>").encode("ascii") +
        b"\nstream\n" + img + b"\nendstream",
        (f"<< /Length {len(content)} >>").encode("ascii") +
        b"\nstream\n" + content + b"\nendstream",
    ]

    out = bytearray(b"%PDF-1.4\n%\xde\xad\xbe\xef\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for o in offsets:
        out += f"{o:010d} 00000 n \n".encode("ascii")
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("ascii")
    return bytes(out)


def unwrap_pdf_cmyk(blob: bytes) -> dict:
    """Re-extract the CMYK image from a `wrap_pdf_cmyk`-shaped PDF:
    walks the xref to count objects, finds the ``/Subtype /Image``
    XObject, Flate-decodes its stream (budget-capped) and returns the
    dict of container fields + pixel bytes."""
    import re

    if not blob.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", blob)
    if not m:
        raise ValueError("no startxref")
    xref_at = int(m.group(1))
    xm = re.match(rb"xref\s+0 (\d+)", blob[xref_at:xref_at + 64])
    if not xm:
        raise ValueError("startxref does not point at an xref table")
    n_objects = int(xm.group(1)) - 1     # minus the free-list head

    im = re.search(
        rb"<<([^>]*?/Subtype\s*/Image[^>]*?)>>\s*stream\r?\n", blob, re.S
    )
    if not im:
        raise ValueError("no image XObject")
    d = im.group(1).decode("latin-1")

    def field(name: str) -> str | None:
        fm = re.search(rf"/{name}\s+(/?[\w.]+)", d)
        return fm.group(1) if fm else None

    width = int(field("Width") or 0)
    height = int(field("Height") or 0)
    length = int(field("Length") or 0)
    start = im.end()
    stream = blob[start:start + length]
    if len(stream) != length:
        raise ValueError("truncated image stream")
    dec = zlib.decompressobj()
    pixels = dec.decompress(stream, _MAX_PIXEL_BYTES + 1)
    if len(pixels) > _MAX_PIXEL_BYTES:
        raise ValueError("decoded image exceeds budget")
    if len(pixels) != width * height * 4:
        raise ValueError("pixel bytes != width*height*4")
    return {
        "width": width,
        "height": height,
        "colorspace": (field("ColorSpace") or "").lstrip("/"),
        "filter": (field("Filter") or "").lstrip("/"),
        "bits_per_component": int(field("BitsPerComponent") or 0),
        "n_objects": n_objects,
        "pixels": pixels,
    }
