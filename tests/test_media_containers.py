"""S10 container layer: CMYK TIFF writer/reader and DeviceCMYK-PDF
wrapper (pdfcapture.go:729-790's ImageMagick/Ghostscript shell-outs,
re-expressed stdlib-only). Round-trips across compression × predictor ×
strip-size × byte-order, structural TIFF/PDF conformance checks parsed
by hand (not via our own reader), bomb guards, and hypothesis property
round-trips."""

from __future__ import annotations

import re
import struct
import zlib

import pytest

from webcrawler_go_spark.functions.media_containers import (
    decode_tiff,
    encode_tiff_cmyk,
    unwrap_pdf_cmyk,
    wrap_pdf_cmyk,
)


def _pixels(w, h, seed=7):
    return bytes((seed * 31 + j * 13) % 256 for j in range(w * h * 4))


@pytest.mark.parametrize("comp", ["lzw", "none"])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("rps", [None, 1, 3])
@pytest.mark.parametrize("bo", ["II", "MM"])
def test_tiff_roundtrip_matrix(comp, pred, rps, bo):
    w, h = 11, 7
    px = _pixels(w, h)
    d = decode_tiff(encode_tiff_cmyk(px, w, h, comp, pred, rps, bo))
    assert d["pixels"] == px
    assert (d["width"], d["height"]) == (w, h)
    assert d["photometric"] == 5 and d["inkset"] == 1
    assert d["samples_per_pixel"] == 4
    assert d["compression"] == (5 if comp == "lzw" else 1)
    assert d["predictor"] == pred
    assert d["byte_order"] == bo
    if rps == 1:
        assert d["n_strips"] == h


def test_tiff_structural_by_hand():
    """Parse the container with raw struct, not our reader: header,
    ascending tag order, strip tables consistent, CMYK tag values."""
    w, h = 6, 5
    blob = encode_tiff_cmyk(_pixels(w, h), w, h, "lzw", 2, 2)
    assert blob[:2] == b"II"
    magic, ifd_at = struct.unpack_from("<HI", blob, 2)
    assert magic == 42
    (n,) = struct.unpack_from("<H", blob, ifd_at)
    tags = {}
    prev_tag = -1
    for i in range(n):
        tag, typ, count, val = struct.unpack_from("<HHII", blob, ifd_at + 2 + 12 * i)
        assert tag > prev_tag, "IFD entries must be tag-ascending"
        prev_tag = tag
        tags[tag] = (typ, count, val)
    # required baseline-CMYK tags present
    for t in (256, 257, 258, 259, 262, 273, 277, 278, 279, 282, 283, 284, 296, 317, 332):
        assert t in tags, f"missing tag {t}"
    assert tags[262][2] == 5           # Separated
    assert tags[332][2] == 1           # CMYK inks
    assert tags[259][2] == 5           # LZW
    assert tags[317][2] == 2           # horizontal differencing
    assert tags[277][2] == 4
    # strip tables: 5 rows at 2 rows/strip -> 3 strips, offsets in-file
    assert tags[273][1] == tags[279][1] == 3
    (next_ifd,) = struct.unpack_from("<I", blob, ifd_at + 2 + 12 * n)
    assert next_ifd == 0


def test_tiff_lzw_restarts_per_strip():
    """TIFF 6.0 §13: LZW state must not carry across strips — every
    strip must independently decode (leading ClearCode)."""
    from webcrawler_go_spark.operators.doc_extract import _lzw_decode

    w, h = 8, 6
    blob = encode_tiff_cmyk(_pixels(w, h), w, h, "lzw", 1, 2)
    d = decode_tiff(blob)
    assert d["n_strips"] == 3
    # re-read the strip tables by hand and decode strip 2 in isolation
    magic_ifd = struct.unpack_from("<I", blob, 4)[0]
    (n,) = struct.unpack_from("<H", blob, magic_ifd)
    offs = cnts = None
    for i in range(n):
        tag, typ, count, val = struct.unpack_from("<HHII", blob, magic_ifd + 2 + 12 * i)
        if tag == 273:
            offs = list(struct.unpack_from(f"<{count}I", blob, val))
        if tag == 279:
            cnts = list(struct.unpack_from(f"<{count}I", blob, val))
    iso = _lzw_decode(blob[offs[2]:offs[2] + cnts[2]])
    assert iso == _pixels(w, h)[4 * w * 4:]  # strip 2 = rows 4..5


def test_tiff_bomb_and_malformed_guards():
    px = _pixels(4, 4)
    blob = encode_tiff_cmyk(px, 4, 4)
    with pytest.raises(ValueError):
        decode_tiff(blob[:30])
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + blob[2:])
    # inflate declared width beyond the pixel budget (tag 256 value)
    big = bytearray(blob)
    ifd_at = struct.unpack_from("<I", big, 4)[0]
    (n,) = struct.unpack_from("<H", big, ifd_at)
    for i in range(n):
        off = ifd_at + 2 + 12 * i
        tag = struct.unpack_from("<H", big, off)[0]
        if tag == 256:
            struct.pack_into("<I", big, off + 8, 1 << 30)
    with pytest.raises(ValueError):
        decode_tiff(bytes(big))
    with pytest.raises(ValueError):
        encode_tiff_cmyk(px[:-1], 4, 4)
    with pytest.raises(ValueError):
        encode_tiff_cmyk(px, 4, 4, compression="jpeg")


def test_pdf_wrap_roundtrip_and_xref():
    w, h = 12, 9
    px = _pixels(w, h, seed=3)
    blob = wrap_pdf_cmyk(px, w, h)
    u = unwrap_pdf_cmyk(blob)
    assert u["pixels"] == px
    assert u["colorspace"] == "DeviceCMYK"
    assert u["filter"] == "FlateDecode"
    assert u["bits_per_component"] == 8
    assert u["n_objects"] == 5
    # xref entries must point at the exact byte offset of "i 0 obj"
    xref_at = int(re.search(rb"startxref\s+(\d+)", blob).group(1))
    table = blob[xref_at:]
    rows = re.findall(rb"(\d{10}) 00000 n ", table)
    assert len(rows) == 5
    for i, r in enumerate(rows, start=1):
        off = int(r)
        assert blob[off:].startswith(f"{i} 0 obj".encode()), f"obj {i}"


def test_pdf_wrap_guards():
    px = _pixels(3, 3)
    with pytest.raises(ValueError):
        wrap_pdf_cmyk(px[:-2], 3, 3)
    blob = wrap_pdf_cmyk(px, 3, 3)
    with pytest.raises(ValueError):
        unwrap_pdf_cmyk(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        unwrap_pdf_cmyk(b"not a pdf")


def test_pdf_stream_decodable_by_doc_extract():
    """The wrapper's image stream is a spec-conformant FlateDecode
    stream — the repo's own PDF stream decoder must accept it."""
    from webcrawler_go_spark.operators.doc_extract import _flate_decode

    w, h = 5, 4
    px = _pixels(w, h)
    blob = wrap_pdf_cmyk(px, w, h)
    m = re.search(rb"/Length (\d+) >>\nstream\n", blob)
    start = m.end()
    assert _flate_decode(blob[start:start + int(m.group(1))]) == px


def test_property_tiff_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        data=st.binary(min_size=0, max_size=64),
        comp=st.sampled_from(["lzw", "none"]),
        pred=st.sampled_from([1, 2]),
        rps=st.integers(1, 6),
    )
    def run(w, h, data, comp, pred, rps):
        need = w * h * 4
        px = (data * (need // max(len(data), 1) + 1))[:need] if data else bytes(need)
        d = decode_tiff(encode_tiff_cmyk(px, w, h, comp, pred, rps))
        assert d["pixels"] == px

    run()


def test_property_pdf_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 16), h=st.integers(1, 12), seed=st.integers(0, 255))
    def run(w, h, seed):
        px = _pixels(w, h, seed=seed)
        assert unwrap_pdf_cmyk(wrap_pdf_cmyk(px, w, h))["pixels"] == px

    run()
