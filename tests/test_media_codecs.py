"""Real stdlib media codecs: PNG round-trips through every filter type,
CRC validation, WAV PCM decode cross-checked against audioop, and the
Spark decode_media real path (round-3 directive #9)."""

from __future__ import annotations

import struct
import zlib

import pytest

from webcrawler_go_spark.functions.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav_pcm,
)


def _pixels(w, h, ch=3, seed=7):
    return bytes((seed * 31 + j * 13) % 256 for j in range(w * h * ch))


def test_png_roundtrip_filters_012():
    w, h = 9, 6
    px = _pixels(w, h)
    for filters in ([0] * h, [1] * h, [2] * h, [y % 3 for y in range(h)]):
        blob = encode_png(w, h, px, row_filters=filters)
        dw, dh, ch, out = decode_png(blob)
        assert (dw, dh, ch) == (w, h, 3)
        assert out == px, f"filters={filters}"


def test_png_rgba_roundtrip():
    w, h = 5, 4
    px = _pixels(w, h, ch=4)
    dw, dh, ch, out = decode_png(encode_png(w, h, px, channels=4))
    assert (dw, dh, ch, out) == (w, h, 4, px)


def test_png_average_and_paeth_reversal():
    """The writer emits 0/1/2 only, so build Average(3)/Paeth(4) scanlines
    by hand and check the decoder's reversal against the spec math."""
    w, h, ch = 4, 3, 3
    px = _pixels(w, h, ch, seed=3)
    stride = w * ch

    def filt(ft, row, prev):
        out = bytearray([ft])
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ft == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = px[y * stride:(y + 1) * stride]
        raw += filt(3 if y % 2 == 0 else 4, row, prev)
        prev = row

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert decode_png(blob)[3] == px


def test_png_rejects_corrupt_crc_and_bad_signature():
    blob = bytearray(encode_png(3, 3, _pixels(3, 3)))
    blob[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(20))


def test_png_unsupported_variants_raise_not_implemented():
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)))
    with pytest.raises(NotImplementedError):
        decode_png(blob)


def test_png_decompression_bomb_rejected_before_inflate():
    """A small blob claiming huge IHDR dims must be rejected BEFORE
    inflating (untrusted crawl payloads: a few-KB zlib stream expanding
    to gigabytes would otherwise OOM the executor)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    # claims 50000×50000 RGB (7.5 GB raw) with a tiny highly-compressible IDAT
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="exceeds cap"):
        decode_png(blob)

    # oversized-but-under-cap stream stops at expected+1 bytes (size
    # mismatch), never materializing the full inflation
    good = encode_png(3, 2, _pixels(3, 2))
    bomb = bytearray(good)
    # shrink claimed dims so the real IDAT overshoots `expected`
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    patched = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + good[8 + 12 + 13:])  # reuse original IDAT+IEND chunks
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(patched)


def test_wav_8bit_decode_matches_audioop():
    samples = [(i * 37 + 11) % 256 for i in range(200)]
    blob = encode_wav_pcm(samples, sample_rate=8000, sampwidth=1)
    d = decode_wav(blob)
    assert d["sample_rate"] == 8000
    assert d["n_samples"] == 200
    assert d["duration_ms"] == 25
    assert d["sum_sq"] == sum((s - 128) ** 2 for s in samples)
    assert d["peak"] == max(abs(s - 128) for s in samples)
    # cross-check rms against audioop (independent C implementation) on
    # the centered samples widened to 16-bit signed
    import audioop

    raw16 = b"".join(struct.pack("<h", s - 128) for s in samples)
    assert abs(d["rms"] - audioop.rms(raw16, 2)) <= 1.0


def test_wav_16bit_decode():
    samples = [((i * 997) % 20000) - 10000 for i in range(100)]
    d = decode_wav(encode_wav_pcm(samples, sample_rate=16000, sampwidth=2))
    assert d["n_samples"] == 100
    assert d["sample_rate"] == 16000
    assert d["sum_sq"] == sum(s * s for s in samples)
    assert d["peak"] == max(abs(s) for s in samples)


def test_decode_media_real_path_spark(spark):
    """End-to-end: real PNG + WAV blobs through the mapInPandas decode
    kernel with use_fake_decoder=False."""
    from webcrawler_go_spark.operators.multimodal import decode_media

    png = encode_png(6, 4, _pixels(6, 4), row_filters=[0, 1, 2, 1])
    wav = encode_wav_pcm([(i * 3) % 256 for i in range(50)], sample_rate=8000)
    blobs = spark.createDataFrame(
        [("m://png", "image", bytearray(png), {}),
         ("m://wav", "audio", bytearray(wav), {})],
        "media_ref string, media_type string, payload binary, meta map<string,string>",
    )
    got = {r.media_ref: r for r in decode_media(blobs, use_fake_decoder=False).collect()}
    assert (got["m://png"].width, got["m://png"].height) == (6, 4)
    assert got["m://wav"].n_frames == 50


def test_decode_media_real_path_isolates_unknown_format(spark):
    """One unknown/corrupt blob in a batch must NOT abort the job: it
    yields a null-feature row with decode_error set, while good rows in
    the same batch decode normally (per-row isolation contract)."""
    from webcrawler_go_spark.operators.multimodal import decode_media

    png = encode_png(3, 2, _pixels(3, 2))
    corrupt_png = png[:-10] + b"\x00" * 10  # breaks IEND CRC
    blobs = spark.createDataFrame(
        [("m://x", "video", bytearray(b"\x00\x01notacodec"), {}),
         ("m://ok", "image", bytearray(png), {}),
         ("m://bad", "image", bytearray(corrupt_png), {})],
        "media_ref string, media_type string, payload binary, meta map<string,string>",
    )
    got = {r.media_ref: r for r in decode_media(blobs, use_fake_decoder=False).collect()}
    assert "no stdlib codec" in got["m://x"].decode_error
    assert got["m://x"].width is None
    assert (got["m://ok"].width, got["m://ok"].decode_error) == (3, None)
    assert "CRC" in got["m://bad"].decode_error


def test_rgb_to_cmyk_known_colors():
    from webcrawler_go_spark.functions.media_codecs import rgb_to_cmyk

    cases = {
        (255, 0, 0): (0, 255, 255, 0),     # pure red
        (0, 255, 0): (255, 0, 255, 0),     # pure green
        (0, 0, 255): (255, 255, 0, 0),     # pure blue
        (255, 255, 255): (0, 0, 0, 0),     # white
        (0, 0, 0): (0, 0, 0, 255),         # black: full GCR, no CMY
        (128, 128, 128): (0, 0, 0, 127),   # gray: K only
        (0, 128, 255): (255, 127, 0, 0),
    }
    for rgb, want in cases.items():
        assert tuple(rgb_to_cmyk(bytes(rgb))) == want, rgb


def test_rgb_to_cmyk_batch_shape_and_bounds():
    from webcrawler_go_spark.functions.media_codecs import rgb_to_cmyk

    px = bytes((i * 37 + 5) % 256 for i in range(300))  # 100 pixels
    out = rgb_to_cmyk(px)
    assert len(out) == 400
    # GCR invariant: for every pixel, min(C,M,Y) == 0 (K absorbed the
    # gray component) and all channels are in byte range by construction
    for p in range(100):
        c, m, y, _k = out[4 * p:4 * p + 4]
        assert min(c, m, y) == 0


def test_png_roundtrip_property():
    """Property: decode(encode(pixels)) == pixels for arbitrary sizes,
    channels and writer filter sequences."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        ch=st.sampled_from([3, 4]),
        seed=st.integers(0, 2**31),
        data=st.data(),
    )
    def prop(w, h, ch, seed, data):
        px = bytes((seed * 31 + j * 13) % 256 for j in range(w * h * ch))
        filters = data.draw(
            st.lists(st.integers(0, 2), min_size=h, max_size=h)
        )
        dw, dh, dch, out = decode_png(
            encode_png(w, h, px, channels=ch, row_filters=filters)
        )
        assert (dw, dh, dch, out) == (w, h, ch, px)

    prop()


def test_wav_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        samples=st.lists(st.integers(0, 255), min_size=1, max_size=300),
        sr=st.sampled_from([8000, 16000, 44100]),
    )
    def prop(samples, sr):
        d = decode_wav(encode_wav_pcm(samples, sample_rate=sr))
        assert d["n_samples"] == len(samples)
        assert d["sample_rate"] == sr
        assert d["sum_sq"] == sum((s - 128) ** 2 for s in samples)

    prop()


def test_png_truncated_raises_value_error():
    blob = encode_png(4, 4, _pixels(4, 4))
    with pytest.raises(ValueError):
        decode_png(blob[:20])  # truncated mid-chunk
    with pytest.raises(ValueError):
        decode_png(blob[:-6])  # truncated tail
