"""Real (stdlib-only) media codecs for the multimodal path.

The container has no PIL/cv2/pyav/soundfile (probed 2026-08, round 3),
but real decode is still possible with the standard library:

* **PNG** — full minimal decoder: signature check, chunk walk with CRC32
  verification, IHDR parse, zlib inflate of IDAT, and reversal of all
  five scanline filters (None/Sub/Up/Average/Paeth, the actual pixel
  math of the format). Encoder included for fixtures and round-trips.
  Supported subset: 8-bit, color type 2 (RGB) / 6 (RGBA), no interlace —
  anything else raises, honestly, like the container-boundary stub did.
* **WAV** — PCM decode via the stdlib ``wave`` module (RIFF header parse)
  + numpy sample math (RMS/peak). 8-bit unsigned and 16-bit signed PCM.

These kernels back the ``use_fake_decoder=False`` path in
operators/multimodal.py; the deterministic fake remains for formats the
stdlib cannot express (JPEG/MP4/...).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# decompression-bomb cap: largest raw pixel buffer the decoder will
# inflate (256 MiB ≈ a 9500×9500 RGBA image — far above fixture scale,
# far below executor heap)
_PNG_MAX_RAW_BYTES = 256 * 1024 * 1024


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def encode_png(width: int, height: int, pixels: bytes, channels: int = 3,
               row_filters: list[int] | None = None) -> bytes:
    """Minimal PNG writer: 8-bit RGB(A), one IDAT, optional per-row filter
    types (0=None, 1=Sub, 2=Up) to force the decoder through real filter
    reversal. ``pixels`` is row-major interleaved, len == w*h*channels."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    color_type = 2 if channels == 3 else 6
    stride = width * channels
    row_filters = row_filters or [0] * height

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ft = row_filters[y]
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub: delta vs pixel to the left
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up: delta vs same byte previous row
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        else:
            raise ValueError(f"writer supports filter 0/1/2, got {ft}")
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from a PNG byte string.

    Verifies the signature and every chunk CRC, inflates IDAT, reverses
    filters 0-4. Raises ValueError on corrupt input (incl. truncated
    chunks and undecompressable IDAT), NotImplementedError on
    unsupported PNG variants (interlaced, paletted, 16-bit)."""
    try:
        return _decode_png_inner(blob)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_inner(blob: bytes) -> tuple[int, int, int, bytes]:
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); supported: 8-bit RGB/RGBA"
                )
            channels = 3 if color == 2 else 4
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    stride = width * channels
    expected = height * (stride + 1)
    # bound BEFORE inflating: on untrusted crawl payloads a tiny blob
    # claiming huge IHDR dims would otherwise act as a decompression bomb
    # (executor OOM); cap the claimed raw size and stop the inflater at
    # expected+1 bytes so an over-long stream fails without materializing
    if expected > _PNG_MAX_RAW_BYTES:
        raise ValueError(
            f"PNG raw size {expected} exceeds cap {_PNG_MAX_RAW_BYTES} "
            f"({width}x{height}x{channels})"
        )
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("IDAT size mismatch")

    return width, height, channels, png_unfilter(raw, height, stride, channels)


def png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Reverse PNG row filters 0-4 (None/Sub/Up/Average/Paeth) over
    ``height`` rows of ``stride`` bytes, each preceded by one
    filter-type byte; ``bpp`` is the left-neighbor offset in bytes.
    Shared by the PNG decoder (bpp = channels at 8-bit) and the PDF
    /Predictor 10-15 reversal in ``operators/doc_extract.py`` (bpp =
    Colors·BitsPerComponent/8)."""
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def encode_wav_pcm(samples: bytes | list[int], sample_rate: int = 8000,
                   sampwidth: int = 1) -> bytes:
    """Mono PCM WAV bytes via the stdlib ``wave`` writer. ``sampwidth=1``
    → 8-bit unsigned; 2 → 16-bit signed little-endian."""
    import io
    import wave

    if isinstance(samples, list):
        if sampwidth == 1:
            samples = bytes(s & 0xFF for s in samples)
        else:
            samples = b"".join(struct.pack("<h", s) for s in samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """Real RIFF/WAV decode via stdlib ``wave``: header fields + sample
    stats (rms/peak computed on centered samples). Raises wave.Error on
    non-WAV input."""
    import io
    import math
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch, sw, sr, nframes = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        frames = w.readframes(nframes)
    if sw == 1:
        vals = [b - 128 for b in frames]
    elif sw == 2:
        vals = [v[0] for v in struct.iter_unpack("<h", frames)]
    else:
        raise NotImplementedError(f"sample width {sw} unsupported")
    n = len(vals)
    sumsq = sum(v * v for v in vals)
    return {
        "n_channels": nch,
        "sample_rate": sr,
        "n_samples": n,
        "duration_ms": n * 1000 // (sr * nch) if sr else 0,
        "sum_sq": sumsq,  # exact integer — engine-neutral
        "rms": round(math.sqrt(sumsq / n), 6) if n else 0.0,
        "peak": max((abs(v) for v in vals), default=0),
    }


# ---------------------------------------------------------------------------
# RGB → CMYK (S10's colorimetric core)
# ---------------------------------------------------------------------------

def rgb_to_cmyk(pixels: bytes) -> bytes:
    """Naive-GCR RGB→CMYK over interleaved 8-bit RGB bytes — the color
    math inside the reference's Ghostscript/ImageMagick conversion step
    (pdfcapture.go:399-431 shells out for the PDF/X *wrapper*, which
    stays out of scope; the per-pixel transform itself is exact):

        K = 255 - max(R, G, B)
        X' = round(255·(255-X-K)/(255-K))  for X in (R, G, B); 0 if K=255

    Integer round-half-up throughout — engine-neutral and mirrored by
    the media_cmyk_transform SQL oracle. Returns interleaved CMYK bytes
    (4 per pixel)."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    r, g, b = a[:, 0], a[:, 1], a[:, 2]
    kk = 255 - np.maximum(np.maximum(r, g), b)
    den = 2 * (255 - kk)
    safe = np.where(den == 0, 1, den)

    def chan(x):
        v = (510 * (255 - x - kk) + (255 - kk)) // safe
        return np.where(den == 0, 0, v)

    out = np.stack([chan(r), chan(g), chan(b), kk], axis=1)
    return out.astype(np.uint8).tobytes()
