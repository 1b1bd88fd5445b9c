"""Pure-stdlib reference codecs: 24-bit BMP and 16-bit PCM WAV.

The container ships no media libraries (PIL/ffmpeg), so the multimodal
family's generic decode slots are stubbed (functions/multimodal.py).  These
two formats need NOTHING beyond ``struct``/``wave``, which makes a REAL
encode→Arrow-transfer→decode→feature path testable end-to-end: m06 runs
genuine byte-level parsing inside the ``mapInPandas`` stage, byte-identical
to what a PIL-backed stage would do for PNG/JPEG.

All extracted features are exact integers (milli-unit means via truncating
division, integer-sqrt RMS), so results are reproducible bit-for-bit across
partitionings and in the pure-Python differential tests.
"""

from __future__ import annotations

import io
import math
import struct
import wave

# --- 24-bit uncompressed BMP ----------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")  # signature, file size, res, res, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp24(width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode rows of (r, g, b) pixels (top-down input) as a standard
    bottom-up 24-bit BMP with 4-byte row padding."""
    if len(rgb_rows) != height or any(len(r) != width for r in rgb_rows):
        raise ValueError("rgb_rows shape must be height x width")
    row_size = (width * 3 + 3) & ~3
    data_size = row_size * height
    header = _BMP_HEADER.pack(b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = _BMP_INFO.pack(40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    out = bytearray(header + info)
    for row in reversed(rgb_rows):  # BMP stores bottom-up
        for r, g, b in row:
            out += bytes((b, g, r))  # little-endian BGR
        out += b"\x00" * (row_size - width * 3)
    return bytes(out)


def decode_bmp24(data: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP -> dimensions + exact per-channel
    milli-unit means.  Raises ValueError on any other BMP flavor."""
    sig, _fsize, _r1, _r2, offset = _BMP_HEADER.unpack_from(data, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (hsize, width, height, _planes, bpp, comp, *_rest) = _BMP_INFO.unpack_from(data, 14)
    if hsize < 40 or bpp != 24 or comp != 0 or height <= 0:
        raise ValueError(f"unsupported BMP flavor (bpp={bpp}, comp={comp})")
    row_size = (width * 3 + 3) & ~3
    sum_r = sum_g = sum_b = 0
    for y in range(height):
        base = offset + y * row_size
        for x in range(width):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            sum_r += r
            sum_g += g
            sum_b += b
    n = width * height
    return {
        "width": width,
        "height": height,
        "mean_r_milli": sum_r * 1000 // n,
        "mean_g_milli": sum_g * 1000 // n,
        "mean_b_milli": sum_b * 1000 // n,
    }


# --- 16-bit PCM WAV --------------------------------------------------------


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono int16 samples as a PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> dict:
    """Parse a mono 16-bit PCM WAV -> rate/length/duration + exact integer
    RMS (milli-units, isqrt) and peak amplitude."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only mono 16-bit PCM supported")
        rate = w.getframerate()
        n = w.getnframes()
        samples = struct.unpack(f"<{n}h", w.readframes(n))
    sum_sq = sum(s * s for s in samples)
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "rms_milli": math.isqrt(sum_sq * 1_000_000 // n) if n else 0,
        "peak": max((abs(s) for s in samples), default=0),
    }


# --- deterministic payload synthesis (the corpus has no real media) --------


def synth_media_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic tiny media payload for a document: even ids get a BMP
    (dimensions and pixels pure functions of the id), odd ids a WAV.  The
    synthesis stands in for reading real object-store bytes; everything
    downstream of it (Arrow transfer, byte parsing, feature math) is the
    real production path."""
    if doc_id % 2 == 0:
        w, h = 8 + doc_id % 5, 8 + doc_id % 3
        rows = [
            [
                (
                    (doc_id * 7 + x * 13 + y * 29) % 256,
                    (doc_id * 11 + x * 3 + y * 17) % 256,
                    (doc_id * 5 + x * 23 + y * 7) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        return "image/bmp", encode_bmp24(w, h, rows)
    n = 64 + doc_id % 32
    samples = [((doc_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]
    return "audio/wav", encode_wav_pcm16(8000, samples)


def bmp24_row_sums(data: bytes) -> list[int]:
    """Per-pixel-row byte sums (BGR, padding excluded) of a 24-bit BMP, in
    TOP-DOWN visual order — the per-frame unit for image frame sampling."""
    sig, _fsize, _r1, _r2, offset = _BMP_HEADER.unpack_from(data, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (hsize, width, height, _planes, bpp, comp, *_rest) = _BMP_INFO.unpack_from(data, 14)
    if hsize < 40 or bpp != 24 or comp != 0 or height <= 0:
        raise ValueError(f"unsupported BMP flavor (bpp={bpp}, comp={comp})")
    row_size = (width * 3 + 3) & ~3
    sums = []
    for y in range(height):  # stored bottom-up
        base = offset + y * row_size
        sums.append(sum(data[base : base + width * 3]))
    sums.reverse()  # return top-down
    return sums


def wav_pcm16_samples(data: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) of a mono 16-bit PCM WAV."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only mono 16-bit PCM supported")
        rate = w.getframerate()
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    return rate, samples
