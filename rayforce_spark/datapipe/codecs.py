"""Stdlib-only media codecs: real BMP (hand-rolled struct) and WAV
(stdlib ``wave``) encode/decode for the multimodal seam.

PIL/librosa/ffmpeg are not installed in this container, but BMP and WAV
are simple enough to parse with ``struct`` — so the ``decoder="stdlib"``
path in :mod:`multimodal` is a REAL decode (bytes -> pixel/sample
arrays), not a deterministic fake. Covers the reference's multimodal
surface honestly: un-parseable formats still raise at the same seam.

Formats:
* BMP — BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), uncompressed
  (BI_RGB) 24-bit, bottom-up or top-down rows, 4-byte row padding.
* WAV — RIFF/WAVE PCM via the stdlib ``wave`` module (8/16-bit).

All functions are numpy-vectorized and called from Arrow-batched
mapInPandas stages only — nothing here touches the driver.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

BMP_HEADER_SIZE = 14 + 40


class CodecError(ValueError):
    """Unparseable or unsupported media bytes."""


# ---------------------------------------------------------------- BMP

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up rows, 4-byte padded, as every stock writer emits)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise CodecError(f"encode_bmp: want (H, W, 3), got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up, pad each row
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    size = BMP_HEADER_SIZE + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_SIZE)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (H, W, 3) uint8 RGB
    array. Handles bottom-up (positive height) and top-down (negative)
    row order and 4-byte row padding; anything else raises CodecError."""
    if len(b) < BMP_HEADER_SIZE or b[:2] != b"BM":
        raise CodecError("decode_bmp: not a BMP")
    (_sig, _size, _r1, _r2, off) = struct.unpack_from("<2sIHHI", b, 0)
    (hdr, w, h, _planes, bpp, comp, _isize, _xp, _yp, _cu, _ci) = \
        struct.unpack_from("<IiiHHIIiiII", b, 14)
    if hdr < 40:
        raise CodecError(f"decode_bmp: unsupported DIB header size {hdr}")
    if bpp != 24 or comp != 0:
        raise CodecError(
            f"decode_bmp: only 24-bit BI_RGB supported (bpp={bpp}, "
            f"compression={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise CodecError(f"decode_bmp: bad dimensions {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = off + stride * h
    if len(b) < need:
        raise CodecError(
            f"decode_bmp: truncated pixel data ({len(b)} < {need})")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, 3) array to (height, width,
    3) — the classic index-map formula (same grid PIL's NEAREST uses)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return pixels[yi][:, xi]


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, *, rate: int = 8000,
               sampwidth: int = 2, channels: int = 1) -> bytes:
    """Encode an int array as PCM WAV (stdlib ``wave``). 8-bit WAV is
    unsigned (0..255); 16-bit is signed little-endian."""
    s = np.asarray(samples)
    if sampwidth == 1:
        raw = s.astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = s.astype("<i2").tobytes()
    else:
        raise CodecError(f"encode_wav: sampwidth {sampwidth} unsupported")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(raw)
    return buf.getvalue()


def decode_wav(b: bytes):
    """Decode PCM WAV bytes -> (rate, channels, samples) where samples is
    an (n_frames, channels) int numpy array (uint8 for 8-bit, int16 for
    16-bit)."""
    try:
        with wave.open(io.BytesIO(b), "rb") as wf:
            rate = wf.getframerate()
            channels = wf.getnchannels()
            sampwidth = wf.getsampwidth()
            n = wf.getnframes()
            raw = wf.readframes(n)
    # catch-all, not just wave.Error: the stdlib wave module leaks bare
    # RuntimeError from Chunk.skip() on truncated chunk data (and could
    # plausibly raise struct/OS errors on other malformed streams) — the
    # quarantine contract is "parse or CodecError, nothing else"
    except Exception as e:
        raise CodecError(f"decode_wav: {type(e).__name__}: {e}") from e
    if sampwidth == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif sampwidth == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    else:
        raise CodecError(f"decode_wav: sampwidth {sampwidth} unsupported")
    return rate, channels, arr.reshape(-1, channels)


# ------------------------------------------------------------- sniff

def sniff(b: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' from magic bytes."""
    if len(b) >= 2 and b[:2] == b"BM":
        return "bmp"
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def media_features(b: bytes, dim: int) -> list[float]:
    """Real decoded features, fixed layout (padded/truncated to ``dim``):

    BMP: [width, height, mean, std, min, max, mean_R, mean_G, mean_B, ...]
    WAV: [rate, n_frames, mean, std, min, max, zero_cross_rate, ...]

    Raises CodecError on bytes that are neither — the honest behavior for
    a real decoder (callers choose skip/raise at the mapInPandas seam).
    """
    kind = sniff(b)
    if kind == "bmp":
        px = decode_bmp(b).astype(np.float64)
        vals = [float(px.shape[1]), float(px.shape[0]), float(px.mean()),
                float(px.std()), float(px.min()), float(px.max()),
                float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
                float(px[:, :, 2].mean())]
    elif kind == "wav":
        rate, _ch, s = decode_wav(b)
        f = s.astype(np.float64)
        zc = float(np.mean(np.diff(np.signbit(f - f.mean()).astype(np.int8),
                                   axis=0) != 0)) if len(f) > 1 else 0.0
        vals = [float(rate), float(len(s)), float(f.mean()), float(f.std()),
                float(f.min()), float(f.max()), zc]
    else:
        raise CodecError("media_features: unrecognized format "
                         f"(first bytes {b[:4]!r})")
    vals = vals[:dim]
    return vals + [0.0] * (dim - len(vals))
