"""Self-contained deterministic image codec + perceptual hash + PSNR.

The sandbox has no PIL/libjpeg/libwebp, so the *codec* is our own — a small,
fully deterministic format ("OWLC") with a lossless profile ("png") and two
lossy quantization profiles ("jpeg", "webp"). The crawl/decode PIPELINE
(schema, zero-copy Arrow binary columns, actor-pool decode stage, per-row
PSNR >= 40 dB invariant for lossy formats — BASELINE.json input_hint) is
real and tested; only the byte format differs from the real-world codecs.
A real PIL-based codec can drop in behind the same encode/decode signature
(see ``HAVE_PIL`` gate at the bottom).

Wire format: b"OWLC" | fmt_code u8 | shift u8 | w u16le | h u16le |
zlib(quantized RGB bytes, level 6). shift = dropped low bits per channel
(0 = lossless). Quantization: q = clip(round(v / 2^s), 0, 2^(8-s)-1),
reconstruction v' = q * 2^s + 2^(s-1) — max abs error 2^(s-1), so PSNR is
~46 dB at s=2 and ~52 dB at s=1, comfortably over the 40 dB invariant.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MAGIC = b"OWLC"
_FMT_CODE = {"png": 0, "jpeg": 1, "webp": 2}
_FMT_NAME = {v: k for k, v in _FMT_CODE.items()}
_FMT_SHIFT = {"png": 0, "jpeg": 2, "webp": 1}
LOSSY_FMTS = ("jpeg", "webp")


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for an id: smooth per-channel
    gradient + seeded noise. Same id -> same pixels, forever."""
    seed = int.from_bytes(
        hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            (xx / max(w - 1, 1)) * 255.0,
            (yy / max(h - 1, 1)) * 255.0,
            ((xx + yy) / max(w + h - 2, 1)) * 255.0,
        ],
        axis=-1,
    )
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(0.05, 0.3, size=3)
    wave = 40.0 * np.sin(freq * (xx + yy)[..., None] + phase)
    noise = rng.normal(0, 12.0, size=(h, w, 3))
    return np.clip(base + wave + noise, 0, 255).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    s = _FMT_SHIFT[fmt]
    if s:
        q = np.clip(
            np.round(pixels.astype(np.float64) / (1 << s)), 0, (1 << (8 - s)) - 1
        ).astype(np.uint8)
    else:
        q = pixels
    head = (
        MAGIC
        + bytes([_FMT_CODE[fmt], s])
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
    )
    return head + zlib.compress(q.tobytes(), 6)


def decode(buf: bytes) -> tuple[np.ndarray, str, int, int]:
    """bytes -> (pixels (h,w,3) uint8, fmt, w, h). Raises ValueError on a
    payload that is not OWLC-encoded (the hook point where a PIL decoder
    would take over for real jpeg/png/webp bytes)."""
    buf = bytes(buf)
    if buf[:4] != MAGIC:
        raise ValueError("not an OWLC payload")
    fmt = _FMT_NAME[buf[4]]
    s = buf[5]
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    q = np.frombuffer(zlib.decompress(buf[10:]), dtype=np.uint8).reshape(h, w, 3)
    if s:
        pix = np.clip(
            q.astype(np.int32) * (1 << s) + (1 << (s - 1)), 0, 255
        ).astype(np.uint8)
    else:
        pix = q
    return pix, fmt, w, h


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0, :] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def _resize_gray(gray: np.ndarray, size: int = 32) -> np.ndarray:
    h, w = gray.shape
    ys = np.minimum((np.arange(size) * h // size), h - 1)
    xs = np.minimum((np.arange(size) * w // size), w - 1)
    return gray[np.ix_(ys, xs)]


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash -> SIGNED int64 (bit 63 folded into the
    sign, per FIXTURES.md §1) so it fits the input_hint's phash:int64."""
    gray = pixels.astype(np.float64).mean(axis=2)
    small = _resize_gray(gray, 32)
    d = _dct_matrix(32)
    coef = d @ small @ d.T
    block = coef[:8, :8].copy()
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC term from the median
    bits = (flat > med).astype(np.uint64)
    val = np.uint64(0)
    for i in range(64):
        val = (val << np.uint64(1)) | bits[i]
    return int(np.int64(val))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


try:  # real-codec drop-in gate (not present in this sandbox)
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False
