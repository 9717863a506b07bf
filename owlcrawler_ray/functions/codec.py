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
zlib(quantized RGB bytes, level 3 — noise-dominated payloads
compress ~1.2:1 at any level; see encode()). shift = dropped low bits per channel
(0 = lossless). Quantization: q = v >> s (floor — max q = 2^(8-s)-1, no
clip needed), reconstruction v' = q * 2^s + 2^(s-1) (bin center). Floor +
bin-center is nearest-level for every input, so the worst-case per-pixel
error is 2^(s-1): even a 1x1 image of worst-case pixels decodes at
>= 20*log10(255/2^(s-1)) dB = 42.1 dB at s=2 / 48.1 dB at s=1 — a hard
per-row floor over the 40 dB invariant, not an averaged one. (Round-3's
np.round(v/2^s) used banker's rounding, whose half-to-even ties landed
boundary values one bin off — error up to 2^s + 2^(s-1), 38.6 dB on a
lone pixel; caught by test_codec_roundtrip_property.)
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

# decode() refuses headers claiming more pixels than this (67M px ≈
# 201 MB raw): the 2-byte w/h fields allow 65535² ≈ 12.9 GB, so without
# a bound a corrupt/hostile header turns the decode worker into an
# allocation bomb long before the reshape check can raise
MAX_DECODE_PIXELS = 1 << 26


_SYNTH_CACHE: dict = {}


def _synth_shape_arrays(w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """(base gradient (h,w,3) float64, (xx+yy)[...,None] (h,w,1) float64)
    for a shape — id-independent, so cached per (w,h). The corpus draws
    from a handful of dims; the cache is a few MB at most. Arrays are
    returned read-only so a caller bug can't corrupt later images."""
    key = (w, h)
    hit = _SYNTH_CACHE.get(key)
    if hit is None:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        base = np.stack(
            [
                (xx / max(w - 1, 1)) * 255.0,
                (yy / max(h - 1, 1)) * 255.0,
                ((xx + yy) / max(w + h - 2, 1)) * 255.0,
            ],
            axis=-1,
        )
        xy = (xx + yy)[..., None]
        base.setflags(write=False)
        xy.setflags(write=False)
        if len(_SYNTH_CACHE) > 64:  # bound per-process memory; the
            _SYNTH_CACHE.clear()    # corpus only ever uses ~4 shapes
        hit = _SYNTH_CACHE[key] = (base, xy)
    return hit


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for an id: smooth per-channel
    gradient + seeded noise. Same id -> same pixels, forever (the
    shape-array cache changes nothing byte-wise: identical expressions,
    dtypes and op order as the uncached form — pinned by
    test_synth_pixels_bit_identical_to_uncached)."""
    seed = int.from_bytes(
        hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    base, xy = _synth_shape_arrays(w, h)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(0.05, 0.3, size=3)
    # in-place forms of 40*sin(freq*xy + phase) and base+wave+noise —
    # identical value sequence and op order as the temporaries version
    # (IEEE ops are deterministic; only allocations change), covered by
    # the same differential test as the shape cache
    acc = freq * xy
    acc += phase
    np.sin(acc, out=acc)
    acc *= 40.0
    acc += base
    acc += rng.normal(0, 12.0, size=(h, w, 3))
    np.clip(acc, 0, 255, out=acc)
    return acc.astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    s = _FMT_SHIFT[fmt]
    if s:
        q = pixels >> s  # floor; max q = 2^(8-s)-1 by construction
    else:
        q = pixels
    head = (
        MAGIC
        + bytes([_FMT_CODE[fmt], s])
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
    )
    # level 3: the synthetic pixel fields compress to ~1.2:1 at ANY
    # level (noise-dominated), and level 6 pays 45% more CPU for 0.6%
    # fewer bytes (measured, STATS.md r5 cont. 5). compress() is the
    # single largest cost of the fused fetch task (25% of task time at
    # level 6); any level decodes identically (zlib is lossless).
    return head + zlib.compress(q.tobytes(), 3)


def decode(buf: bytes) -> tuple[np.ndarray, str, int, int]:
    """bytes -> (pixels (h,w,3) uint8, fmt, w, h). Raises ValueError on
    ANY payload that is not valid OWLC — including truncated headers,
    unknown format codes and corrupt zlib streams, which internally
    surface as IndexError/KeyError/zlib.error and are normalized here so
    callers can rely on the documented single exception type (a real
    fetch can hand this any bytes). This is the hook point where a PIL
    decoder would take over for real jpeg/png/webp payloads."""
    buf = bytes(buf)
    if buf[:4] != MAGIC:
        raise ValueError("not an OWLC payload")
    try:
        fmt = _FMT_NAME[buf[4]]
        s = buf[5]
        if s > 7:  # encode() only writes shifts in {0,1,2}; a uint8
            # pixel has 8 bits, so s>7 is definitively corrupt — catch
            # it here instead of returning garbage pixels
            raise ValueError(f"shift byte {s} out of range")
        w = int.from_bytes(buf[6:8], "little")
        h = int.from_bytes(buf[8:10], "little")
        if w == 0 or h == 0:
            # encode() never writes a zero dimension; a (0,w,3) array
            # "decodes" fine but crashes every downstream consumer
            # (phash64/resize index row 0) OUTSIDE their except-ValueError
            # guards — reject it here where the contract is ValueError
            raise ValueError(f"zero image dimension {w}x{h}")
        if w * h > MAX_DECODE_PIXELS:
            raise ValueError(f"pixel count {w}x{h} beyond decode bound")
        # bounded decompression: a hostile header + high-ratio stream
        # (zlib bombs reach ~1000:1) must not allocate beyond what the
        # header promises — decompress AT MOST w*h*3 bytes and require
        # the stream to end exactly there (want >= 3 always: the
        # zero-dimension guard above already rejected w*h == 0, and
        # max_length=0 would mean unlimited)
        want = w * h * 3
        d = zlib.decompressobj()
        raw = d.decompress(buf[10:], want)
        if (len(raw) != want or d.decompress(b"", 1)
                or not d.eof or d.unused_data):
            raise ValueError("payload does not decompress to w*h*3 bytes")
        q = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    except (IndexError, KeyError, zlib.error, ValueError) as e:
        raise ValueError(f"corrupt OWLC payload: {e}") from e
    if s:
        # bin-center reconstruction via a 256-entry LUT — byte-identical
        # to clip(q*2^s + 2^(s-1), 0, 255).astype(uint8) by construction
        # (the LUT IS that expression evaluated over all possible q), one
        # vectorized take instead of int32 widen+multiply+clip per pixel
        pix = _DEQUANT_LUT[s][q]
    else:
        pix = q
    return pix, fmt, w, h


# dequantization LUTs for every wire-legal shift (decode rejects s>7)
_DEQUANT_LUT = {
    s: np.clip(
        np.arange(256, dtype=np.int32) * (1 << s) + (1 << (s - 1)), 0, 255
    ).astype(np.uint8)
    for s in range(1, 8)
}


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
    sign, per FIXTURES.md §1) so it fits the input_hint's phash:int64.

    Bit-identical fast path vs the original gray-then-resize form: the
    resize is a pure row/col gather, and per-pixel channel means commute
    with gathering, so sampling the 32x32 grid FIRST converts 1k pixels
    to float64 instead of the whole image; the MSB-first bit pack is
    np.packbits + int.from_bytes(big) instead of a 64-step shift loop
    (pinned by test_phash_matches_reference_form)."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(32) * h // 32), h - 1)
    xs = np.minimum((np.arange(32) * w // 32), w - 1)
    small = pixels[np.ix_(ys, xs)].astype(np.float64).mean(axis=2)
    d = _dct_matrix(32)
    coef = d @ small @ d.T
    flat = coef[:8, :8].flatten()
    med = np.median(flat[1:])  # exclude DC term from the median
    bits = (flat > med).astype(np.uint8)
    return int(np.int64(np.uint64(
        int.from_bytes(np.packbits(bits).tobytes(), "big")
    )))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


try:  # real-codec drop-in gate (not present in this sandbox)
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ---------------------------------------------------------------------------
# resize / video container / audio — multimodal kernels (all deterministic)
# ---------------------------------------------------------------------------

def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (h,w,3)->(out_h,out_w,3)."""
    h, w, _ = pixels.shape
    ys = np.minimum(np.arange(out_h) * h // out_h, h - 1)
    xs = np.minimum(np.arange(out_w) * w // out_w, w - 1)
    return pixels[np.ix_(ys, xs)]


def resize_block_mean(pixels: np.ndarray, factor: int) -> np.ndarray:
    """Area (block-mean) downscale by an integer factor (pads by edge
    replication when dims aren't divisible)."""
    h, w, c = pixels.shape
    ph, pw = (-h) % factor, (-w) % factor
    if ph or pw:
        pixels = np.pad(pixels, ((0, ph), (0, pw), (0, 0)), mode="edge")
        h, w = pixels.shape[:2]
    out = pixels.reshape(h // factor, factor, w // factor, factor, c)
    return out.mean(axis=(1, 3)).round().astype(np.uint8)


VIDEO_MAGIC = b"OWLV"


def encode_video(frames: list[np.ndarray], fmt: str = "jpeg") -> bytes:
    """Tiny deterministic video container: per-frame OWLC payloads with a
    length index. Stands in for mp4/webm so the frame-sampling PIPELINE
    (schema, batch sizing, stage signatures) is real; a PyAV/ffmpeg decoder
    drops in behind the same two functions."""
    payloads = [encode(f, fmt) for f in frames]
    head = VIDEO_MAGIC + len(payloads).to_bytes(4, "little")
    head += b"".join(len(p).to_bytes(4, "little") for p in payloads)
    return head + b"".join(payloads)


def video_frame_count(buf: bytes) -> int:
    buf = bytes(buf)
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not an OWLV payload")
    return int.from_bytes(buf[4:8], "little")


def decode_video_frames(buf: bytes, stride: int = 1,
                        max_frames: int | None = None) -> list[np.ndarray]:
    """Every ``stride``-th frame, decoded. Raises ValueError on foreign
    bytes (the hook point for a real ffmpeg-based sampler)."""
    buf = bytes(buf)
    n = video_frame_count(buf)
    if 8 + 4 * n > len(buf):
        # the 4-byte count is wire data: a corrupt header claiming 2^32
        # frames would otherwise build a multi-GB sizes list from an
        # 8-byte input before any frame decode could raise
        raise ValueError(
            f"OWLV index claims {n} frames beyond the payload length"
        )
    sizes = [
        int.from_bytes(buf[8 + 4 * i : 12 + 4 * i], "little") for i in range(n)
    ]
    offs = [8 + 4 * n]
    for s in sizes[:-1]:
        offs.append(offs[-1] + s)
    out = []
    for i in range(0, n, stride):
        frame, *_ = decode(buf[offs[i] : offs[i] + sizes[i]])
        out.append(frame)
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def synth_audio(clip_id: str, n_samples: int = 8000) -> np.ndarray:
    """Deterministic int16 PCM clip (seeded tone mix + noise)."""
    seed = int.from_bytes(
        hashlib.blake2b(clip_id.encode(), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64)
    sig = np.zeros(n_samples)
    for _ in range(3):
        f = rng.uniform(0.005, 0.2)
        sig += rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    sig += rng.normal(0, 0.05, n_samples)
    return np.clip(sig * 12000, -32768, 32767).astype(np.int16)


def encode_audio(samples: np.ndarray) -> bytes:
    return b"OWLA" + len(samples).to_bytes(4, "little") + samples.astype("<i2").tobytes()


def decode_audio(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    if buf[:4] != b"OWLA":
        raise ValueError("not an OWLA payload")
    n = int.from_bytes(buf[4:8], "little")
    return np.frombuffer(buf[8 : 8 + 2 * n], dtype="<i2")


def audio_features(samples: np.ndarray) -> dict:
    """RMS energy + zero-crossing rate + peak — the stateless feature-
    extraction kernel for an audio map_batches stage."""
    x = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return {"rms": rms, "zcr": zc, "peak": peak}
