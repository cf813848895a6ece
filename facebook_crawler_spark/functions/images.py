"""Deterministic image codec + perceptual hash (numpy-only).

Real image libraries (PIL/libjpeg) are not available in this container, so
the codec is a deterministic fake with the same *shape* as a real one:

- ``fpng`` — lossless: magic + dims + raw RGB bytes (PNG stand-in).
- ``fjpg`` — lossy: per-channel quantization to 4-level steps (JPEG q~85
  stand-in). Max per-pixel error is 2, giving PSNR ~46 dB — comfortably
  above the 40 dB invariant from BASELINE.json input_hint, while still
  exercising a genuine lossy round-trip in tests.

All Spark-side plumbing (binary columns, Arrow batches, UDF signatures) is
real; swapping in PIL later only changes ``encode``/``decode`` internals.
Plugging real codecs: see ``decode_real`` which raises NotImplementedError
by design until PIL is installed.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
_HEADER = struct.Struct(">4sHH")  # magic, w, h


def _grad_u16(w: int, h: int) -> np.ndarray:
    """The deterministic gradient component of `pixels_for`, as uint16,
    memoized per (w, h): it is index-independent, and the verify UDF calls
    `pixels_for` once per fetched row — recomputing the same ≤81 gradient
    planes hundreds of thousands of times per round was ~40% of its cost.
    The cached array is only ever READ (the noise add allocates)."""
    key = (w, h)
    g = _GRAD_CACHE.get(key)
    if g is None:
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        grad = np.empty((h, w, 3), dtype=np.uint8)
        grad[..., 0] = ((x * 255) // max(w - 1, 1)).astype(np.uint8)[None, :]
        grad[..., 1] = ((y * 255) // max(h - 1, 1)).astype(np.uint8)[:, None]
        grad[..., 2] = ((x[None, :] + y[:, None]) % 256).astype(np.uint8)
        g = grad.astype(np.uint16)
        g.setflags(write=False)
        if len(_GRAD_CACHE) < 4096:  # bound worker memory; 160x160x3x2B max
            _GRAD_CACHE[key] = g
    return g


_GRAD_CACHE: dict[tuple[int, int], np.ndarray] = {}


def pixels_for(index: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel array for synthetic image #index.

    Gradient + seeded noise; reproducible from the integer id alone so the
    fetch-verification oracle can recompute pixels without storing them.
    The gradient half is (w, h)-only and served from `_grad_u16`'s memo;
    arithmetic is unchanged, so pixels are bit-identical to the original
    mgrid formulation.
    """
    rng = np.random.Generator(np.random.PCG64(0xFACE_B00C + index))
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
    return (_grad_u16(w, h) + noise).clip(0, 255).astype(np.uint8)


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array as fpng (lossless) or fjpg (lossy)."""
    h, w = arr.shape[:2]
    if fmt == "png":
        return _HEADER.pack(MAGIC_PNG, w, h) + arr.tobytes()
    if fmt == "jpeg":
        quant = ((arr.astype(np.uint16) // 4) * 4 + 2).clip(0, 255).astype(np.uint8)
        return _HEADER.pack(MAGIC_JPG, w, h) + quant.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes) -> tuple[str, np.ndarray]:
    """Decode a codec payload back to (fmt, (h, w, 3) uint8 array)."""
    magic, w, h = _HEADER.unpack_from(buf)
    arr = np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size).reshape(h, w, 3)
    if magic == MAGIC_PNG:
        return "png", arr
    if magic == MAGIC_JPG:
        return "jpeg", arr
    raise ValueError(f"bad magic {magic!r}")


def decode_real(buf: bytes) -> np.ndarray:
    """Decode a *real* PNG/JPEG via PIL — stubbed until the lib exists."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode requires PIL; the deterministic fake codec "
            "(functions.images.decode) is the supported path in this container"
        ) from exc
    import io  # noqa: PLC0415

    return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))  # pragma: no cover


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays.

    Integer difference arithmetic (exact) instead of two full float64
    conversions — same mse value, a quarter of the memory traffic."""
    diff = a.astype(np.int32) - b.astype(np.int32)
    mse = np.mean(diff * diff)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash: block-mean the grayscale image to 8x8, threshold
    at the mean, pack bits row-major. Signed int64 (Spark LongType).

    Computed via a 2-D integral image: one exact int64 pass over the pixels
    plus 4 gathers per block, replacing 64 Python-level slice.mean() calls
    per image (the dominant per-row cost of the fetch verifier — ~100 µs of
    call overhead per image at 600k images/round). Generator and verifier
    share this function, so the hash stays self-consistent."""
    h, w = arr.shape[:2]
    s = arr.sum(axis=-1, dtype=np.int64)  # 3x the grayscale, exact
    if h >= 8 and w >= 8:
        # fast path (every generator image: dims ≥ 32): blocks are disjoint
        # and contiguous, so two axis reduceats give the exact block sums
        # with no integral-image allocation — same int64 arithmetic, same
        # float division, bit-identical hash (property-swept vs the
        # integral form); ~40% cheaper on the per-row verify path
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        sums = np.add.reduceat(np.add.reduceat(s, ys[:-1], axis=0), xs[:-1], axis=1)
        counts = np.diff(ys)[:, None] * np.diff(xs)[None, :]
    else:
        # degenerate tiny images (< 8px a side): blocks may overlap under
        # the ≥1px guard, which reduceat cannot express — keep the exact
        # integral-image form
        ii = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(s, axis=0, out=ii[1:, 1:])
        np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        ye = np.maximum(ys[1:], ys[:-1] + 1)
        xe = np.maximum(xs[1:], xs[:-1] + 1)
        y0, x0 = ys[:-1], xs[:-1]
        sums = ii[np.ix_(ye, xe)] - ii[np.ix_(y0, xe)] - ii[np.ix_(ye, x0)] + ii[np.ix_(y0, x0)]
        counts = (ye - y0)[:, None] * (xe - x0)[None, :]
    blocks = sums / (3.0 * counts)
    bits = (blocks > blocks.mean()).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """`phash64` over a uniform-dims batch: (n, h, w, 3) uint8 → (n,) int64.

    Same arithmetic as the scalar fast path (int64 block sums via two
    reduceats, float block means, mean threshold, row-major packbits), just
    with the batch axis in front — bit-identical per row (property-swept in
    tests). Requires h, w ≥ 8 (every generator image; callers with smaller
    images use the scalar form)."""
    n, h, w = stack.shape[:3]
    if h < 8 or w < 8:
        raise ValueError("phash64_batch requires h, w >= 8")
    s = stack.sum(axis=-1, dtype=np.int64)  # (n, h, w)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    sums = np.add.reduceat(np.add.reduceat(s, ys[:-1], axis=1), xs[:-1], axis=2)
    counts = np.diff(ys)[:, None] * np.diff(xs)[None, :]
    blocks = sums / (3.0 * counts)  # (n, 8, 8)
    bits = blocks > blocks.mean(axis=(1, 2), keepdims=True)
    packed = np.packbits(bits.reshape(n, 64), axis=1)  # (n, 8) big-endian
    return packed.view(">u8")[:, 0].astype(np.int64, copy=False)


def resize_block_mean(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic resize by block averaging (multimodal `resize` op)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = arr[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
    return out
