"""Pure-numpy image codec + PIL-semantics raster ops.

The multimodal real-decode chain (decode -> contrast enhance 2.0 ->
grayscale median-3 denoise -> LANCZOS dimension-cap resize; reference
``ocr_app/core/image_processor.py:29-71`` and ``performance.py:55-90``)
needs a codec to execute.  PIL is absent in environments like this build
sandbox, so this module supplies a self-contained 24-bit uncompressed BMP
codec (stdlib ``struct`` + numpy only) and numpy implementations of the
raster ops with Pillow's documented semantics:

* :func:`to_gray` — Pillow's integer ITU-R 601-2 luma:
  ``L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16``.
* :func:`contrast_enhance` — ``ImageEnhance.Contrast`` semantics: blend
  toward a solid-gray degenerate at the rounded grayscale mean,
  ``out = clip(in + factor * (in - mean))`` with Pillow Blend.c's
  truncate-after-clip conversion.
* :func:`median3` — ``ImageFilter.MedianFilter(3)``: 3x3 rank-4 median
  over an edge-replicated border (Pillow expands with ``ImagingExpand``,
  which replicates edge pixels).
* :func:`lanczos_resize` — separable Lanczos-3 resampling with Pillow's
  window placement (center ``(i + 0.5) * scale``, support
  ``3 * max(scale, 1)``, per-pass weight normalization and per-pass
  rounding to uint8).  Float weights rather than Pillow's 8.8 fixed
  point, so outputs are deterministic but not bit-identical to Pillow.

Skew correction (the reference chain's third step, cv2 Otsu +
minAreaRect + warpAffine) is intentionally NOT replicated — it needs
cv2; callers document the omission.
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0


def bmp_decode(raw: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed (BI_RGB) Windows BMP to an
    ``(H, W, 3)`` uint8 RGB array.  Supports bottom-up (positive height,
    the standard layout) and top-down (negative height) files; raises
    ``ValueError`` on anything else — callers treat that as
    'unparsable payload', mirroring the reference's per-image None on
    decode failure."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if planes != 1 or bpp != 24 or compression != _BI_RGB:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB is decoded")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    stride = (width * 3 + 3) & ~3
    need = data_off + stride * height
    if len(raw) < need:
        raise ValueError(
            f"truncated BMP: need {need} bytes, have {len(raw)}")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * height,
                         offset=data_off).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[..., ::-1])  # BGR -> RGB


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode an ``(H, W, 3)`` uint8 RGB array as a standard bottom-up
    24-bit BI_RGB BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    pix = rows.tobytes()
    file_size = 54 + len(pix)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB,
                       len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """Pillow's RGB->L integer luma (convert.c): exact match to
    ``Image.convert("L")``."""
    rgb = np.asarray(rgb)
    if rgb.ndim == 2:
        return rgb.astype(np.uint8, copy=False)
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8)


def contrast_enhance(arr: np.ndarray, factor: float = 2.0) -> np.ndarray:
    """``ImageEnhance.Contrast(im).enhance(factor)`` semantics: the
    degenerate is a solid gray at ``int(mean_of_L + 0.5)`` and the result
    is ``blend(degenerate, im, factor) = degenerate + factor * (im -
    degenerate)``, clipped to [0, 255] and truncated toward zero
    (Pillow Blend.c casts the clipped float to int)."""
    arr = np.asarray(arr)
    mean = int(float(to_gray(arr).mean()) + 0.5)
    out = mean + factor * (arr.astype(np.float64) - mean)
    return np.clip(out, 0.0, 255.0).astype(np.uint8)


def median3(gray: np.ndarray) -> np.ndarray:
    """``ImageFilter.MedianFilter(3)`` on a 2-D grayscale array: 3x3
    median with edge-replicate padding (Pillow's rank filter expands the
    border by replication before ranking)."""
    gray = np.asarray(gray, dtype=np.uint8)
    if gray.ndim != 2:
        raise ValueError(f"median3 expects a 2-D grayscale array, "
                         f"got shape {gray.shape}")
    p = np.pad(gray, 1, mode="edge")
    stack = np.stack([p[dy:dy + gray.shape[0], dx:dx + gray.shape[1]]
                      for dy in range(3) for dx in range(3)])
    return np.median(stack, axis=0).astype(np.uint8)


def _lanczos(x: np.ndarray, a: float = 3.0) -> np.ndarray:
    """Lanczos-a window: sinc(x) * sinc(x/a) on |x| < a, else 0
    (``np.sinc`` is the normalized sinc, matching Pillow's filter)."""
    return np.where(np.abs(x) < a, np.sinc(x) * np.sinc(x / a), 0.0)


def _resample_1d(img: np.ndarray, out_size: int) -> np.ndarray:
    """Resample along axis 0 with Pillow's window placement (center
    ``(i + 0.5) * scale``, support ``3 * filterscale``), WINDOWED like
    Pillow's own coefficient loop: weights exist only for the ~6 *
    filterscale input taps under each output pixel's window, and the
    contraction accumulates one tap at a time — O(taps) temporaries,
    never the dense (out x in) matrix (which is ~GB-scale transient per
    image on large scans).  Per-pass round + clip to uint8 like
    Pillow's two-pass pipeline."""
    in_size = img.shape[0]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 3.0 * filterscale
    centers = (np.arange(out_size) + 0.5) * scale           # (out,)
    xmin = np.maximum(np.floor(centers - support).astype(np.int64), 0)
    xmax = np.minimum(np.ceil(centers + support).astype(np.int64) + 1,
                      in_size)                              # exclusive
    taps = int((xmax - xmin).max())
    idx = xmin[:, None] + np.arange(taps)[None, :]          # (out, taps)
    valid = idx < xmax[:, None]
    idx = np.minimum(idx, in_size - 1)
    off = (idx + 0.5 - centers[:, None]) / filterscale
    w = _lanczos(off) * valid
    w[np.abs(idx + 0.5 - centers[:, None]) > support] = 0.0
    norm = w.sum(axis=1, keepdims=True)
    norm[norm == 0.0] = 1.0
    w = (w / norm).astype(np.float32)
    img_f = img.astype(np.float32)
    extra = (slice(None),) + (None,) * (img.ndim - 1)
    out = np.zeros((out_size,) + img.shape[1:], dtype=np.float32)
    for k in range(taps):
        out += w[:, k][extra] * img_f[idx[:, k]]
    return np.clip(np.floor(out + 0.5), 0.0, 255.0).astype(np.uint8)


def lanczos_resize(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Separable Lanczos-3 resize of an ``(H, W[, C])`` uint8 array to
    ``(new_h, new_w[, C])`` — the numpy analog of
    ``Image.resize((new_w, new_h), Image.LANCZOS)``."""
    if new_w < 1 or new_h < 1:
        raise ValueError(f"bad target size {new_w}x{new_h}")
    arr = np.asarray(arr, dtype=np.uint8)
    out = _resample_1d(arr, new_h)                       # vertical pass
    out = _resample_1d(out.swapaxes(0, 1), new_w).swapaxes(0, 1)
    return out
