"""Multimodal column plumbing (image/audio/video as opaque binary).

Image decode/resize carry a REAL branch (``real_decode=True``) next to
the default deterministic stub: ``codec="pil"`` is import-guarded (any
format; loud refusal where PIL is absent, as in this build sandbox) and
``codec="bmp"`` is a pure-numpy 24-bit BMP codec (functions/imagecodec.py)
that is ALWAYS available, so the decode -> contrast -> median ->
LANCZOS-cap chain runs and is pytest-pinned even without PIL.
Audio/video kernels remain stubs (librosa/av absent everywhere we run).  Either way the Ray-side plumbing is real and
tested — binary schema in/out, small batches for wide rows, actor-pool
signature with per-actor setup, typed metadata struct output.

At scale: binary payloads make rows wide, so these stages run with small
``batch_size`` (payload_bytes x batch_size x concurrency must fit worker
heaps) and ``batch_format="pyarrow"`` end-to-end (binary round-trips
through pandas degrade to object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# Codec registry (VERDICT r3 task #7 / r4 task #1).  Two entries:
#
# * "pil" — import-guarded; where PIL exists the full real_decode branch
#   runs on any PIL-supported format.  Absent here, ``codec="pil"``
#   keeps the loud actionable NotImplementedError.
# * "bmp" — ALWAYS available: the pure-numpy 24-bit BMP codec
#   (functions/imagecodec.py), so the real-decode chain (decode ->
#   contrast 2.0 -> grayscale median-3 -> LANCZOS cap) executes under
#   pytest even in codec-less sandboxes.
#
# ``codec="auto"`` (the default for ``real_decode=True``) picks "pil"
# when importable, else "bmp".  The replicated preprocess chain covers
# the reference's contrast + denoise steps
# (ocr_app/core/image_processor.py:57-70); its third step, cv2-based
# skew correction (:72-110), is intentionally NOT replicated (needs
# cv2's Otsu/minAreaRect/warpAffine).
try:  # pragma: no cover - PIL absent in the build sandbox
    from PIL import Image as _PILImage

    DECODERS_AVAILABLE = True
except ImportError:
    _PILImage = None
    DECODERS_AVAILABLE = False

DECODERS = ("bmp",) if not DECODERS_AVAILABLE else ("pil", "bmp")


def _resolve_codec(codec: str, what: str) -> str:
    if codec == "auto":
        return "pil" if DECODERS_AVAILABLE else "bmp"
    if codec == "pil" and not DECODERS_AVAILABLE:
        raise NotImplementedError(
            f"image {what} with codec='pil' requires PIL which is not "
            f"available; use codec='bmp' (pure-python, 24-bit BMP only) "
            f"or real_decode=False for the deterministic stub")
    if codec not in ("pil", "bmp"):
        raise ValueError(f"unknown codec {codec!r}; available: "
                         f"{', '.join(DECODERS)}")
    return codec


class DecodeImageStub:
    """Actor-pool stage: binary image -> (width, height, mode) metadata +
    a fixed-size feature vector.

    Two branches behind ``real_decode`` (same output schema — the
    Ray-side plumbing is identical either way):

    * ``real_decode=False`` (default, always available): deterministic
      pseudo-dimensions/features from the payload hash, so the schema and
      actor plumbing are exercised honestly without codecs.
    * ``real_decode=True``: decode with the reference's replicated
      preprocessing chain — contrast enhance 2.0 then grayscale median-3
      denoise (``ocr_app/core/image_processor.py:57-70``; the cv2 skew
      step at :72-110 is intentionally not replicated) — emitting the
      true (width, height, mode) and an ``n_features``-bin normalized
      grayscale histogram as the feature vector.  ``codec="pil"`` needs
      PIL (any format); ``codec="bmp"`` is the always-available
      pure-numpy 24-bit BMP path (functions/imagecodec.py) running the
      same chain with Pillow-semantics numpy ops; ``codec="auto"``
      prefers PIL.  ``content_hash`` stays the raw-payload hash in all
      branches (lineage must identify the INPUT, not the decode).
      Undecodable payloads emit null metadata rather than killing the
      batch (the reference returns None per image on decode failure, it
      does not abort the batch job).
    """

    def __init__(self, real_decode: bool = False, n_features: int = 8,
                 preprocess: bool = True, codec: str = "auto",
                 enhance_contrast: bool = True, remove_noise: bool = True,
                 correct_skew: bool = False):
        if real_decode:
            self.codec = _resolve_codec(codec, "decode")
        if not 1 <= n_features <= 8:
            # the sha256 digest supplies 8 uint32 words; more would emit
            # short rows that crash the fixed_size_list build mid-pipeline
            raise ValueError(f"n_features must be 1..8, got {n_features}")
        if correct_skew:
            # the reference's per-step toggles are mirrored
            # (ocr.preprocessing.{enhance_contrast,remove_noise,
            # correct_skew}, settings-driven in preprocess_image), but the
            # skew step itself (image_processor.py:72-110) needs cv2's
            # Otsu + minAreaRect + warpAffine — refuse loudly rather than
            # silently skip a step the caller asked for.  NOTE the
            # reference DEFAULTS this step on; this engine defaults it
            # off and documents the divergence.
            raise NotImplementedError(
                "correct_skew requires cv2 (Otsu threshold + minAreaRect "
                "+ warpAffine), which is not replicated; only the "
                "enhance_contrast and remove_noise steps of the reference "
                "preprocess chain are available")
        self.real_decode = real_decode
        self.n_features = n_features
        self.preprocess = preprocess
        self.enhance_contrast = enhance_contrast
        self.remove_noise = remove_noise

    def _hist_feats(self, gray: "np.ndarray"):
        g = np.asarray(gray, dtype=np.float32) / 255.0
        hist, _ = np.histogram(g, bins=self.n_features, range=(0.0, 1.0))
        return (hist / max(1, g.size)).astype(np.float32).tolist()

    def _decode_real(self, raw: bytes):
        """(width, height, mode, features), or Nones on a payload the
        codec cannot parse.  Mirrors image_processor.preprocess_image's
        contrast + denoise (the reference enhances contrast on the image
        AS DECODED, no mode conversion first) before feature
        extraction."""
        if self.codec == "bmp":
            from ocr_ray.functions import imagecodec as ic

            try:
                arr = ic.bmp_decode(raw)
            except Exception:
                return None, None, None, [0.0] * self.n_features
            h, w = arr.shape[:2]
            if self.preprocess and self.enhance_contrast:
                arr = ic.contrast_enhance(arr, 2.0)
            gray = ic.to_gray(arr)
            if self.preprocess and self.remove_noise:
                gray = ic.median3(gray)
            return w, h, "RGB", self._hist_feats(gray)
        return self._decode_real_pil(raw)

    def _decode_real_pil(self, raw: bytes):  # pragma: no cover - needs PIL
        import io

        from PIL import ImageEnhance, ImageFilter

        try:
            with _PILImage.open(io.BytesIO(raw)) as im:
                im.load()
                w, h, mode = im.width, im.height, im.mode
                if self.preprocess and self.enhance_contrast:
                    # on the image AS DECODED, like the reference's
                    # _enhance_contrast — which means mode-P/I/F inputs
                    # blend indices or raise exactly as they do there
                    # (the except below maps that to null metadata);
                    # converting to RGB first would silently diverge
                    im = ImageEnhance.Contrast(im).enhance(2.0)
                if self.preprocess and self.remove_noise:
                    im = im.convert("L").filter(ImageFilter.MedianFilter(3))
                g = np.asarray(im.convert("L"), dtype=np.uint8)
                return w, h, mode, self._hist_feats(g)
        except Exception:
            return None, None, None, [0.0] * self.n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths, heights, modes, feats, hashes = [], [], [], [], []
        for raw in payloads:
            raw = raw or b""
            digest = hashlib.sha256(raw).digest()
            hashes.append(digest[:8].hex())
            if self.real_decode:
                w, h, mode, fv = self._decode_real(raw)
                widths.append(w)
                heights.append(h)
                modes.append(mode)
                feats.append(fv)
                continue
            widths.append(64 + digest[0] % 192)       # deterministic fake dims
            heights.append(64 + digest[1] % 192)
            modes.append("RGB" if digest[2] % 2 else "L")
            rng = np.frombuffer(digest[: self.n_features * 4],
                                dtype=np.uint32).astype(np.float32)
            feats.append((rng / np.float32(2**32)).tolist())
        meta = pa.StructArray.from_arrays(
            [
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(modes, pa.string()),
            ],
            names=["width", "height", "mode"],
        )
        out = batch.append_column("image_meta", meta)
        out = out.append_column("content_hash", pa.array(hashes, pa.string()))
        out = out.append_column(
            "features", pa.array(feats, pa.list_(pa.float32(), self.n_features))
        )
        return out


class ResizeImageStub:
    """Image-resize plumbing: binary in -> binary out + resize metadata.
    The default fake 'resize' is a deterministic truncate/pad to a size
    proportional to target area; ``real_decode=True`` swaps in the
    reference's dimension-cap resize — LANCZOS down-scale so
    max(w, h) <= max_dim, re-encoded in the source format (cap semantics
    per reference M6, performance.py:55-90) — behind the IDENTICAL
    output schema.  ``codec="pil"`` (any format, needs PIL) or
    ``codec="bmp"`` (always available, pure-numpy 24-bit BMP via
    functions/imagecodec.py); ``codec="auto"`` prefers PIL."""

    def __init__(self, max_dim: int = 2048, real_decode: bool = False,
                 codec: str = "auto"):
        if real_decode:
            self.codec = _resolve_codec(codec, "resize")
        self.max_dim = max_dim
        self.real_decode = real_decode

    def _resize_real(self, raw: bytes):
        """(payload, width, height, scaled); an unparsable payload passes
        through unscaled (reference returns the original on failure
        rather than dropping the record)."""
        if self.codec == "bmp":
            from ocr_ray.functions import imagecodec as ic

            try:
                arr = ic.bmp_decode(raw)
            except Exception:
                return raw, None, None, False
            h, w = arr.shape[:2]
            factor = min(1.0, self.max_dim / max(w, h))
            if factor >= 1.0:
                return raw, w, h, False
            nw = max(1, int(w * factor))
            nh = max(1, int(h * factor))
            return ic.bmp_encode(ic.lanczos_resize(arr, nw, nh)), nw, nh, True
        return self._resize_real_pil(raw)

    def _resize_real_pil(self, raw: bytes):  # pragma: no cover - needs PIL
        import io

        try:
            with _PILImage.open(io.BytesIO(raw)) as im:
                im.load()
                w, h = im.width, im.height
                factor = min(1.0, self.max_dim / max(w, h))
                if factor >= 1.0:
                    return raw, w, h, False
                nw = max(1, int(w * factor))
                nh = max(1, int(h * factor))
                fmt = im.format or "PNG"
                im = im.resize((nw, nh), _PILImage.LANCZOS)
                buf = io.BytesIO()
                im.save(buf, format=fmt)
                return buf.getvalue(), nw, nh, True
        except Exception:
            return raw, None, None, False

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, out_w, out_h, scaled = [], [], [], []
        for raw in batch["payload"].to_pylist():
            raw = raw or b""
            if self.real_decode:
                p, nw, nh, sc = self._resize_real(raw)
                out_payloads.append(p)
                out_w.append(nw)
                out_h.append(nh)
                scaled.append(sc)
                continue
            digest = hashlib.sha256(raw).digest()
            w, h = 64 + digest[0] * 16, 64 + digest[1] * 16  # fake source dims
            factor = min(1.0, self.max_dim / max(w, h))
            nw, nh = int(w * factor), int(h * factor)
            target_len = max(1, int(len(raw) * factor * factor)) if raw else 0
            out_payloads.append(raw[:target_len])
            out_w.append(nw)
            out_h.append(nh)
            scaled.append(factor < 1.0)
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload", pa.array(out_payloads, pa.binary()))
        out = out.append_column("width", pa.array(out_w, pa.int32()))
        out = out.append_column("height", pa.array(out_h, pa.int32()))
        out = out.append_column("scaled", pa.array(scaled, pa.bool_()))
        return out


class AudioFeatureStub:
    """Audio feature-extraction plumbing: binary in -> fixed-size
    MFCC-shaped float vector + duration metadata (deterministic fake; a real
    kernel would swap in librosa/torchaudio with the same signature)."""

    def __init__(self, n_mfcc: int = 13, sample_rate: int = 16000):
        if not 1 <= n_mfcc <= 16:
            # sha512 supplies 16 uint32 words for the deterministic fake
            raise ValueError(f"n_mfcc must be 1..16, got {n_mfcc}")
        self.n_mfcc = n_mfcc
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, durations = [], []
        for raw in batch["payload"].to_pylist():
            raw = raw or b""
            # raw double, NOT rounded: the oracle computes the identical
            # division and the driver's canonical round compares (rounding
            # here would pit Python half-even against DuckDB half-away on
            # every payload length ≡ 2 mod 4)
            durations.append(len(raw) / (2 * self.sample_rate))
            digest = hashlib.sha512(raw).digest()
            v = np.frombuffer(digest[: self.n_mfcc * 4], dtype=np.uint32)
            feats.append((v.astype(np.float32) / np.float32(2**32)).tolist())
        out = batch.append_column(
            "mfcc", pa.array(feats, pa.list_(pa.float32(), self.n_mfcc))
        )
        return out.append_column("duration_sec", pa.array(durations, pa.float64()))


class FrameSampleStub:
    """Video frame-sampling plumbing: one input row -> N frame rows with
    (frame_idx, frame_payload) — the flat-map shape of a real sampler."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for rid, raw in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            raw = raw or b""
            n_frames = max(1, len(raw) // 1024)
            for f in range(0, n_frames, self.every_n):
                ids.append(rid)
                idxs.append(f)
                frames.append(raw[f * 1024 : (f + 1) * 1024])
        return pa.table(
            {
                # id TYPE preserved from the input (the sibling stubs
                # never touch doc_id; a forced int64 here crashed on
                # string-keyed payload tables)
                "doc_id": pa.array(ids, batch["doc_id"].type),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )
