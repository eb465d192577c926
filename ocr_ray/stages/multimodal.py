"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment — see ``DecodeImageStub``): the Ray-side plumbing is real and
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

DECODERS_AVAILABLE = False  # no PIL/cv2/av in this environment


class DecodeImageStub:
    """Actor-pool stage: binary image -> (width, height, mode) metadata +
    a deterministic feature vector.

    Real decode raises ``NotImplementedError`` (libs absent); the
    deterministic fake derives pseudo-dimensions from the payload hash so
    the downstream schema/plumbing is exercised honestly.
    """

    def __init__(self, real_decode: bool = False, n_features: int = 8):
        if real_decode and not DECODERS_AVAILABLE:
            raise NotImplementedError(
                "image decode requires PIL/cv2 which are not available; "
                "run with real_decode=False for the deterministic stub"
            )
        if not 1 <= n_features <= 8:
            # the sha256 digest supplies 8 uint32 words; more would emit
            # short rows that crash the fixed_size_list build mid-pipeline
            raise ValueError(f"n_features must be 1..8, got {n_features}")
        self.real_decode = real_decode
        self.n_features = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths, heights, modes, feats, hashes = [], [], [], [], []
        for raw in payloads:
            raw = raw or b""
            digest = hashlib.sha256(raw).digest()
            hashes.append(digest[:8].hex())
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
    The fake 'resize' is a deterministic truncate/pad to a size proportional
    to target area; a real kernel would swap in PIL.Image.resize here with
    the identical signature."""

    def __init__(self, max_dim: int = 2048):  # cap per reference M6 (performance.py:55-90)
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, out_w, out_h, scaled = [], [], [], []
        for raw in batch["payload"].to_pylist():
            raw = raw or b""
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
