"""The pure-numpy image codec (functions/imagecodec.py) and the
multimodal real-decode branch it unlocks — VERDICT r4 task #1: the
decode -> contrast -> median -> LANCZOS-cap chain must EXECUTE under
pytest (not skip), with output schema and a hand-checked pixel stat
pinned.  The chain mirrors ocr_app/core/image_processor.py:57-70
(contrast + denoise; the cv2 skew step is documented as not
replicated)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_ray.functions import imagecodec as ic


# ------------------------------------------------------------------- codec
class TestBmpCodec:
    def test_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (3, 5), (13, 9), (16, 16)]:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (ic.bmp_decode(ic.bmp_encode(arr)) == arr).all()

    def test_row_padding(self):
        # width 3 -> 9-byte rows pad to 12: the padding must be invisible
        arr = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
        raw = ic.bmp_encode(arr)
        assert (len(raw) - 54) == 12 * 3
        assert (ic.bmp_decode(raw) == arr).all()

    def test_top_down_bmp(self):
        import struct

        arr = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
        raw = bytearray(ic.bmp_encode(arr))
        w, h = struct.unpack_from("<ii", raw, 18)
        struct.pack_into("<ii", raw, 18, w, -h)  # same rows, top-down now
        assert (ic.bmp_decode(bytes(raw)) == arr[::-1]).all()

    def test_rejects_non_bmp_loudly(self):
        for bad in (b"", b"BM", b"notanimage", b"\x89PNG\r\n\x1a\n" + b"0" * 64):
            with pytest.raises(ValueError):
                ic.bmp_decode(bad)
        # 8-bit / RLE variants refused by name
        raw = bytearray(ic.bmp_encode(np.zeros((2, 2, 3), np.uint8)))
        raw[28] = 8  # bpp
        with pytest.raises(ValueError, match="24-bit"):
            ic.bmp_decode(bytes(raw))

    def test_truncated_pixel_data(self):
        raw = ic.bmp_encode(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(ValueError, match="truncated"):
            ic.bmp_decode(raw[:-5])


class TestRasterOps:
    def test_gray_is_pil_integer_luma(self):
        # hand-checked: pure red 255 -> (255*19595 + 0x8000) >> 16 = 76
        r = np.full((1, 1, 3), 0, np.uint8)
        r[0, 0] = (255, 0, 0)
        assert ic.to_gray(r)[0, 0] == 76
        g = np.zeros((1, 1, 3), np.uint8)
        g[0, 0] = (0, 255, 0)
        assert ic.to_gray(g)[0, 0] == 150
        b = np.zeros((1, 1, 3), np.uint8)
        b[0, 0] = (0, 0, 255)
        assert ic.to_gray(b)[0, 0] == 29
        w = np.full((1, 1, 3), 255, np.uint8)
        assert ic.to_gray(w)[0, 0] == 255

    def test_contrast_factor2_hand_checked(self):
        # half 64, half 192 -> mean 128; factor 2: 64 -> 0, 192 -> 255
        a = np.full((2, 2, 3), 64, np.uint8)
        a[:, 1] = 192
        out = ic.contrast_enhance(a, 2.0)
        assert (out[:, 0] == 0).all() and (out[:, 1] == 255).all()
        # constant image is a fixed point at any factor
        c = np.full((4, 4, 3), 77, np.uint8)
        assert (ic.contrast_enhance(c, 2.0) == 77).all()

    def test_median3_salt_removal_and_edges(self):
        m = np.full((5, 5), 10, np.uint8)
        m[2, 2] = 255
        out = ic.median3(m)
        assert (out == 10).all()          # salt removed, edges replicate
        # a hand-checked corner: replicate-pad corner sees 4x the corner
        # value -> median of [7,7,7,7,2,2,2,2,2] (corner 7 on 2-field)
        m2 = np.full((3, 3), 2, np.uint8)
        m2[0, 0] = 7
        assert ic.median3(m2)[0, 0] == 2

    def test_lanczos_constant_and_symmetry(self):
        c = np.full((16, 8, 3), 93, np.uint8)
        r = ic.lanczos_resize(c, 4, 8)
        assert r.shape == (8, 4, 3) and (r == 93).all()
        g = np.zeros((8, 8, 3), np.uint8)
        g[:, :4] = 200
        r = ic.lanczos_resize(g, 4, 4)
        assert (r == r[::-1]).all()       # vertical symmetry preserved
        assert (r[:, :1] >= 180).all() and (r[:, -1:] <= 20).all()

    def test_lanczos_bad_target_raises(self):
        with pytest.raises(ValueError):
            ic.lanczos_resize(np.zeros((4, 4, 3), np.uint8), 0, 2)


# --------------------------------------------- the real-decode chain RUNS
def _bmp_halves(w=4, h=4):
    """Left half black, right half white — hand-computable through the
    whole chain: gray mean 127.5 -> contrast pivot 128, factor 2 clips
    to pure 0/255; the 3x3 median keeps the halves; the 8-bin histogram
    is exactly [0.5, 0, 0, 0, 0, 0, 0, 0.5]."""
    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, w // 2:] = 255
    return ic.bmp_encode(arr)


class TestRealDecodeBranchExecutes:
    def test_decode_stub_real_bmp_via_ray(self, ray_session):
        from ocr_ray.stages.multimodal import DecodeImageStub

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([_bmp_halves(), b"notanimage"], pa.binary()),
        })
        out = (rd.from_arrow(t)
               .map_batches(DecodeImageStub, batch_format="pyarrow",
                            batch_size=2, concurrency=1,
                            fn_constructor_kwargs={"real_decode": True,
                                                   "codec": "bmp"})
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # schema contract identical to the stub branch
        assert {"image_meta", "content_hash", "features"} <= set(out.columns)
        meta = out["image_meta"].iloc[0]
        assert (meta["width"], meta["height"], meta["mode"]) == (4, 4, "RGB")
        # hand-checked pixel stat: histogram [0.5, 0,0,0,0,0,0, 0.5]
        feats = np.asarray(out["features"].iloc[0], dtype=np.float32)
        assert np.allclose(feats, [0.5, 0, 0, 0, 0, 0, 0, 0.5])
        # undecodable payload -> null metadata, zero features, row kept
        meta2 = out["image_meta"].iloc[1]
        assert meta2["width"] is None and meta2["mode"] is None
        assert np.allclose(out["features"].iloc[1], 0.0)
        # content_hash identifies the raw INPUT in both branches
        import hashlib

        assert out["content_hash"].iloc[0] == hashlib.sha256(
            _bmp_halves()).digest()[:8].hex()

    def test_decode_preprocess_changes_features(self):
        """The contrast+median steps actually RUN: a mid-gray gradient's
        histogram must differ between preprocess on/off (factor-2
        contrast pushes values outward)."""
        from ocr_ray.stages.multimodal import DecodeImageStub

        arr = np.tile(np.linspace(96, 160, 8, dtype=np.uint8)
                      .reshape(1, 8, 1), (8, 1, 3))
        raw = ic.bmp_encode(arr)
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([raw], pa.binary())})
        on = DecodeImageStub(real_decode=True, codec="bmp")(t)
        off = DecodeImageStub(real_decode=True, codec="bmp",
                              preprocess=False)(t)
        f_on = np.asarray(on.column("features")[0].as_py())
        f_off = np.asarray(off.column("features")[0].as_py())
        assert not np.allclose(f_on, f_off)
        # without preprocess the narrow gradient sits in bins 3-5 only
        assert f_off[[0, 1, 2, 6, 7]].sum() == 0.0
        # factor-2 contrast around the mean widens the spread
        assert f_on.nonzero()[0].min() <= 2 or f_on.nonzero()[0].max() >= 6

    def test_resize_stub_real_bmp_cap_semantics(self, ray_session):
        from ocr_ray.stages.multimodal import ResizeImageStub

        big = ic.bmp_encode(np.full((4, 8, 3), 93, np.uint8))    # 8x4
        small = ic.bmp_encode(np.full((2, 2, 3), 10, np.uint8))  # under cap
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([big, small, b"junk"], pa.binary()),
        })
        out = (rd.from_arrow(t)
               .map_batches(ResizeImageStub, batch_format="pyarrow",
                            batch_size=3, concurrency=1,
                            fn_constructor_kwargs={"max_dim": 4,
                                                   "real_decode": True,
                                                   "codec": "bmp"})
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # 8x4 capped at 4 -> 4x2, re-encoded BMP, constant value survives
        assert (out["width"].iloc[0], out["height"].iloc[0],
                bool(out["scaled"].iloc[0])) == (4, 2, True)
        dec = ic.bmp_decode(out["payload"].iloc[0])
        assert dec.shape == (2, 4, 3) and (dec == 93).all()
        # already under the cap: payload byte-identical, scaled False
        assert out["payload"].iloc[1] == small
        assert (out["width"].iloc[1], bool(out["scaled"].iloc[1])) == (2, False)
        # unparsable: passes through unscaled with null dims
        assert out["payload"].iloc[2] == b"junk"
        assert out["width"].iloc[2] is None or np.isnan(out["width"].iloc[2])

    def test_per_step_toggles_mirror_reference_settings(self):
        """The reference drives preprocess_image with per-step settings
        (ocr.preprocessing.{enhance_contrast,remove_noise,correct_skew});
        the stub mirrors the toggles: each enabled step changes the
        features, and the unreplicated skew step refuses loudly instead
        of silently skipping."""
        from ocr_ray.stages.multimodal import DecodeImageStub

        arr = np.tile(np.linspace(96, 160, 8, dtype=np.uint8)
                      .reshape(1, 8, 1), (8, 1, 3))
        arr[3, 3] = 255  # salt pixel for the median to act on
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([ic.bmp_encode(arr)], pa.binary())})

        def feats(**kw):
            out = DecodeImageStub(real_decode=True, codec="bmp", **kw)(t)
            return np.asarray(out.column("features")[0].as_py())

        both = feats()
        no_contrast = feats(enhance_contrast=False)
        no_noise = feats(remove_noise=False)
        neither = feats(enhance_contrast=False, remove_noise=False)
        assert not np.allclose(both, no_contrast)
        assert not np.allclose(both, no_noise)
        assert not np.allclose(neither, both)
        # preprocess=False is the master off switch regardless of toggles
        assert np.allclose(feats(preprocess=False), neither)

        with pytest.raises(NotImplementedError, match="cv2"):
            DecodeImageStub(real_decode=True, codec="bmp",
                            correct_skew=True)

    def test_codec_dispatch(self):
        from ocr_ray.stages.multimodal import (DECODERS, DECODERS_AVAILABLE,
                                               DecodeImageStub,
                                               ResizeImageStub)

        assert "bmp" in DECODERS
        if not DECODERS_AVAILABLE:
            # auto falls back to bmp; pil refuses loudly; unknown rejected
            assert DecodeImageStub(real_decode=True).codec == "bmp"
            assert ResizeImageStub(real_decode=True).codec == "bmp"
            with pytest.raises(NotImplementedError, match="PIL"):
                DecodeImageStub(real_decode=True, codec="pil")
        with pytest.raises(ValueError, match="unknown codec"):
            DecodeImageStub(real_decode=True, codec="webp")
