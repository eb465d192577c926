"""Wave-16 review fixes over the flagship path: null-turn contract in
the conv exchange, typed-empty conv_id, lineage checksum verification,
segments conf robustness, taskpool FIFO eviction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _turns(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_assemble_rejects_null_turn_fields(ray_session):
    """A null conv_id / turn_idx / clean_text raises a clear contract
    error instead of ArrowInvalid / NaN-salt misordering / nulling the
    whole conversation via binary_join."""
    from ocr_ray.stages.reassemble import assemble_conversations

    base = {"conv_id": "c1", "turn_idx": 0, "role": "user",
            "clean_text": "hi"}
    for col in ("conv_id", "turn_idx", "role", "clean_text"):
        rows = [dict(base), dict(base, turn_idx=1)]
        rows[1][col] = None
        with pytest.raises(Exception, match="null"):
            assemble_conversations(_turns(rows)).materialize()


def test_assemble_empty_preserves_conv_id_type(ray_session):
    import ray.data as rd

    from ocr_ray.stages.reassemble import assemble_conversations

    empty = rd.from_arrow(pa.table({
        "conv_id": pa.array([], pa.int64()),
        "turn_idx": pa.array([], pa.int64()),
        "role": pa.array([], pa.string()),
        "clean_text": pa.array([], pa.string()),
    }))
    out = assemble_conversations(empty)
    assert out.count() == 0
    assert pa.types.is_int64(out.schema().base_schema.field("conv_id").type)


def test_lineage_checksum_detects_value_corruption(tmp_path):
    """Same row count, different values: resume must reject the group
    (the persisted checksum is now actually compared)."""
    import os

    from ocr_ray.state.lineage import (LineageRecord, completed_groups,
                                       write_lineage)

    out = str(tmp_path / "turns")
    gdir = os.path.join(out, "group=00000")
    os.makedirs(gdir, exist_ok=True)
    h = np.array([11, 22, 33], dtype=np.uint64)
    pd.DataFrame({"x": [1, 2, 3],
                  "row_hash": h}).to_parquet(os.path.join(gdir, "p.parquet"))
    good = f"{int(h.sum()) & 0xFFFFFFFFFFFFFFFF:016x}"
    write_lineage(out, LineageRecord(
        group_id=0, fragments=["a.parquet"], extractor_version="v1",
        row_count=3, checksum=good, metrics={}))
    assert completed_groups(out, [["/in/a.parquet"]], "v1") == [0]

    # corrupt one value, keep the row count
    h2 = np.array([11, 22, 99], dtype=np.uint64)
    pd.DataFrame({"x": [1, 2, 3],
                  "row_hash": h2}).to_parquet(os.path.join(gdir, "p.parquet"))
    assert completed_groups(out, [["/in/a.parquet"]], "v1") == []


def test_segments_tolerate_malformed_conf(ray_session):
    """A boxed payload with conf=null / non-string text takes the
    in-band empty-segments path instead of killing the map task."""
    import json

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.stages.extract import Extractor

    ex = Extractor(DEFAULT_CONFIG, emit_segments=True)
    bad = json.dumps({"page_height": 100, "boxes": [
        {"x0": 1, "y0": 1, "x1": 2, "y1": 2, "text": "w", "conf": None}]})
    ok = json.dumps({"page_height": 100, "boxes": [
        {"x0": 1, "y0": 1, "x1": 2, "y1": 2, "text": "w", "conf": 0.9}]})
    batch = pa.table({"conv_id": ["c", "c"], "turn_idx": [0, 1],
                      "role": ["user", "user"],
                      "norm_text": [bad, ok], "kind": ["boxed", "boxed"]})
    out = ex(batch)
    segs = out["segments"].to_pylist()
    # conf=null coerces to 0.0 in-band (no TypeError escaping the task)
    assert len(segs[0]) == 1 and segs[0][0]["conf"] == 0.0
    assert len(segs[1]) == 1
    assert segs[1][0]["conf"] == pytest.approx(0.9)  # float32 storage

    # a genuinely unconvertible conf takes the in-band EMPTY path
    import json as _json
    worse = _json.dumps({"page_height": 100, "boxes": [
        {"x0": 1, "y0": 1, "x1": 2, "y1": 2, "text": "w", "conf": "bad"}]})
    b2 = pa.table({"conv_id": ["c"], "turn_idx": [0], "role": ["user"],
                   "norm_text": [worse], "kind": ["boxed"]})
    assert ex(b2)["segments"].to_pylist()[0] == []


def test_taskpool_evicts_one_not_all():
    from ocr_ray.stages import taskpool as tp

    class Probe:
        built = 0

        def __init__(self, tag=0):
            Probe.built += 1

        def __call__(self, b):
            return b

    tp._CACHE.clear()
    fns = [tp.task_pool(Probe, tag=i) for i in range(tp._CACHE_MAX + 1)]
    for f in fns:
        f(pd.DataFrame())
    assert Probe.built == tp._CACHE_MAX + 1
    # the overflow evicted only the OLDEST: re-calling the NEWEST keys
    # builds nothing new
    before = Probe.built
    for f in fns[2:]:
        f(pd.DataFrame())
    assert Probe.built == before
    tp._CACHE.clear()
