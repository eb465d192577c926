"""Round-4 fixes: every r3 ADVICE.md finding plus VERDICT r3 task #6.

- events_attribution null-ts semantics (ADVICE medium): NaT events are
  excluded on BOTH sides (replica filter + oracle WHERE ts IS NOT NULL)
  instead of the replica relying on INT64_MIN arithmetic.
- readability/summary strip-vs-trim (ADVICE low): replica strips SPACES
  only, matching DuckDB trim(), so a trailing newline after a sentence
  terminator counts as a boundary on both sides.
- io_compact_roundtrip scratch race (ADVICE low): mkdtemp per call, so
  concurrent runs against the same sf_dir cannot rmtree each other.
- profile_table dtype guard (ADVICE low): DATE columns are now profiled
  (ISO bounds, DuckDB-identical); decimal/binary/nested rejections name
  the actual dtype family.
- events_props_stats all-NaN batch slice (VERDICT r3 task #6): a batch
  whose every extracted k is malformed must not poison the global min/max
  through the sentinel merge.
"""

import os

import numpy as np
import pandas as pd
import pytest


def _events_frame(rows):
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["user_id"] = pd.array(ev["user_id"], dtype="Int64")
    ev["value"] = 0.0
    ev["props"] = "{}"
    return ev


def test_events_attribution_nat_ts(ray_session, tmp_path):
    """NaT-ts events are excluded from the attribution chain on both
    sides (ADVICE r3 medium).  Without the shared rule the replica's
    int64 view of NaT (INT64_MIN) attributes a NaT purchase to a NaT
    click with lag 0 while the oracle yields NULL."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_attribution

    d = str(tmp_path)
    t0 = pd.Timestamp("2020-01-10 00:00:00")
    day = pd.Timedelta(days=1)
    rows = [
        # user 1: NaT click then NaT purchase — the INT64_MIN trap: both
        # convert to the same int64, lag would be 0 without the fix
        (1, pd.NaT, 1, "click"),
        (2, pd.NaT, 1, "purchase"),
        # user 2: real click then NaT purchase — excluded purchase
        (3, t0, 2, "click"),
        (4, pd.NaT, 2, "purchase"),
        # user 3: NaT click then real purchase — the NaT click is not a
        # candidate; no attribution
        (5, pd.NaT, 3, "click"),
        (6, t0 + day, 3, "purchase"),
        # user 4: control — a normal attributed pair must still work
        (7, t0, 4, "click"),
        (8, t0 + day, 4, "purchase"),
    ]
    _events_frame(rows).to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_attribution(d)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_attribution"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False)
    # NaT purchases are absent entirely (excluded, like the oracle scan)
    assert set(got["event_id"]) == {6, 8}
    r = got.set_index("event_id")
    assert pd.isna(r.loc[6, "attributed_event_id"])
    assert r.loc[8, "attributed_event_id"] == 7
    assert r.loc[8, "lag_s"] == 86400


def test_readability_summary_space_only_strip(ray_session, tmp_path):
    """Replica strips SPACES only, like DuckDB trim() — a doc ending
    '.\\n' keeps its trailing sentence boundary on both sides, so the
    sentence count and the summary split agree (ADVICE r3 low)."""
    import duckdb

    from ocr_ray.pipelines.queries import (ORACLE_SQL, q_doc_readability,
                                           q_doc_summary)

    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "First sentence here. Second sentence follows.\n",   # trailing \n
            "Tabbed terminator stays. Visible sentence count.\t",
            "  leading spaces strip. trailing spaces strip.   ",
            "One sentence only without terminator",
            "Alpha beta. \n\t Gamma delta. Epsilon!",            # mixed ws
            "newline\nmid sentence. does not split? here.\n\n",
        ],
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    con = duckdb.connect()
    con.execute(f"create view documents as select * from "
                f"'{os.path.join(d, 'documents.parquet')}'")

    got_r = (q_doc_readability(d).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    exp_r = (con.execute(ORACLE_SQL["doc_readability"]).df()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_r, exp_r, check_dtype=False)
    # the doc ending '.\n' counts its final boundary: 1 + 2 matches
    assert int(got_r.loc[0, "n_sent"]) == 3

    got_s = (q_doc_summary(d).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    exp_s = (con.execute(ORACLE_SQL["doc_summary"]).df()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def test_compact_roundtrip_unique_scratch(ray_session, tmp_path,
                                          monkeypatch):
    """q_io_compact_roundtrip runs against the SAME sf_dir must use a
    FRESH mkdtemp scratch per call and remove it afterwards — the old
    fixed names derived from sf_dir alone made two concurrent driver
    processes rmtree each other's files (ADVICE r3 low).  (Thread-level
    concurrency is not exercised here: concurrent ray.data IO calls from
    two threads hit an unrelated fsspec lazy-import race inside Ray's
    path resolution in this aiohttp-less environment.)"""
    import tempfile

    from ocr_ray.pipelines import queries as q

    d = str(tmp_path)
    n = 3_000
    pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "n_chars": np.arange(n, dtype="int64") % 97,
    }).to_parquet(os.path.join(d, "documents.parquet"))

    made = []
    real_mkdtemp = tempfile.mkdtemp

    def spy_mkdtemp(*a, **kw):
        p = real_mkdtemp(*a, **kw)
        made.append(p)
        return p

    monkeypatch.setattr(tempfile, "mkdtemp", spy_mkdtemp)
    results = [q.q_io_compact_roundtrip(d) for _ in range(2)]

    exp_sum = int((np.arange(n) % 97).sum())
    for res in results:
        assert int(res.loc[0, "n_docs"]) == n
        assert int(res.loc[0, "n_ids"]) == n
        assert int(res.loc[0, "sum_chars"]) == exp_sum
    scratches = [p for p in made if "ocr_ray_compact_" in p]
    assert len(scratches) == 2 and scratches[0] != scratches[1]
    assert not any(os.path.exists(p) for p in scratches)  # cleaned up


def test_profile_table_date_column(ray_session, tmp_path):
    """DATE columns now profile: ISO min/max identical to DuckDB's
    CAST(DATE AS VARCHAR), exact distinct, null handling (ADVICE r3
    low — previously rejected with a misleading 'nested/binary')."""
    import duckdb
    import ray.data as rd

    from ocr_ray.stages.validate import profile_table

    d = str(tmp_path / "t.parquet")
    df = pd.DataFrame({
        "dt": pd.array(
            [pd.Timestamp("2021-03-05").date(),
             pd.Timestamp("1999-12-31").date(),
             None,
             pd.Timestamp("2021-03-05").date(),
             pd.Timestamp("2030-01-01").date()],
            dtype="object"),
    })
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"dt": pa.array(df["dt"], type=pa.date32())}), d)

    got = profile_table(rd.read_parquet(d), columns=["dt"], n_partitions=2)
    con = duckdb.connect()
    exp = con.execute(
        f"select count(*) n, count(*) - count(dt) n_null, "
        f"count(distinct dt) n_distinct, "
        f"cast(min(dt) as varchar) min_str, "
        f"cast(max(dt) as varchar) max_str from '{d}'").df()
    r = got.iloc[0]
    assert (int(r["n"]), int(r["n_null"]), int(r["n_distinct"])) == (
        int(exp.loc[0, "n"]), int(exp.loc[0, "n_null"]),
        int(exp.loc[0, "n_distinct"]))
    assert r["min_str"] == exp.loc[0, "min_str"] == "1999-12-31"
    assert r["max_str"] == exp.loc[0, "max_str"] == "2030-01-01"


def test_profile_table_decimal_rejected_accurately(ray_session, tmp_path):
    """Decimal columns are still rejected, but the error names the
    ACTUAL dtype family — no more 'nested/binary' for a scalar decimal
    (ADVICE r3 low)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.stages.validate import profile_table

    d = str(tmp_path / "t.parquet")
    from decimal import Decimal
    pq.write_table(pa.table({
        "amt": pa.array([Decimal("1.50"), Decimal("2.25")],
                        type=pa.decimal128(10, 2))}), d)
    with pytest.raises(ValueError, match=r"amt.*decimal"):
        profile_table(rd.read_parquet(d), columns=["amt"], n_partitions=2)


def test_minhash_estimate_verify(ray_session):
    """The verify='estimate' scale path: on a planted-mutant corpus it
    recovers EXACTLY the exact path's pair set, the jaccard_est column
    stays within estimator noise of the true shingle Jaccard
    (std ~ sqrt(J(1-J)/64) — bound at 4 sigma), signatures — not texts —
    ride the attach exchanges, and a bogus mode fails loud."""
    import ray.data as rd

    from ocr_ray.stages.dedup import minhash_dedup_pairs

    rng = np.random.default_rng(3)
    texts, ids = [], []
    for i in range(400):
        toks = [f"w{v:05d}" for v in rng.integers(0, 30_000, 80)]
        texts.append(" ".join(toks))
        ids.append(2 * i)
        if i % 5 == 0:  # planted near-dup: one token changed
            toks2 = list(toks)
            toks2[40] = "zz"
            texts.append(" ".join(toks2))
            ids.append(2 * i + 1)
    df = pd.DataFrame({"doc_id": np.array(ids, dtype="int64"),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(8).materialize()

    kw = dict(n_perm=64, n_bands=16, shingle_k=3, threshold=0.8)
    exact = minhash_dedup_pairs(ds, **kw).to_pandas()
    est = minhash_dedup_pairs(ds, verify="estimate", **kw).to_pandas()

    assert len(exact) == 80  # every planted mutant, nothing else
    assert (set(zip(est["left_id"], est["right_id"]))
            == set(zip(exact["left_id"], exact["right_id"])))
    m = exact.merge(est, on=["left_id", "right_id"])
    err = (m["jaccard_est"] - m["jaccard"]).abs()
    sigma = np.sqrt(m["jaccard"] * (1 - m["jaccard"]) / 64)
    assert (err <= 4 * sigma + 1e-9).all(), float(err.max())

    with pytest.raises(ValueError, match="estimate"):
        minhash_dedup_pairs(ds, verify="bogus", **kw)


def test_multimodal_real_decode_branch(ray_session):
    """VERDICT r3 task #7: the real-codec branch is a working
    import-guarded path, not a dead NotImplementedError.  Where PIL is
    absent (this sandbox) both classes refuse real_decode loudly and the
    stub contract holds; where PIL exists the same pipeline decodes a
    real PNG end-to-end with true dimensions."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.stages.multimodal import (DECODERS_AVAILABLE,
                                           DecodeImageStub, ResizeImageStub)

    # the stub contract is identical regardless of codec availability
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b"notanimage"], pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(DecodeImageStub, batch_format="pyarrow",
                        batch_size=1, concurrency=1).to_pandas())
    assert {"image_meta", "content_hash", "features"} <= set(out.columns)
    assert len(out["features"].iloc[0]) == 8

    if not DECODERS_AVAILABLE:
        # codec="pil" keeps the loud refusal where PIL is absent;
        # real_decode=True now auto-falls-back to the pure-python BMP
        # codec (exercised by tests/test_imagecodec.py)
        with pytest.raises(NotImplementedError, match="PIL"):
            DecodeImageStub(real_decode=True, codec="pil")
        with pytest.raises(NotImplementedError, match="PIL"):
            ResizeImageStub(real_decode=True, codec="pil")
        return

    # real branch (runs only where PIL exists): a genuine 100x40 PNG
    import io

    from PIL import Image  # pragma: no cover - absent in the sandbox

    buf = io.BytesIO()
    Image.new("RGB", (100, 40), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([png], pa.binary())})
    dec = (rd.from_arrow(t)
           .map_batches(DecodeImageStub, batch_format="pyarrow",
                        batch_size=1, concurrency=1,
                        fn_constructor_kwargs={"real_decode": True})
           .to_pandas())
    meta = dec["image_meta"].iloc[0]
    assert (meta["width"], meta["height"]) == (100, 40)
    assert abs(sum(dec["features"].iloc[0]) - 1.0) < 1e-5  # histogram sums to 1
    rs = (rd.from_arrow(t)
          .map_batches(ResizeImageStub, batch_format="pyarrow",
                       batch_size=1, concurrency=1,
                       fn_constructor_kwargs={"max_dim": 50,
                                              "real_decode": True})
          .to_pandas())
    assert (rs["width"].iloc[0], rs["scaled"].iloc[0]) == (50, True)
    assert Image.open(io.BytesIO(rs["payload"].iloc[0])).width == 50


def test_exchange_budget_clamp_realism(ray_session, monkeypatch):
    """VERDICT r3 task #4: force OCR_RAY_EXCHANGE_BUDGET_MB so low that
    auto-sized partition counts hit the 256 clamp on REAL pipelines (the
    flagship conv assembly + the exchange-heavy events_latest), assert a
    loud actionable RuntimeWarning fires, and assert results are
    byte-identical to the default-budget run."""
    import warnings as _w

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()

    def run(name):
        out = qs[name](sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        keys = [c for c in ("user_id", "conv_id") if c in out.columns]
        return out.sort_values(keys).reset_index(drop=True)

    base_latest = run("events_latest")
    base_convs = run("transcripts_convs")

    monkeypatch.setenv("OCR_RAY_EXCHANGE_BUDGET_MB", "0.00001")
    with pytest.warns(RuntimeWarning, match="clamps at 256"):
        clamped_latest = run("events_latest")
    with _w.catch_warnings():
        _w.simplefilter("ignore")  # convs re-fires the same warning
        clamped_convs = run("transcripts_convs")

    pd.testing.assert_frame_equal(base_latest, clamped_latest)
    pd.testing.assert_frame_equal(base_convs, clamped_convs)


def _latest(ds, **kw):
    from ocr_ray.api import latest_per_key

    out = latest_per_key(ds, "k", ["ver"], **kw).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_latest_per_key_tie_guard(ray_session):
    """VERDICT r3 task #3: a winner tied on the full (key, *order_cols)
    tuple RAISES under every partitioning (co-batched ties included —
    the partial forwards all batch-max ties to the exchange instead of
    folding them); a tie that loses to a strictly greater tuple never
    raises and resolves identically across 10 partitionings."""
    import ray.data as rd

    # key 1: tied winner (ver 5 twice). key 2: clean.
    winner_tied = pd.DataFrame({
        "k": np.array([1, 1, 1, 2, 2], dtype="int64"),
        "ver": np.array([3, 5, 5, 1, 2], dtype="int64"),
        "payload": ["a", "b", "c", "d", "e"],
    })
    # key 1: ver 5 twice but ver 7 wins outright. key 2: clean.
    loser_tied = pd.DataFrame({
        "k": np.array([1, 1, 1, 1, 2], dtype="int64"),
        "ver": np.array([5, 5, 7, 3, 2], dtype="int64"),
        "payload": ["a", "b", "WIN", "c", "d"],
    })

    for n_parts in range(1, 11):
        ds = rd.from_pandas(winner_tied).repartition(n_parts)
        with pytest.raises(Exception, match="tied on ALL"):
            _latest(ds)

        ds = rd.from_pandas(loser_tied).repartition(n_parts)
        got = _latest(ds)
        assert got["payload"].tolist() == ["WIN", "d"]
        assert got["ver"].tolist() == [7, 2]

    # on_tie='allow' restores the documented arrival-order behavior
    got = _latest(rd.from_pandas(winner_tied).repartition(3),
                  on_tie="allow")
    assert got.loc[got["k"] == 1, "ver"].iloc[0] == 5  # SOME ver-5 row
    with pytest.raises(ValueError, match="on_tie"):
        _latest(rd.from_pandas(winner_tied), on_tie="bogus")


def test_apply_upserts_duplicate_change_rows_raise(ray_session, tmp_path):
    """Two change rows for one key carrying the same version are an
    ambiguous CDC stream — apply_upserts now fails loud instead of
    picking an arrival-order winner (VERDICT r3 task #3)."""
    import ray.data as rd

    from ocr_ray.api import apply_upserts

    base = rd.from_pandas(pd.DataFrame({
        "k": np.array([1], dtype="int64"),
        "ver": np.array([1], dtype="int64"), "v": ["base"]}))
    changes = rd.from_pandas(pd.DataFrame({
        "k": np.array([1, 1], dtype="int64"),
        "ver": np.array([2, 2], dtype="int64"), "v": ["c1", "c2"]}))
    with pytest.raises(Exception, match="tied on ALL"):
        apply_upserts(base, changes, key="k", order_cols=["ver"],
                      out_dir=str(tmp_path / "out"))


def test_events_props_stats_all_nan_batch_slice(ray_session, tmp_path):
    """A parquet fragment whose every props payload is malformed for a
    type must not poison the global min/max: the +/-2^62 sentinels lose
    to any real value in the cross-batch merge, and an all-NULL type
    COALESCEs to 0 like the oracle (VERDICT r3 task #6)."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_props_stats

    d = str(tmp_path)
    ev_dir = os.path.join(d, "events.parquet")
    os.makedirs(ev_dir)
    # fragment 1: type 'click' all-malformed (its batch partial carries
    # min=+2^62 / max=-2^62 sentinels), type 'broken' all-malformed too
    f1 = pd.DataFrame({
        "event_id": np.arange(100, dtype="int64"),
        "event_type": ["click"] * 50 + ["broken"] * 50,
        "props": ['{"other": 1}'] * 100,
    })
    # fragment 2: type 'click' with real values 5..54 — the global min
    # (5) and max (54) must survive the merge with fragment 1's sentinels
    f2 = pd.DataFrame({
        "event_id": np.arange(100, 200, dtype="int64"),
        "event_type": ["click"] * 50 + ["view"] * 50,
        "props": ([f'{{"k": {v}}}' for v in range(5, 55)]
                  + [f'{{"k": {v}}}' for v in range(1000, 1050)]),
    })
    f1.to_parquet(os.path.join(ev_dir, "part-0.parquet"))
    f2.to_parquet(os.path.join(ev_dir, "part-1.parquet"))

    got = (q_events_props_stats(d).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{ev_dir}/*.parquet'")
    exp = (con.execute(ORACLE_SQL["events_props_stats"]).df()
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("event_type")
    assert r.loc["click", "min_k"] == 5 and r.loc["click", "max_k"] == 54
    assert r.loc["broken", "min_k"] == 0 and r.loc["broken", "max_k"] == 0
    assert r.loc["view", "max_k"] == 1049
