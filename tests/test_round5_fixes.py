"""Round-5 fixes: the round-4 advisory findings (NaN tie-winner in
latest_per_key, unsatisfiable exchange memory requests, null-text token
corruption in deterministic_pack) and the VERDICT tasks (unbounded
postings guard, Arrow ports of the SFT/conv-text exchange kernels)."""

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------- advisory 1
class TestLatestPerKeyNaNWinner:
    def test_nan_order_winner_agrees_across_modes(self):
        """Sorted-max tuple contains a null -> the NaN row IS the winner
        (sort_values puts NaN last), and on_tie='raise' must elect the
        same winner as on_tie='allow' — transform('last') skipped NaN and
        silently elected the max non-null row instead."""
        from ocr_ray.api import latest_per_key

        df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                           "v": [1.0, 2.0, np.nan, 5.0],
                           "payload": ["x", "y", "z", "w"]})
        winners = {}
        for tie in ("allow", "raise"):
            out = (latest_per_key(rd.from_pandas(df), "k", ["v"], on_tie=tie)
                   .to_pandas().sort_values("k").reset_index(drop=True))
            winners[tie] = list(out["payload"])
        assert winners["allow"] == winners["raise"] == ["z", "w"]

    def test_nan_nan_tie_still_raises(self):
        """Two rows tying on an all-NaN order tuple are a GENUINE tie
        (NaN == NaN for tie detection, like SQL DISTINCT) -> raise."""
        from ocr_ray.api import latest_per_key

        df = pd.DataFrame({"k": ["a", "a"], "v": [np.nan, np.nan],
                           "payload": ["x", "y"]})
        with pytest.raises(Exception, match="tied"):
            latest_per_key(rd.from_pandas(df), "k", ["v"],
                           on_tie="raise").to_pandas()

    def test_multicol_nan_in_secondary_order(self):
        """(1.0, NaN) sorts above (1.0, 3.0) -> winner has the NaN
        secondary; both modes agree and no spurious raise."""
        from ocr_ray.api import latest_per_key

        df = pd.DataFrame({"k": ["a"] * 3, "v1": [1.0, 1.0, 0.0],
                           "v2": [np.nan, 3.0, 9.0], "p": list("xyz")})
        for tie in ("allow", "raise"):
            out = latest_per_key(rd.from_pandas(df), "k", ["v1", "v2"],
                                 on_tie=tie).to_pandas()
            assert list(out["p"]) == ["x"]

    def test_losing_tie_does_not_raise(self):
        from ocr_ray.api import latest_per_key

        df = pd.DataFrame({"k": ["a"] * 3, "v": [1.0, 1.0, 2.0],
                           "payload": ["x", "y", "z"]})
        out = latest_per_key(rd.from_pandas(df), "k", ["v"],
                             on_tie="raise").to_pandas()
        assert list(out["payload"]) == ["z"]


# ---------------------------------------------------------------- advisory 2
class TestExchangeTaskMemoryNodeClamp:
    def test_request_clamped_to_half_node_memory(self, ray_session):
        """An explicit tiny n_partitions over a huge estimated input must
        NOT produce an unsatisfiable memory request (the task would pend
        forever) — clamp to half the cluster memory resource + warn."""
        import ray

        from ocr_ray.stages.join import exchange_task_memory

        mem_total = ray.cluster_resources().get("memory", 0)
        assert mem_total > 0
        huge = int(mem_total * 4)  # 3x per-partition >> node memory
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            req = exchange_task_memory(huge, 2)
        assert req is not None and req <= mem_total // 2
        assert any("clamped" in str(x.message) for x in w
                   if issubclass(x.category, RuntimeWarning))

    def test_normal_request_unclamped_and_silent(self, ray_session):
        from ocr_ray.stages.join import exchange_task_memory

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            req = exchange_task_memory(1 << 30, 8)  # 1 GB over 8 parts
        assert req is not None
        assert not any("clamped" in str(x.message) for x in w)


# ---------------------------------------------------------------- advisory 3
class TestPackNullTextFailsLoud:
    def test_null_text_raises(self):
        from ocr_ray.stages.shuffle import deterministic_pack

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["one two", None, "three"],
        }))
        with pytest.raises(Exception, match="null"):
            deterministic_pack(ds, budget=4).to_pandas()

    def test_null_id_raises_in_shuffle_and_pack(self):
        """Null doc_id has the same silent-INT64_MIN hazard as null text
        (hash/position poisoning instead of bin corruption) — both
        stages fail loud via the shared _col_i64 guard."""
        from ocr_ray.stages.shuffle import (deterministic_pack,
                                            deterministic_shuffle)

        df = pd.DataFrame({"doc_id": pd.array([1, None, 3],
                                              dtype="Int64"),
                           "text": ["a", "b", "c"]})
        with pytest.raises(Exception, match="null"):
            deterministic_shuffle(rd.from_pandas(df)).to_pandas()
        with pytest.raises(Exception, match="null"):
            deterministic_pack(rd.from_pandas(df), budget=4).to_pandas()

    def test_null_id_or_text_raises_in_dedup(self):
        """Same hazard class in the dedup family: null ids ride float
        NaN into the band tables and cast to INT64_MIN in the pair
        kernels; all four hasher stages fail loud instead."""
        from ocr_ray.stages.dedup import minhash_dedup_pairs, \
            simhash_dedup_pairs

        bad_id = pd.DataFrame({"doc_id": pd.array([1, None], dtype="Int64"),
                               "text": ["a b c", "a b d"]})
        bad_txt = pd.DataFrame({"doc_id": [1, 2],
                                "text": ["a b c", None]})
        for df in (bad_id, bad_txt):
            with pytest.raises(Exception, match="null"):
                minhash_dedup_pairs(rd.from_pandas(df), n_perm=8,
                                    n_bands=4, threshold=0.5).to_pandas()
            with pytest.raises(Exception, match="null"):
                simhash_dedup_pairs(rd.from_pandas(df)).to_pandas()

    def test_non_null_unchanged(self):
        from ocr_ray.stages.shuffle import deterministic_pack

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["one two", "", "three four five"],
        }))
        out = deterministic_pack(ds, budget=4).to_pandas()
        assert len(out) == 3 and (out["n_tokens"] >= 0).all()
        assert int(out["n_tokens"].sum()) == 5


# ------------------------------------------------------------- verdict task 2
class TestPostingsGuard:
    def test_build_postings_without_max_df_warns(self):
        from ocr_ray.stages.index import build_postings

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2], "text": ["a b", "b c"]}))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            build_postings(ds)
        assert any("max_df" in str(x.message) for x in w
                   if issubclass(x.category, RuntimeWarning))

    def test_warn_unbounded_false_acknowledges(self):
        """Internal callers that disable the gate deliberately (the
        oracle query surface) acknowledge instead of warning."""
        from ocr_ray.stages.index import build_postings

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2], "text": ["a b", "b c"]}))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            build_postings(ds, warn_unbounded=False)
        assert not any("max_df" in str(x.message) for x in w)

    def test_lookup_fetch_cap_raises_before_take_all(self, monkeypatch):
        """The driver-fetch guard sizes the postings BEFORE pulling them:
        past the cap it raises (a post-hoc warn would fire only after the
        OOM it exists to prevent)."""
        import ocr_ray.stages.index as idx

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["apple pie", "apple tart", "apple crumble"]}))
        post = idx.build_postings(ds, warn_unbounded=False).materialize()
        monkeypatch.setattr(idx, "LOOKUP_FETCH_CAP_BYTES", 2)
        with pytest.raises(RuntimeError, match="near-stop-word"):
            idx.conjunctive_lookup(post, ["apple"])
        monkeypatch.setattr(idx, "LOOKUP_FETCH_CAP_BYTES", 256 << 20)
        assert idx.conjunctive_lookup(post, ["apple"]) == [1, 2, 3]

    def test_build_postings_with_max_df_silent_and_lookup_works(self):
        from ocr_ray.stages.index import build_postings, conjunctive_lookup

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["apple pie", "apple tart", "banana split"]}))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            post = build_postings(ds, max_df=2 * 3).materialize()
        assert not any("max_df is None" in str(x.message) for x in w)
        assert conjunctive_lookup(post, ["apple"]) == [1, 2]


# ------------------------------------------------------------- verdict task 3
def _naive_examples(df, gate=False, drop_empty=False):
    """Independent per-row reference for the Arrow SFT kernel."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    rows = []
    for cid, g in df.groupby("conv_id"):
        if gate:
            d = [r for r in g["role"] if r in ("user", "assistant")]
            if any(a == b for a, b in zip(d, d[1:])):
                continue
        fmts = list("[" + g["role"] + "] " + g["clean_text"])
        for i, (_, r) in enumerate(g.iterrows()):
            if r["role"] != "assistant":
                continue
            if drop_empty and r["clean_text"] == "":
                continue
            rows.append({"conv_id": cid, "turn_idx": int(r["turn_idx"]),
                         "prompt": "\n".join(fmts[max(0, i - 3):i]),
                         "completion": r["clean_text"]})
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "prompt",
                                       "completion"])


_TURNS = pd.DataFrame({
    "conv_id": ["conv-00000002"] * 5 + ["conv-00000007"] * 3
               + ["conv-00000011"] * 5,
    "turn_idx": [0, 1, 2, 3, 4, 0, 1, 2, 0, 1, 2, 3, 4],
    "role": ["system", "user", "assistant", "user", "assistant",
             "user", "assistant", "assistant",     # alternation break
             # tool turn does NOT break user/assistant alternation
             "user", "assistant", "tool", "user", "assistant"],
    "clean_text": ["sys prompt", "hi there", "hello", "more?", "",
                   "q", "a1", "a2",
                   "ask", "ans one", "tool out", "again", "ans two"],
})


class TestArrowSftKernels:
    def test_examples_pa_matches_naive(self):
        import __ray_entry__ as entry

        t = pa.Table.from_pandas(_TURNS.sample(frac=1, random_state=3),
                                 preserve_index=False)
        got = entry._examples_pa(t).to_pandas()
        want = _naive_examples(_TURNS)
        pd.testing.assert_frame_equal(
            got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
            want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))

    def test_examples_pa_gate_and_drop_empty(self):
        import __ray_entry__ as entry

        t = pa.Table.from_pandas(_TURNS, preserve_index=False)
        got = entry._examples_pa(t, gate=True, drop_empty=True).to_pandas()
        want = _naive_examples(_TURNS, gate=True, drop_empty=True)
        # conv-...07 has an assistant-assistant repeat -> dropped whole;
        # conv-...02's empty-completion turn 4 dropped
        assert set(got["conv_id"]) == {"conv-00000002", "conv-00000011"}
        pd.testing.assert_frame_equal(
            got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
            want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))

    def test_examples_pa_matches_pandas_prompt_window(self):
        """The Arrow kernel and the retained pandas _prompt_window path
        agree turn-for-turn (the pandas path stays as the property-test
        reference)."""
        import __ray_entry__ as entry

        g = _TURNS.sort_values(["conv_id", "turn_idx"],
                               kind="stable").reset_index(drop=True)
        prompt = entry._prompt_window(g)
        keep = g["role"] == "assistant"
        want = pd.DataFrame({
            "conv_id": g["conv_id"][keep],
            "turn_idx": g["turn_idx"][keep].astype("int64"),
            "prompt": prompt[keep],
            "completion": g["clean_text"][keep],
        }).reset_index(drop=True)
        got = (entry._examples_pa(
            pa.Table.from_pandas(_TURNS, preserve_index=False))
            .to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_examples_pa_empty_and_single_turn(self):
        import __ray_entry__ as entry

        empty = entry._examples_pa(
            pa.Table.from_pandas(_TURNS.iloc[:0], preserve_index=False))
        assert empty.num_rows == 0
        assert empty.schema.names == ["conv_id", "turn_idx", "prompt",
                                      "completion"]
        one = pa.table({"conv_id": ["conv-00000001"], "turn_idx": [0],
                        "role": ["assistant"], "clean_text": ["solo"]})
        got = entry._examples_pa(one).to_pandas()
        # first turn: every prompt part null -> "" (the pyarrow skip-join
        # would DROP an all-null row; fill_null(p1) pins the length)
        assert list(got["prompt"]) == [""]
        assert list(got["completion"]) == ["solo"]

    def test_conv_texts_pa_matches_pandas_replica(self):
        import __ray_entry__ as entry

        t = pa.Table.from_pandas(_TURNS.sample(frac=1, random_state=5),
                                 preserve_index=False)
        got = (entry._conv_texts_pa(t, with_mutants=True, id_name="cid")
               .to_pandas().sort_values("cid").reset_index(drop=True))
        g = _TURNS.sort_values(["conv_id", "turn_idx"], kind="stable").copy()
        g["_fmt"] = "[" + g["role"] + "] " + g["clean_text"]
        base = g.groupby("conv_id")["_fmt"].agg("\n\n".join)
        last = g.groupby("conv_id")["turn_idx"].transform("max")
        mtxt = g[g["turn_idx"] != last].groupby("conv_id")["_fmt"].agg(
            "\n\n".join)
        want = pd.concat([
            pd.DataFrame({"cid": base.index.str[5:].astype("int64"),
                          "text": base.to_numpy()}),
            pd.DataFrame({"cid": mtxt.index.str[5:].astype("int64")
                          + 10_000_000, "text": mtxt.to_numpy()}),
        ]).sort_values("cid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_conv_texts_pa_format_drift_raises(self):
        import __ray_entry__ as entry

        bad = pa.table({"conv_id": ["session-1"], "turn_idx": [0],
                        "role": ["user"], "clean_text": ["x"]})
        with pytest.raises(ValueError, match="drifted"):
            entry._conv_texts_pa(bad)

    def test_arrow_kernels_partitioning_invariant(self, ray_session,
                                                  monkeypatch):
        """The Arrow exchange kernels must produce byte-identical output
        under ANY partition count: force the exchange auto-sizer into
        maximal (256-clamped) partitioning and compare the two SFT
        composites plus the convdedup pair set against the default-budget
        run — the co-location assumption (_examples_pa / _conv_texts_pa
        see every turn of a conversation) is what the key hash must
        deliver regardless of partition count."""
        import warnings as _w

        import __ray_entry__ as e

        sf = "/root/testdata/sf0.001"
        qs = e.queries()

        def run(name, keys):
            out = qs[name](sf)
            out = out.to_pandas() if hasattr(out, "to_pandas") else out
            return out.sort_values(keys).reset_index(drop=True)

        base_sft = run("transcripts_sft", ["conv_id", "turn_idx"])
        base_psft = run("pipeline_sft", ["conv_id", "turn_idx"])
        base_dd = run("transcripts_convdedup", ["left_id", "right_id"])

        monkeypatch.setenv("OCR_RAY_EXCHANGE_BUDGET_MB", "0.00001")
        with _w.catch_warnings():
            _w.simplefilter("ignore")  # the 256-clamp warning re-fires
            pd.testing.assert_frame_equal(
                base_sft, run("transcripts_sft", ["conv_id", "turn_idx"]))
            pd.testing.assert_frame_equal(
                base_psft, run("pipeline_sft", ["conv_id", "turn_idx"]))
            pd.testing.assert_frame_equal(
                base_dd, run("transcripts_convdedup",
                             ["left_id", "right_id"]))

    def test_conv_turn_key_pa_matches_pandas(self):
        import __ray_entry__ as entry

        df = pd.DataFrame({"conv_id": ["c1", "c2"], "turn_idx": [3, 41]})
        got = entry._conv_turn_key_pa(
            pa.Table.from_pandas(df, preserve_index=False)).to_pylist()
        assert got == list(entry._conv_turn_key(df))
