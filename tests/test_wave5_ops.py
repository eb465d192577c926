"""Round-3 wave-5 operators: exact heavy hitters (MG candidates + verify)
and deterministic weighted priority sampling."""

import numpy as np
import pandas as pd


def test_heavy_hitters_exact_under_any_partitioning(ray_session):
    """The MG-candidate + verify plan must return EXACTLY the terms with
    count*k > N, regardless of how the corpus is partitioned — including
    a skewed layout where one block holds most of a hitter's mass."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    # two planted heavy hitters + a long tail
    texts = (["alpha " * 40] * 30 + ["beta " * 25] * 20
             + [" ".join(rng.choice(vocab, size=30)) for _ in range(200)])
    df = pd.DataFrame({"text": texts})

    # exact ground truth
    from collections import Counter
    import re

    c: "Counter[str]" = Counter()
    for t in texts:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    total = sum(c.values())
    k = 32
    want = sorted([t for t, n in c.items() if n * k > total])

    for nparts in (1, 4, 16):
        ds = rd.from_pandas(df).repartition(nparts)
        got = heavy_hitters(ds, k=k, n_partitions=4)
        assert sorted(got["term"]) == want
        assert dict(zip(got["term"], got["n"])) == {t: c[t] for t in want}


def test_weighted_sample_deterministic_and_length_biased(ray_session):
    """Priority sample must be identical across parallelism, and longer
    documents must be overrepresented relative to their count share."""
    from ocr_ray.pipelines.queries import q_doc_sample_weighted

    a = q_doc_sample_weighted("/root/testdata/sf0.001")
    b = q_doc_sample_weighted("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert a["priority"].is_monotonic_increasing

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "n_chars"])
    sampled = docs[docs["doc_id"].isin(a["doc_id"])]
    assert sampled["n_chars"].mean() > docs["n_chars"].mean()


def test_skew_join_mega_key_exact_and_balanced(ray_session):
    """skew_join must (a) return exactly the pandas merge under a 40%%
    single-key skew, and (b) spread the mega key's rows across MANY merge
    partitions instead of serializing one."""
    import ray.data as rd

    from ocr_ray.stages.join import skew_join

    rng = np.random.default_rng(3)
    n = 20_000
    keys = np.where(rng.random(n) < 0.4, 7,
                    rng.integers(100, 400, size=n)).astype("int64")
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                          "r": np.arange(500, dtype="int64") * 10})

    lds = rd.from_pandas(left).repartition(8)
    rds = rd.from_pandas(right).repartition(2)
    out = skew_join(lds, rds, on="k", n_partitions=8, k=16)

    # (b) no merge partition holds more than ~30% of the output rows
    # (round-robin scatter: expect ~1/8 each; a plain hash exchange would
    # put the mega key's 40% of rows in ONE partition)
    import ray

    refs = [ref for b in out.iter_internal_ref_bundles()
            for ref, _meta in b.blocks]
    sizes = [blk.num_rows for blk in ray.get(refs)]
    assert max(sizes) < 0.3 * sum(sizes), sizes

    got = out.to_pandas().sort_values(["v"]).reset_index(drop=True)
    want = (left.merge(right, on="k", how="inner")
            .sort_values(["v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "v", "r"]], want[["k", "v", "r"]])


def test_skew_join_left_how_and_no_hot_fallback(ray_session):
    """how='left' keeps unmatched rows; a uniform key distribution takes
    the plain exchange_join path (no hot keys) and still matches."""
    import ray.data as rd

    from ocr_ray.stages.join import skew_join

    left = pd.DataFrame({"k": np.arange(1000, dtype="int64") % 97,
                         "v": np.arange(1000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(50, dtype="int64"),
                          "r": np.arange(50, dtype="int64")})
    got = skew_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right), on="k",
                    n_partitions=4, k=8, how="left").to_pandas()
    want = left.merge(right, on="k", how="left")
    got = got.sort_values("v").reset_index(drop=True)
    want = want.sort_values("v").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])
    assert got["r"].isna().sum() == want["r"].isna().sum()


def test_bloom_pruned_join_exact_and_prunes(ray_session):
    """bloom_pruned_join must equal the plain exchange join AND actually
    drop (nearly all) non-matching left rows before the exchange."""
    import ray.data as rd

    from ocr_ray.stages.join import (_jbloom_positions, bloom_pruned_join,
                                     exchange_join)

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 100_000, size=50_000)
                         .astype("int64"),
                         "v": np.arange(50_000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(0, 500, dtype="int64"),
                          "r": np.arange(500, dtype="int64")})

    got = bloom_pruned_join(rd.from_pandas(left).repartition(8),
                            rd.from_pandas(right), on="k",
                            n_partitions=4).to_pandas()
    want = left.merge(right, on="k", how="inner")
    got = got.sort_values(["v"]).reset_index(drop=True)
    want = want.sort_values(["v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "r"]], want[["k", "v", "r"]])

    # the mask itself: selectivity ~0.5%, 4 probes into 2^20 bits ->
    # false-positive rate well under 1%; check the prune keeps < 5%
    pos = np.unique(_jbloom_positions(right["k"].to_numpy(), 20))
    mask = np.zeros(1 << 20, dtype=bool)
    mask[pos] = True
    kept = mask[_jbloom_positions(left["k"].to_numpy(), 20)].all(axis=1)
    assert kept.sum() < 0.05 * len(left)
    assert kept.sum() >= len(want)  # no true match ever pruned


def test_bloom_pruned_join_semi(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import bloom_pruned_join

    left = pd.DataFrame({"k": np.arange(1000, dtype="int64"),
                         "v": np.arange(1000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(0, 1000, 50, dtype="int64")})
    got = bloom_pruned_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right), on="k",
                            n_partitions=4, how="semi").to_pandas()
    assert sorted(got["k"]) == list(range(0, 1000, 50))


def test_api_facades_wave6(ray_session):
    """Thin api facades delegate to the tested operators."""
    import ray.data as rd

    import ocr_ray.api as ocr

    left = pd.DataFrame({"k": np.arange(200, dtype="int64") % 5,
                         "v": np.arange(200, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(5, dtype="int64"),
                          "r": np.arange(5, dtype="int64")})
    a = ocr.join_skewed(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", n_partitions=2).to_pandas()
    b = ocr.join_selective(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", n_partitions=2).to_pandas()
    want = left.merge(right, on="k")
    assert len(a) == len(want) and len(b) == len(want)

    docs = rd.from_pandas(pd.DataFrame({"text": ["big big big small"] * 20}))
    hh = ocr.top_terms_exact(docs, k=4)
    assert list(hh["term"]) == ["big"]


def test_global_topk_equals_full_sort(ray_session):
    """global_topk must equal sort().limit() for any k, both directions,
    including k larger than the input."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import global_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"a": rng.integers(0, 50, size=5000).astype("int64"),
                       "id": np.arange(5000, dtype="int64")})
    ds = rd.from_pandas(df).repartition(16)
    for k in (1, 17, 10_000):
        got = global_topk(ds, ["a", "id"], k, descending=[True, False])
        want = (df.sort_values(["a", "id"], ascending=[False, True])
                .head(k).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
    got = global_topk(ds, ["a", "id"], 5, descending=False)
    want = df.sort_values(["a", "id"]).head(5).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bloom_pruned_join_string_keys(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import bloom_pruned_join

    left = pd.DataFrame({"k": [f"u{i % 40}" for i in range(400)],
                         "v": np.arange(400, dtype="int64")})
    right = pd.DataFrame({"k": ["u3", "u7", "u11"], "r": [1, 2, 3]})
    got = bloom_pruned_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right), on="k",
                            n_partitions=4).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    assert sorted(got["v"]) == sorted(want["v"])


def test_skew_join_no_duplicate_on_bundling_boundary(ray_session):
    """Regression: when every block crosses the bundling threshold, the
    split iterator must NOT re-yield the last block (it used to, adding
    one block's rows twice — caught by the --skew-join bench assert)."""
    import ray.data as rd

    from ocr_ray.stages.join import skew_join

    n = 70_000  # 2 blocks x 35k, each >= the 32768 bundling threshold
    rng = np.random.default_rng(1)
    keys = np.where(rng.random(n) < 0.5, 1,
                    rng.integers(10, 500, size=n)).astype("int64")
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                          "r": np.arange(500, dtype="int64")})
    out = skew_join(rd.from_pandas(left).repartition(2),
                    rd.from_pandas(right), on="k",
                    n_partitions=8, k=16)
    assert out.count() == n


def test_dpo_pairs_match_direct_replica(ray_session):
    """transcripts_dpo_pairs (rows-only in the driver) value-checked here:
    the distributed pair builder must equal a direct per-row replica over
    the same payloads, and pairs must be strictly score-ordered."""
    import os

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry._q_transcripts_dpo_pairs(sf).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    from ocr_ray.functions.scoring import score_ocr_result
    from ocr_ray.stages.extract import ENGINES

    tdir = entry._transcripts_for(sf)
    src = pd.read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])
    rows = []
    for conv_id, turn_idx, payload in src.itertuples(index=False):
        outs = []
        for n in ("tagstrip", "density", "domtree"):
            try:
                t = ENGINES[n](payload)
            except Exception:
                t = ""
            outs.append((n, t, score_ocr_result(t)))
        best = max(outs, key=lambda o: o[2])
        worst = min(outs, key=lambda o: o[2])
        if best[1] == worst[1]:
            continue
        rows.append((conv_id, int(turn_idx), best[0], worst[0],
                     best[1], worst[1],
                     int(np.floor((best[2] - worst[2]) * 1e6 + 0.5))))
    want = pd.DataFrame(rows, columns=list(got.columns))
    want["turn_idx"] = want["turn_idx"].astype("int64")
    want["margin_ppm"] = want["margin_ppm"].astype("int64")
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)
    assert (got["margin_ppm"] > 0).all()


def test_heavy_hitters_uniform_corpus_returns_empty(ray_session):
    """Regression (self-review): no term frequent enough -> typed empty,
    not a KeyError on the column-dropping all-empty to_pandas()."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import heavy_hitters

    df = pd.DataFrame({"text": [f"unique{i} token{i * 7}" for i in range(50)]})
    got = heavy_hitters(rd.from_pandas(df).repartition(4), k=8)
    assert list(got.columns) == ["term", "n"]
    assert len(got) == 0


def test_bloom_pruned_join_all_empty_right(ray_session):
    """Regression (self-review): an all-empty right side must yield the
    typed-empty join result, matching exchange_join's contract."""
    import ray.data as rd

    from ocr_ray.stages.join import bloom_pruned_join

    left = pd.DataFrame({"k": np.arange(100, dtype="int64"),
                         "v": np.arange(100, dtype="int64")})
    right = (rd.from_pandas(pd.DataFrame({"k": np.arange(5, dtype="int64")}))
             .filter(lambda r: r["k"] < 0))
    out = bloom_pruned_join(rd.from_pandas(left).repartition(4), right,
                            on="k", n_partitions=4)
    assert out.count() == 0


def test_dedup_pairs_exact_string_ids(ray_session):
    """Regression (self-review): the exact-dedup facade must keep working
    for non-integer id columns (string/UUID ids)."""
    import ray.data as rd

    import ocr_ray.api as ocr

    df = pd.DataFrame({"doc_id": [f"u{i:03d}" for i in range(40)],
                       "text": [f"t{i % 10}" for i in range(40)]})
    got = ocr.dedup_pairs(rd.from_pandas(df).repartition(4), method="exact",
                          id_col="doc_id")
    # each of the 10 texts has 4 copies: keeper = lexicographic min id
    assert len(got) == 30
    assert set(got["left_id"]) == {f"u{i:03d}" for i in range(10)}


def test_id_hash32_exact_above_int64_wrap_point():
    """Regression (self-review): (id * SPLIT_MULT) % 2^32 must stay exact
    for ids beyond the int64 wrap point (~3.47e9), where the old bare
    int64 multiply silently wrapped."""
    from ocr_ray.pipelines.queries import SPLIT_MULT, _id_hash32

    ids = np.array([0, 1, 3_470_000_000, 2**32 - 1, 2**32,
                    2**40 + 12345, 2**62], dtype="int64")
    got = _id_hash32(ids)
    want = [(int(i) * SPLIT_MULT) % (2**32) for i in ids]  # exact bigints
    assert list(got) == want
    s = _id_hash32(pd.Series(ids, index=[9, 8, 7, 6, 5, 4, 3]))
    assert list(s) == want and list(s.index) == [9, 8, 7, 6, 5, 4, 3]


def test_value_rank_wide_range_and_negative_values(ray_session):
    """Regression (third review wave): the bucket map must stay monotone
    for 62-bit ranges and vmin<0 (the old integer form wrapped int64)."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import value_rank

    rng = np.random.default_rng(2)
    v = np.concatenate([
        rng.integers(-(2**61), 2**61, size=3000),
        np.array([-(2**61), 2**61 - 1, 0], dtype="int64"),
    ]).astype("int64")
    df = pd.DataFrame({"doc_id": np.arange(len(v), dtype="int64"), "val": v})
    out = value_rank(rd.from_pandas(df).repartition(8), "val",
                     n_buckets=64, n_partitions=4).to_pandas()
    out = out.sort_values("rank").reset_index(drop=True)
    want = df.sort_values(["val", "doc_id"]).reset_index(drop=True)
    assert (out["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (out["rank"].to_numpy() == np.arange(len(v))).all()


def test_simhash_siphash_band_validation(ray_session):
    """Regression (third review wave): scheme='siphash' with an invalid
    band count must fail loudly at the driver, not assert in workers."""
    import pytest
    import ray.data as rd

    from ocr_ray.stages.dedup import simhash_dedup_pairs

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c", "a b c"]}))
    with pytest.raises(ValueError, match="divide 64"):
        simhash_dedup_pairs(docs, scheme="siphash")  # default n_bands=10


def test_lsh_bucket_cap_fails_loudly(monkeypatch):
    """Regression (third review wave): a mega identical-content class must
    raise the bucket cap in the pair kernel, not enumerate quadratic
    pairs (unit-level: the kernel runs inside num_cpus=0 exchange tasks)."""
    import pytest

    import ocr_ray.stages.dedup as dd

    monkeypatch.setattr(dd, "MAX_BUCKET_IDS", 50)
    g = pd.DataFrame({"band_id": np.int64(0), "band_hash": np.int64(1),
                      "doc_id": np.arange(200, dtype="int64")})
    with pytest.raises(ValueError, match="bucket holds"):
        dd._pairs_from_bucket_partition(g, ["band_id", "band_hash"], "doc_id")
    # under the cap: normal enumeration
    small = g.head(10)
    out = dd._pairs_from_bucket_partition(small, ["band_id", "band_hash"],
                                          "doc_id")
    assert len(out) == 45


def test_pagerank_stationary_and_edge_cases(ray_session):
    """Sixth review wave: teleport must be 0.15/N (a single self-loop node
    is stationary at 1e6 ppm; the old 150x constant inflated it 2.35x per
    iteration), empty edges yield an empty table, and zero-out-weight
    sources are skipped instead of KeyError'ing."""
    import ray.data as rd

    from ocr_ray.stages.graph import pagerank

    loop = rd.from_pandas(pd.DataFrame(
        {"src": [1], "dst": [1], "w": [1]}).astype("int64"))
    out = pagerank(loop, iters=3)
    assert list(out["pr_ppm"]) == [1_000_000]

    empty = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"),
         "w": pd.Series(dtype="int64")}))
    assert len(pagerank(empty, iters=1)) == 0

    zero_w = rd.from_pandas(pd.DataFrame(
        {"src": [1, 5], "dst": [2, 7], "w": [1, 0]}).astype("int64"))
    out = pagerank(zero_w, iters=2)  # node 5 has no out mass: no crash
    assert set(out["node"]) == {1, 2, 5, 7}


def test_conjunctive_lookup_edge_cases(ray_session):
    """Sixth review wave: empty term list and non-indexable terms return
    [] instead of IndexError / silently-wrong quoted lookups."""
    import ray.data as rd

    from ocr_ray.stages.index import build_postings, conjunctive_lookup

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype="int64"),
         "text": ["dont stop", "dont go", "stop now", "go dont"]}))
    postings = build_postings(docs).materialize()
    assert conjunctive_lookup(postings, []) == []
    assert conjunctive_lookup(postings, ["don't"]) == []  # not indexable
    assert conjunctive_lookup(postings, ["dont"]) == [0, 1, 3]


def test_vector_stages_accept_empty_batches():
    """Seventh review wave: a zero-row pandas batch (e.g. a fully-filtered
    block) must flow through every vector stage, not die on a (0,) matmul."""
    import numpy as np
    import pandas as pd

    from ocr_ray.stages import similarity as sim

    empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "embedding": pd.Series(dtype="object")})
    q = np.ones(8)
    stages = [
        sim.CosineTopK(q),
        sim.IVFAssign(np.ones((4, 8))),
        sim.RandomProjectionLSH(8),
        sim.SignHashLSH(8),
        sim.MultiTableLSH(8, n_tables=2),
        sim.LSHProbeScore(8, 4, {0, 1}, q / np.linalg.norm(q)),
        sim.QuantizedDot(np.ones(8, dtype=np.int64)),
        sim.RPReducer(dim=8, r_dim=4),
    ]
    for st in stages:
        out = st(empty)
        assert len(out) == 0, type(st).__name__


def test_quantized_search_facade_matches_global_topk(ray_session):
    """Seventh review wave: the facade must use the per-block top-k plan
    and return the same rows as the brute global answer."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray import api
    from ocr_ray.stages.similarity import quantize_int8

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(50, 8))
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(50, dtype="int64"),
         "embedding": list(vecs)})).repartition(4)
    q = rng.normal(size=8)

    got = api.quantized_search(ds, q, k=5)
    assert isinstance(got, pd.DataFrame) and len(got) == 5

    qc = quantize_int8(q[None, :])[0][0]
    dots = quantize_int8(vecs)[0] @ qc
    want = (pd.DataFrame({"vec_id": np.arange(50, dtype="int64"), "dot": dots})
            .sort_values(["dot", "vec_id"], ascending=[False, True],
                         kind="mergesort").head(5).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["dot", "vec_id"]].reset_index(drop=True),
        want[["dot", "vec_id"]])


def test_mixture_resample_large_id_matches_hugeint_hash(ray_session):
    """Seventh review wave: mixture_resample's keep hash must be mod-first
    (exact vs the HUGEINT oracle) — a naive int64 multiply wraps for ids
    above ~3.47e9 and silently flips keep decisions."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.sample import MIX_MULT, PPM, mixture_resample

    big = np.array([2**62, 2**62 + 1, 3_500_000_000, 7, 8, 9], dtype="int64")
    ds = rd.from_pandas(pd.DataFrame({"doc_id": big, "lang": ["en"] * 6}))
    got = mixture_resample(ds, {"en": 1}, group_col="lang").to_pandas()

    # exact Python-int replica of the HUGEINT oracle expression
    want = [i for i in big.tolist()
            if (((i % 2**32) * MIX_MULT) % 2**32) % PPM < PPM]
    assert sorted(got["doc_id"]) == sorted(want)  # rate 100%: all keep
    # and with a fractional rate, decisions equal the oracle expression
    ds2 = rd.from_pandas(pd.DataFrame(
        {"doc_id": big, "lang": ["en", "en", "en", "de", "de", "de"]}))
    got2 = mixture_resample(ds2, {"en": 99, "de": 1}, group_col="lang").to_pandas()
    rates = {"en": 1000000, "de": min(PPM, (3 * PPM // 99) * 1 // 3)}
    want2 = [i for i, lg in zip(big.tolist(), ["en", "en", "en", "de", "de", "de"])
             if (((i % 2**32) * MIX_MULT) % 2**32) % PPM < rates[lg]]
    assert sorted(got2["doc_id"]) == sorted(want2)


def test_value_rank_empty_input(ray_session):
    """Seventh review wave: an all-empty input must yield an empty result,
    not int(nan) in the min/max pass."""
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.shuffle import value_rank

    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}))
    assert value_rank(empty, "v").count() == 0


def test_shuffle_ops_empty_input(ray_session):
    """Seventh review wave: all four shuffle/rank operators must be total
    on all-empty inputs (zero-row blocks carry the pre-map schema)."""
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.shuffle import (
        deterministic_pack,
        deterministic_shuffle,
        grouped_rank,
        value_rank,
    )

    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"),
         "text": pd.Series(dtype="object"),
         "source": pd.Series(dtype="object"),
         "v": pd.Series(dtype="int64")}))
    assert deterministic_shuffle(empty).count() == 0
    assert deterministic_pack(empty).count() == 0
    assert grouped_rank(empty, "source", quota=2).count() == 0
    assert value_rank(empty, "v").count() == 0
