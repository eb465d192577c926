"""Unit tests for the distributed primitives added for scale: two-level
hash aggregation, bounded-partition bucket pair generation, and the
Arrow-native reassembly exchange edge cases."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_hash_aggregate_matches_pandas(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 500, size=10_000),
            "v": rng.randint(-100, 100, size=10_000).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        hash_aggregate(ds, keys=["k"], aggs={"v": "sum", "n": "count"})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.assign(n=1)
        .groupby("k", as_index=False)
        .agg({"v": "sum", "n": "sum"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"v": "int64", "n": "int64"}), exp.astype({"v": "int64", "n": "int64"})
    )


def test_hash_aggregate_min_max_multikey(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y", "y", "y"],
            "b": [1, 1, 2, 2, 3],
            "v": [5, -2, 10, 20, 7],
        }
    )
    got = (
        hash_aggregate(rd.from_pandas(df).repartition(3), ["a", "b"], {"v": "min"})
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = df.groupby(["a", "b"], as_index=False).agg({"v": "min"})
    pd.testing.assert_frame_equal(got.astype({"v": "int64"}), exp.astype({"v": "int64"}))


def test_bucket_pairs_complete_and_exact(ray_session):
    """Every co-bucketed pair appears exactly once per bucket; nothing else."""
    import itertools

    import ray.data as rd

    from ocr_ray.stages.dedup import bucket_pairs

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "band_id": [0, 0, 0, 0, 1, 1, 1],
            "band_hash": ["a", "a", "a", "b", "c", "c", "d"],
        }
    )
    got = (
        bucket_pairs(rd.from_pandas(rows).repartition(3), ["band_id", "band_hash"],
                     n_partitions=4)
        .to_pandas()
    )
    got_pairs = sorted(map(tuple, got[["left_id", "right_id"]].to_numpy()))
    exp = []
    for _, g in rows.groupby(["band_id", "band_hash"]):
        exp.extend(itertools.combinations(sorted(g["doc_id"]), 2))
    assert got_pairs == sorted(exp)


def test_assemble_conversations_empty(ray_session):
    import ray.data as rd

    from ocr_ray.stages.reassemble import assemble_conversations

    empty = rd.from_pandas(
        pd.DataFrame(
            {"conv_id": pd.Series([], dtype="str"),
             "turn_idx": pd.Series([], dtype="int32"),
             "role": pd.Series([], dtype="str"),
             "clean_text": pd.Series([], dtype="str")}
        )
    )
    out = assemble_conversations(empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"conv_id", "n_turns", "conv_text"}


def test_segments_column(ray_session):
    """emit_segments adds list<struct> detected elements: boxed turns carry
    the payload's per-box conf, block/text segments re-join to the
    extracted text."""
    import os

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.sources.transcripts import generate_transcripts

    root = "/tmp/graft_transcripts/sf0.001-100"
    generate_transcripts(root, n_convs=100, seed=42, n_shards=8)
    ds = build_turn_pipeline(os.path.join(root, "transcripts"), emit_segments=True)
    df = ds.to_pandas()
    assert "segments" in df.columns
    boxed = df[df["kind"] == "boxed"]
    assert len(boxed) > 0
    for _, row in boxed.head(5).iterrows():
        assert all(s["kind"] == "box" for s in row["segments"])
        assert all(0.0 <= s["conf"] <= 1.0 for s in row["segments"])
    html = df[(df["kind"] == "html") & (df["error"] == "")]
    for _, row in html.head(5).iterrows():
        rejoined = "\n".join(s["text"] for s in row["segments"])
        assert rejoined == row["extracted_text"]
    empty = df[df["kind"] == "empty"]
    assert all(len(s) == 0 for s in empty["segments"])


def test_cross_parallelism_determinism(ray_session, tmp_path):
    """Identical results regardless of actor-pool size / batch size — output
    is a pure function of the input, not of the execution layout."""
    import os

    import ray.data as rd

    from ocr_ray.config import PipelineConfig
    from ocr_ray.pipelines.extract import run_extraction_job
    from ocr_ray.sources.transcripts import generate_transcripts

    in_dir = str(tmp_path / "in")
    generate_transcripts(in_dir, n_convs=30, seed=5, n_shards=4)
    tdir = os.path.join(in_dir, "transcripts")

    frames = []
    for i, (conc, bs) in enumerate([(1, 64), (3, 512)]):
        out = str(tmp_path / f"out{i}")
        run_extraction_job(
            tdir, out,
            PipelineConfig(extract_concurrency=conc, batch_size=bs,
                           fragment_group_size=2),
        )
        df = (
            rd.read_parquet(os.path.join(out, "turns"))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        frames.append(df[["conv_id", "turn_idx", "engine", "extracted_text", "clean_text"]])
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_facade_api(ray_session):
    """The user-facing facade wires through the stage layer correctly."""
    import ray.data as rd

    import ocr_ray.api as ocr

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "the quick brown fox jumps over the lazy dog again and again",
                "completely different words entirely unrelated content here now",
                "the quick brown fox jumps over the lazy dog again and",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)

    exact = ocr.dedup_pairs(ds, method="exact")
    assert set(zip(exact["left_id"], exact["right_id"])) == {(1, 2)}

    mh = ocr.dedup_pairs(ds, method="minhash", threshold=0.5)
    assert (1, 2) in set(zip(mh["left_id"], mh["right_id"]))

    sh = ocr.dedup_pairs(ds, method="simhash")
    assert (1, 2) in set(zip(sh["left_id"], sh["right_id"]))

    emb = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": [0, 1, 2],
             "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]}
        )
    )
    top = ocr.cosine_topk(emb, [1.0, 0.0], k=2)
    assert list(top["vec_id"]) == [0, 1]


def test_asof_and_range_join_semantics(ray_session):
    """Generic operator semantics: backward/forward as-of, -1 for
    uncontained points, keys never cross."""
    import ray.data as rd

    from ocr_ray.stages.join import asof_join, range_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "t": [10, 25, 10], "v": ["a", "b", "c"]}
    )).repartition(2)
    right = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "t": [5, 20, 50], "rv": [100, 200, 300]}
    )).repartition(2)

    back = (
        asof_join(left, right, by="k", on="t", n_partitions=4)
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # k=1: t=10 -> rv@5=100; t=25 -> rv@20=200.  k=2: t=10 has no earlier -> NaN
    assert list(back["rv"].fillna(-1).astype("int64")) == [100, 200, -1]

    fwd = (
        asof_join(left, right, by="k", on="t", direction="forward", n_partitions=4)
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert list(fwd["rv"].fillna(-1).astype("int64")) == [200, -1, 300]

    points = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 1, 2], "t": [3, 12, 30, 12]}
    )).repartition(2)
    ivals = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "lo": [0, 20, 100], "hi": [10, 25, 110], "iid": [7, 8, 9]}
    )).repartition(2)
    rj = (
        range_join(points, ivals, by="k", point_col="t", start_col="lo",
                   end_col="hi", idx_col="iid", n_partitions=4)
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # t=3 in [0,10] -> 7; t=12 uncontained -> -1; t=30 past [20,25] -> -1; k=2 t=12 -> -1
    assert list(rj["iid"]) == [7, -1, -1, -1]


def test_multimodal_stub_schemas(ray_session):
    """Binary-column plumbing: resize keeps payload binary + adds dims;
    audio features are fixed-size float lists; real decode refuses cleanly."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ocr_ray.stages.multimodal import (
        AudioFeatureStub,
        DecodeImageStub,
        ResizeImageStub,
    )

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"x" * 5000, b""], pa.binary())})
    ds = rd.from_arrow(t)

    resized = ds.map_batches(ResizeImageStub, batch_format="pyarrow", batch_size=2,
                             concurrency=1,
                             fn_constructor_kwargs={"max_dim": 256}).to_pandas()
    assert {"payload", "width", "height", "scaled"} <= set(resized.columns)
    assert (resized["width"] <= 256).all() and (resized["height"] <= 256).all()

    audio = ds.map_batches(AudioFeatureStub, batch_format="pyarrow", batch_size=2,
                           concurrency=1).to_pandas()
    assert all(len(v) == 13 for v in audio["mfcc"])
    assert audio["duration_sec"].iloc[1] == 0.0

    from ocr_ray.stages.multimodal import DECODERS_AVAILABLE

    if not DECODERS_AVAILABLE:
        # real_decode=True now falls back to the always-available
        # pure-python BMP codec; only codec="pil" keeps the loud refusal
        with pytest.raises(NotImplementedError):
            DecodeImageStub(real_decode=True, codec="pil")
        assert DecodeImageStub(real_decode=True).codec == "bmp"


def test_assemble_conversations_single_turn(ray_session):
    import ray.data as rd

    from ocr_ray.stages.reassemble import assemble_conversations

    one = rd.from_pandas(
        pd.DataFrame(
            {"conv_id": ["c1"], "turn_idx": [0], "role": ["user"],
             "clean_text": ["hello"]}
        )
    )
    out = assemble_conversations(one).to_pandas()
    assert len(out) == 1
    assert out["conv_text"].iloc[0] == "[user] hello"
    assert int(out["n_turns"].iloc[0]) == 1


def test_best_of_three_engine_attribution(ray_session):
    """C1/C3 with three engines: per-row attribution varies and the argmax
    picks the engine whose output actually scores highest (payloads crafted
    so each engine strictly wins one row; ties go to config order)."""
    import itertools

    import pyarrow as pa

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.functions.scoring import score_ocr_result
    from ocr_ray.stages.extract import ENGINES, Extractor

    assert set(DEFAULT_CONFIG.engines) == {"tagstrip", "density", "domtree"}

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
             "oscar", "papa", "quebec", "romeo"]
    clean = [a + b for a, b in itertools.product(words, words)]
    para1 = " ".join(clean[:80]) + "."
    para2 = " ".join(clean[80:160]) + "."
    p_dom = ("<html><body><div><p>" + para1 + "</p><p>" + para2 + "</p></div>"
             + "<div>" + "<p>@@@@ #### $$$$ %%%% ^^^^ &amp;&amp; **** (((( ))))</p>" * 14
             + "</div></body></html>")
    p_den = ("<p>" + para1 + "</p><p>" + para2 + "</p>" + "<p>## !!</p>" * 40)
    p_tag = "<p>one two</p><p>three four</p>"

    batch = pa.table(
        {"norm_text": [p_dom, p_den, p_tag], "kind": ["html"] * 3}
    )
    out = Extractor(DEFAULT_CONFIG)(batch)
    engines = out["engine"].to_pylist()
    texts = out["extracted_text"].to_pylist()
    assert engines == ["domtree", "density", "tagstrip"]
    # argmax correctness: each winner's text scores >= every engine's output
    for payload, text in zip([p_dom, p_den, p_tag], texts):
        best = max(score_ocr_result(fn(payload)) for fn in ENGINES.values())
        assert score_ocr_result(text) == best


def test_vectorized_clean_and_tokens_match_scalar(ray_session):
    """The Arrow-kernel batch paths (clean_docs_batch / token_count_batch)
    must equal the per-row scalar reference functions on real corpus data —
    the gate for RE2-vs-Python regex class differences."""
    import re

    import pyarrow as pa

    from ocr_ray.functions.textops import clean_extracted_text, preprocess_text
    from ocr_ray.stages.analysis import _BPE, clean_docs_batch, token_count_batch

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    # add transcript payloads (markup / noisy unicode / boxed json / empty)
    from ocr_ray.sources.transcripts import make_conv

    payloads = []
    for i in range(50):
        payloads.extend(t["text"] for t in make_conv(i, seed=7)[0])
    texts = list(docs["text"]) + payloads
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    got = clean_docs_batch(t)
    assert got["clean_preprocess"].to_pylist() == [preprocess_text(x) for x in texts]
    assert got["clean_extracted"].to_pylist() == [clean_extracted_text(x) for x in texts]

    tok = token_count_batch(t)
    assert tok["n_ws_tokens"].to_pylist() == [len(x.split()) for x in texts]
    assert tok["n_bpe_tokens"].to_pylist() == [len(_BPE.findall(x)) for x in texts]
    assert tok["n_alpha"].to_pylist() == [len(re.findall(r"[A-Za-z]+", x)) for x in texts]
    assert tok["n_num"].to_pylist() == [len(re.findall(r"[0-9]+", x)) for x in texts]


def test_lex10_walk_variant(ray_session):
    """L3 lexicographic walk: (y,x) sort, line-anchor tolerance 10, no
    within-line re-sort (src/core/ocr_engine.py:72-100 semantics)."""
    from ocr_ray.functions.layout import group_boxes_into_lines

    boxes = [
        (50.0, 12.0, 90.0, 24.0, "world"),   # same line as y=10 (|12-10|<=10)
        (10.0, 10.0, 40.0, 22.0, "hello"),
        (10.0, 40.0, 60.0, 52.0, "second"),  # new line anchor y=40
        (70.0, 48.0, 99.0, 60.0, "line"),    # |48-40|<=10 -> same line
        (10.0, 61.0, 40.0, 73.0, "third"),   # |61-40|>10 -> new line
    ]
    assert group_boxes_into_lines(boxes, variant="lex10") == "hello world\nsecond line\nthird"
    # anchor semantics: drift chains in adaptive, breaks in lex10
    drift = [(10.0, float(y), 40.0, float(y + 12), f"w{i}")
             for i, y in enumerate(range(0, 40, 8))]
    assert "\n" in group_boxes_into_lines(drift, variant="lex10")
    assert "\n" not in group_boxes_into_lines(drift, page_height=1000.0, variant="adaptive")


def test_benchmark_operator(ray_session):
    """Accuracy benchmark (src/ocr_benchmark.py analog): 6 rows per turn
    (3 engines x 2 layout modes), best engine hits accuracy 1.0 on markup
    turns, summary aggregates per engine x mode."""
    import os

    from ocr_ray.sources.transcripts import generate_transcripts
    from ocr_ray.stages.benchmark import benchmark_engines, benchmark_summary

    root = "/tmp/graft_bench_test/c20"
    generate_transcripts(root, n_convs=20, seed=11, n_shards=2)
    res = benchmark_engines(
        os.path.join(root, "transcripts"), os.path.join(root, "oracle")
    )
    df = res.to_pandas()
    n_turns = df[["conv_id", "turn_idx"]].drop_duplicates().shape[0]
    assert len(df) == n_turns * 6
    assert set(df["engine"]) == {"tagstrip", "density", "domtree"}

    # markup turns: at least one engine reproduces ground truth exactly
    import pandas as pd

    oracle = pd.read_parquet(os.path.join(root, "oracle"))
    markup_keys = set(
        zip(oracle[oracle["kind"] == "markup"]["conv_id"],
            oracle[oracle["kind"] == "markup"]["turn_idx"])
    )
    assert markup_keys
    m = df[[ (c, t) in markup_keys for c, t in zip(df["conv_id"], df["turn_idx"]) ]]
    best = m[m["layout_preserved"]].groupby(["conv_id", "turn_idx"])["accuracy"].max()
    assert (best == 1.0).all()

    summary = benchmark_summary(res)
    assert len(summary) == 6
    assert {"n", "mean_accuracy", "mean_time"} <= set(summary.columns)
    assert (summary["n"] == n_turns).all()


def test_embedding_store_roundtrip(ray_session, tmp_path):
    """S7 analog: embed -> parquet side table -> reload -> cosine_topk."""
    import ray.data as rd

    import ocr_ray.api as ocr
    from ocr_ray.stages.embed import (
        embed_documents,
        embed_query,
        load_embedding_store,
        save_embedding_store,
    )

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": ["data pipeline value", "unrelated words here", "data pipeline"]}
    ))
    store = str(tmp_path / "emb_store")
    save_embedding_store(embed_documents(docs), store)
    loaded = load_embedding_store(store)
    assert loaded.count() == 3
    top = ocr.cosine_topk(loaded, embed_query("data pipeline value"), k=2,
                          id_col="doc_id", vec_col="embedding")
    assert list(top["doc_id"])[0] == 1


def test_multimodal_audio_mfcc_deterministic(ray_session):
    """The sha512-derived mfcc fake (not SQL-replicable) is deterministic,
    fixed-width, and in [0,1)."""
    import pyarrow as pa

    from ocr_ray.stages.multimodal import AudioFeatureStub

    t = pa.table({"doc_id": [1, 2], "payload": [b"abc" * 100, b""]})
    out1 = AudioFeatureStub(n_mfcc=13)(t)
    out2 = AudioFeatureStub(n_mfcc=13)(t)
    assert out1["mfcc"].to_pylist() == out2["mfcc"].to_pylist()
    for v in out1["mfcc"].to_pylist():
        assert len(v) == 13 and all(0.0 <= x < 1.0 for x in v)
    assert out1["duration_sec"].to_pylist()[0] == 300 / 32000


def test_heavy_denoise_mode(ray_session):
    """M7 analog: config-gated heavy denoise strips control chars and
    collapses repeated noise-punctuation runs; the default (parity) pass
    leaves payloads byte-identical apart from zero-width strips."""
    import pyarrow as pa

    from ocr_ray.config import PipelineConfig
    from ocr_ray.stages.normalize import normalize_batch

    t = pa.table({"text": ["a\x00b!!!!! c ####d", "plain"]})
    heavy = normalize_batch(t, PipelineConfig(denoise="heavy"))
    assert heavy["norm_text"].to_pylist() == ["ab! c #d", "plain"]
    std = normalize_batch(t)
    assert std["norm_text"].to_pylist() == ["a\x00b!!!!! c ####d", "plain"]


def test_facade_round2_surface(ray_session):
    """New facade entries wire through: embed, RAG answers, near-dup."""
    import ray.data as rd

    import ocr_ray.api as ocr

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2],
         "text": ["the value is high. other text here.", "unrelated words only"]}
    ))
    emb = ocr.embed_texts(docs).to_pandas()
    assert {"doc_id", "embedding", "emb_norm"} <= set(emb.columns)
    ans = ocr.answer_questions(docs, "what is the value").to_pandas()
    assert list(ans.sort_values("doc_id")["answer"])[0].startswith("the value is high")

    # cluster labeling: two near-identical docs + one unrelated
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    d3 = rd.from_pandas(pd.DataFrame(
        {"doc_id": [5, 9, 12],
         "text": [base, base + "tail", "completely different content " * 6]}
    ))
    cl = ocr.dedup_clusters(d3, method="simhash").to_pandas()
    lab = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert lab.get(5) == 5 and lab.get(9) == 5 and 12 not in lab

    red = ocr.redact_pii(rd.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": ["mail a@b.io via https://x.io now"]}
    ))).to_pandas()
    assert red["redacted"].iloc[0] == "mail [EMAIL] via [URL] now"
    assert int(red["n_emails"].iloc[0]) == 1 and int(red["n_urls"].iloc[0]) == 1

    def split_of(ids):
        is_train = ids % 2 == 0
        return is_train, np.where(is_train, "train", "test")

    cont = ocr.split_contamination(
        rd.from_pandas(pd.DataFrame(
            {"doc_id": [2, 3, 7],
             "text": [base, base + "suffix words", "nothing shared here at all"]}
        )),
        split_of,
    ).to_pandas()
    assert set(cont["doc_id"]) == {3}
    assert list(cont["split"]) == ["test"]


def test_exchange_map_partitions_semantics(ray_session):
    """The exchange backbone: groupby-equivalent results, keys never split
    across partitions, datetime keys hash correctly, empty-safe."""
    import ray.data as rd

    from ocr_ray.stages.join import exchange_map_partitions

    df = pd.DataFrame(
        {
            "k": [1, 2, 3, 1, 2, 3, 1] * 20,
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(140), unit="h"),
            "v": range(140),
        }
    )
    ds = rd.from_pandas(df).repartition(5)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        # each key must appear in exactly one partition: aggregate fully here
        return g.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))

    out = (
        exchange_map_partitions(ds, "k", agg, n_partitions=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # if a key were split across partitions, it would appear twice
    assert out["k"].is_unique

    # datetime key
    df2 = df.assign(day=df["ts"].dt.floor("D"))
    out2 = exchange_map_partitions(
        rd.from_pandas(df2).repartition(3), "day",
        lambda g: g.groupby("day", as_index=False).agg(n=("v", "size")),
        n_partitions=4,
    ).to_pandas()
    assert out2["n"].sum() == len(df2) and out2["day"].is_unique


def test_hash_aggregate_matches_pandas_with_skew(ray_session):
    """Two-level aggregation stays exact under a pathological hot key."""
    import numpy as np
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    rng = np.random.RandomState(3)
    keys = np.where(rng.random(20_000) < 0.5, 7, rng.randint(0, 1000, 20_000))
    df = pd.DataFrame({"k": keys, "v": rng.randint(0, 100, 20_000)})
    out = hash_aggregate(
        rd.from_pandas(df).repartition(8), keys=["k"],
        aggs={"v": "sum", "n": "count"}, n_partitions=16,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = df.assign(n=1).groupby("k", as_index=False).agg({"v": "sum", "n": "sum"})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_iter_training_batches(ray_session, tmp_path):
    """The trainer-consumption surface streams typed Arrow batches."""
    import pyarrow as pa

    import ocr_ray.api as ocr
    from ocr_ray.sources.transcripts import generate_transcripts

    root = str(tmp_path / "tb")
    generate_transcripts(root, n_convs=40, seed=3, n_shards=2, with_oracle=False)
    total, n_batches = 0, 0
    for b in ocr.iter_training_batches(f"{root}/transcripts", batch_size=256,
                                       columns=["conv_id", "turn_idx", "clean_text"]):
        assert isinstance(b, pa.Table)
        assert b.schema.names == ["conv_id", "turn_idx", "clean_text"]
        assert b.num_rows <= 256
        total += b.num_rows
        n_batches += 1
    assert total > 0 and n_batches >= 2


def test_hash_aggregate_hot_key_skew(ray_session):
    """Extreme skew (90% of rows one key): per-batch partial aggregation
    collapses the hot key to one row per block BEFORE the exchange, so the
    hot partition receives O(n_blocks) rows, not O(n_rows) — results stay
    exact."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    n = 60_000
    k = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 1000)
    df = pd.DataFrame({"k": k.astype("int64"), "v": np.ones(n, dtype="int64")})
    got = (
        hash_aggregate(rd.from_pandas(df).repartition(16), ["k"], {"v": "sum"},
                       n_partitions=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = df.groupby("k", as_index=False)["v"].sum()
    pd.testing.assert_frame_equal(got.astype({"v": "int64"}), exp)
    assert int(got.loc[got["k"] == 7, "v"].iloc[0]) == int((k == 7).sum())


def test_hashed_linear_classifier(ray_session):
    """Classifier stage: deterministic weights, exact logit arithmetic,
    empty-doc handling, and the filter gate equals the keep flag."""
    import ray.data as rd

    from ocr_ray.stages.classify import (
        HashedLinearClassifier,
        classifier_filter,
        classify_documents,
        token_weight,
    )

    # weight is a pure function in [-1000, 1000]
    assert token_weight("hello") == token_weight("hello")
    assert all(-1000 <= token_weight(t) <= 1000
               for t in ["a", "z9", "hello", "world", "42"])

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["Hello world", "", "   ", "hello hello hello"],
    })
    got = (classify_documents(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    w_hello, w_world = token_weight("hello"), token_weight("world")
    assert got["clf_logit"].tolist() == [w_hello + w_world, 0, 0, 3 * w_hello]
    assert got["n_tokens"].tolist() == [2, 0, 0, 3]
    # empty docs: score 0.0, dropped by the gate (logit 0 is not > 0)
    assert got.loc[1, "clf_score"] == 0.0 and got.loc[1, "keep"] == 0
    assert (got["keep"] == (got["clf_logit"] > 0).astype("int64")).all()

    kept = (classifier_filter(rd.from_pandas(df)).to_pandas())
    assert set(kept["doc_id"]) == set(got.loc[got["keep"] == 1, "doc_id"])
    if len(kept):
        assert "text" in kept.columns  # gate carries text downstream

    # batch-size invariance: one batch vs per-row batches agree
    clf = HashedLinearClassifier()
    whole = clf(df)
    parts = pd.concat([clf(df.iloc[[i]]) for i in range(len(df))],
                      ignore_index=True)
    pd.testing.assert_frame_equal(whole.reset_index(drop=True), parts)


def test_deterministic_shuffle_exact_permutation(ray_session):
    """deterministic_shuffle: pos is an exact permutation 0..n-1, equals
    the rank in ORDER BY (mixed hash, id), is invariant to input
    partitioning, and carries payload columns through."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import deterministic_shuffle, shuffle_hash

    n = 3000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "payload": np.arange(n, dtype="int64") * 7})
    got = (deterministic_shuffle(rd.from_pandas(df).repartition(7),
                                 n_buckets=16, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert sorted(got["pos"].tolist()) == list(range(n))
    h = shuffle_hash(df["doc_id"].to_numpy())
    exp_order = np.lexsort((df["doc_id"].to_numpy(), h))
    exp_pos = np.empty(n, dtype="int64")
    exp_pos[exp_order] = np.arange(n)
    assert got["pos"].tolist() == exp_pos.tolist()
    assert (got["payload"] == got["doc_id"] * 7).all()

    got2 = (deterministic_shuffle(rd.from_pandas(df).repartition(2),
                                  n_buckets=64, n_partitions=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got2["pos"].tolist() == got["pos"].tolist()


def test_deterministic_pack_exact_prefix_sum(ray_session):
    """deterministic_pack: start_offset equals the exact prefix sum of
    token counts in shuffle order (so bins are the concat-and-chunk
    assignment), invariant to input partitioning; 0-token docs keep the
    running offset."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import deterministic_pack, shuffle_hash

    n = 800
    rng = np.random.RandomState(3)
    texts = ["w " * int(k) for k in rng.randint(0, 40, size=n)]
    texts[5] = "   "  # whitespace-only -> 0 tokens
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "text": texts})

    got = (deterministic_pack(rd.from_pandas(df).repartition(5), budget=64,
                              n_buckets=16, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    h = shuffle_hash(df["doc_id"].to_numpy())
    order = np.lexsort((df["doc_id"].to_numpy(), h))
    n_tok = np.array([len(t.split()) for t in texts], dtype="int64")
    exp_off = np.empty(n, dtype="int64")
    exp_off[order] = np.cumsum(n_tok[order]) - n_tok[order]
    assert got["n_tokens"].tolist() == n_tok.tolist()
    assert got["start_offset"].tolist() == exp_off.tolist()
    assert got["bin"].tolist() == (exp_off // 64).tolist()

    got2 = (deterministic_pack(rd.from_pandas(df).repartition(2), budget=64,
                               n_buckets=64, n_partitions=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got2["start_offset"].tolist() == got["start_offset"].tolist()


def test_kmeans_exact_integer_lloyd(ray_session):
    """kmeans_embeddings: recovers planted clusters, matches a brute-force
    integer Lloyd run bit-for-bit, and is invariant to partitioning."""
    import ray.data as rd

    from ocr_ray.stages.cluster import (_assign, kmeans_embeddings,
                                        quantize_embeddings)

    rng = np.random.RandomState(11)
    centers = rng.randn(3, 16) * 4
    X = np.concatenate([centers[i] + rng.randn(40, 16) * 0.2
                        for i in range(3)]).astype(np.float32)
    ids = np.arange(len(X), dtype="int64")
    # put one vector of each planted cluster first so seeds differ
    order = np.r_[0, 40, 80, np.delete(np.arange(120), [0, 40, 80])]
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X[order])})

    got = (kmeans_embeddings(rd.from_pandas(df).repartition(5), k=3, iters=2,
                             n_partitions=3)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    # brute force: same quantization, same update rule
    xq = quantize_embeddings(X[order])
    cents = xq[:3].copy()
    for _ in range(2):
        a, _ = _assign(xq, cents)
        for c in range(3):
            m = xq[a == c]
            if len(m):
                cents[c] = m.sum(axis=0) // len(m)
    a, dist = _assign(xq, cents)
    assert got["cluster"].tolist() == a.tolist()
    assert got["dist"].tolist() == dist.tolist()
    # planted structure recovered: each third maps to one distinct cluster
    thirds = [set(got["cluster"][np.isin(ids, np.flatnonzero(
        np.isin(order, np.arange(i * 40, (i + 1) * 40))))])
        for i in range(3)]
    assert all(len(t) == 1 for t in thirds)
    assert len(set.union(*thirds)) == 3

    got2 = (kmeans_embeddings(rd.from_pandas(df).repartition(2), k=3, iters=2,
                              n_partitions=5)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_value_rank_matches_argsort(ray_session):
    """value_rank: rank is the exact global (value, id) order including
    heavy duplicate values; pctile exact; partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import value_rank

    n = 700
    rng = np.random.RandomState(2)
    v = rng.randint(0, 40, size=n).astype("int64")  # heavy duplicates
    v[:100] = 7  # a hot value
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"), "val": v})
    got = (value_rank(rd.from_pandas(df).repartition(6), "val",
                      n_buckets=32, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    order = np.lexsort((df["doc_id"].to_numpy(), v))
    exp = np.empty(n, dtype="int64")
    exp[order] = np.arange(n)
    assert got["rank"].tolist() == exp.tolist()
    assert got["pctile"].tolist() == ((exp * 1_000_000 // (n - 1)) / 1e6).tolist()

    got2 = (value_rank(rd.from_pandas(df).repartition(2), "val",
                       n_buckets=1024, n_partitions=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got2["rank"].tolist() == got["rank"].tolist()


def test_mixture_resample_hits_target(ray_session):
    """mixture_resample: binding group keeps ~100%, output group counts
    match n_g*rate/1e6 expectation within hash noise, zero-weight groups
    drop, and the result is partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.sample import mixture_rates, mixture_resample

    counts = {"en": 6000, "de": 1000, "fr": 900, "xx": 50}
    weights = {"en": 50, "de": 25, "fr": 25}  # xx unweighted -> dropped
    rates = mixture_rates(counts, weights)
    assert set(rates) == {"en", "de", "fr"}
    # fr binds (900/25 is the min headroom): keeps ~everything
    assert rates["fr"] >= 999_000
    # realized mixture tracks the weights: en/de expected ratio 2:1
    exp = {g: counts[g] * rates[g] / 1e6 for g in rates}
    assert abs(exp["en"] / exp["de"] - 2.0) < 0.01

    rng = np.random.RandomState(5)
    langs = np.concatenate([np.repeat(g, n) for g, n in counts.items()])
    df = pd.DataFrame({"doc_id": np.arange(len(langs), dtype="int64"),
                       "lang": rng.permutation(langs)})
    got = (mixture_resample(rd.from_pandas(df).repartition(5), weights)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert "xx" not in set(got["lang"])
    by = got.groupby("lang").size()
    for g in rates:
        assert abs(by[g] - exp[g]) / exp[g] < 0.12  # hash-uniformity noise
    got2 = (mixture_resample(rd.from_pandas(df).repartition(2), weights)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_mixture_resample_numeric_group_col(ray_session):
    """Regression: the rate dict is keyed by str(group) (count pass), so a
    NUMERIC group_col must be str-normalized in the keep pass too — the raw
    .map missed every key and silently dropped the whole corpus."""
    import ray.data as rd

    from ocr_ray.stages.sample import mixture_resample

    df = pd.DataFrame({
        "doc_id": np.arange(3000, dtype="int64"),
        "bucket": np.repeat(np.array([1, 2, 3], dtype="int64"), 1000),
    })
    weights = {"1": 50, "2": 25, "3": 25}
    got = (mixture_resample(rd.from_pandas(df).repartition(4), weights,
                            group_col="bucket")
           .to_pandas())
    assert len(got) > 0, "numeric group_col dropped the whole corpus"
    by = got.groupby("bucket").size()
    # every positively-weighted group survives with a sane keep count
    assert set(by.index) == {1, 2, 3}
    assert all(by > 200)


def test_int8_quantization_properties(ray_session):
    """quantize_int8: codes in [-127,127] with the max-abs component at
    +/-127, zero vector -> zeros; quantized top-1 matches float cosine
    top-1 on well-separated data."""
    from ocr_ray.stages.similarity import QuantizedDot, quantize_int8

    rng = np.random.RandomState(11)
    m = rng.randn(200, 64)
    m[0] = 0.0  # zero vector
    codes, mx = quantize_int8(m)
    assert codes.min() >= -127 and codes.max() <= 127
    assert (codes[0] == 0).all() and mx[0] == 0.0
    nz = np.abs(codes[1:]).max(axis=1)
    assert (nz == 127).all()
    # dequantization error bounded by half a step per component
    deq = codes[1:] * (mx[1:, None] / 127.0)
    assert np.abs(deq - m[1:]).max() <= (mx[1:, None] / 127.0 / 2 + 1e-12).max()

    # quantized dot agrees with float cosine on a planted near-duplicate
    q = m[5] + rng.randn(64) * 0.01
    stage = QuantizedDot(quantize_int8(q[None, :])[0][0])
    scored = stage(pd.DataFrame({"vec_id": np.arange(200, dtype="int64"),
                                 "embedding": list(m)}))
    assert int(scored.loc[scored["dot"].idxmax(), "vec_id"]) == 5


def test_grouped_rank_per_group_permutation(ray_session):
    """grouped_rank: src_rank is an exact 0..n_g-1 permutation inside
    each group, matches the (hash, id) order, and the quota flag keeps
    exactly min(quota, n_g) rows per group; partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import grouped_rank, shuffle_hash

    n = 900
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": rng.choice(["a", "b", "hot"], size=n, p=[0.2, 0.2, 0.6]),
    })
    got = (grouped_rank(rd.from_pandas(df).repartition(6), "source",
                        quota=50, n_buckets=16, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    h = shuffle_hash(df["doc_id"].to_numpy())
    for src, grp in df.groupby("source"):
        sub = got[got["source"] == src]
        assert sorted(sub["src_rank"]) == list(range(len(grp)))
        order = np.lexsort((grp["doc_id"].to_numpy(),
                            h[grp.index.to_numpy()]))
        exp = pd.Series(np.arange(len(grp)),
                        index=grp["doc_id"].to_numpy()[order])
        assert (sub.set_index("doc_id")["src_rank"]
                .sort_index() == exp.sort_index()).all()
        assert sub["kept"].sum() == min(50, len(grp))

    got2 = (grouped_rank(rd.from_pandas(df).repartition(2), "source",
                         quota=50, n_buckets=64, n_partitions=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got2["src_rank"].tolist() == got["src_rank"].tolist()


def test_semantic_dedup_flags_lower_id_neighbors(ray_session):
    """semantic_dedup: planted near-copies are flagged against their
    lower-id twin; isolated vectors are kept; invariant to partitioning."""
    import ray.data as rd

    from ocr_ray.stages.cluster import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(30, 8).astype(np.float32) * 3
    X = base.copy()
    X[17] = base[3] + 0.001   # near-copy of 3 -> dup (17 > 3)
    X[9] = base[2] + 0.001    # near-copy of 2 -> dup (9 > 2)
    df = pd.DataFrame({"vec_id": np.arange(30, dtype="int64"),
                       "embedding": list(X)})
    thr = int(8 * (0.01 * (1 << 20)) ** 2)  # generous ball around twins
    got = (semantic_dedup(rd.from_pandas(df).repartition(4), k=4, iters=2,
                          dist_threshold=thr, n_partitions=3)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert got.loc[17, "is_dup"] == 1 and got.loc[9, "is_dup"] == 1
    assert got.loc[3, "is_dup"] == 0 and got.loc[2, "is_dup"] == 0
    assert got["is_dup"].sum() == 2
    # twins share a cluster (they're within epsilon of each other)
    assert got.loc[17, "cluster"] == got.loc[3, "cluster"]

    got2 = (semantic_dedup(rd.from_pandas(df).repartition(1), k=4, iters=2,
                           dist_threshold=thr, n_partitions=5)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_block_dedup_removes_cross_doc_boilerplate(ray_session):
    """block_dedup: a block repeated across >=2 docs vanishes from every
    doc; within-doc repeats survive; block order is preserved."""
    import ray.data as rd

    from ocr_ray.stages.dedup import block_dedup

    boiler = "click here to subscribe now"  # 5 tokens -> pad to w=5
    texts = [
        f"{boiler} alpha beta gamma delta eps",
        f"zeta eta theta iota kappa {boiler}",
        "solo text unique to this document x "
        "solo text unique to this document x",  # same block twice, one doc
        "short tail",
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype="int64"), "text": texts})
    got = (block_dedup(rd.from_pandas(df).repartition(3), w=5, min_docs=2,
                       n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert got["n_blocks"].tolist() == [2, 2, 3, 1]
    assert got["n_dup_blocks"].tolist() == [1, 1, 0, 0]
    assert got.loc[0, "dedup_text"] == "alpha beta gamma delta eps"
    assert got.loc[1, "dedup_text"] == "zeta eta theta iota kappa"
    assert got.loc[2, "dedup_text"] == texts[2]  # within-doc repeat kept
    assert got.loc[3, "dedup_text"] == "short tail"

    got2 = (block_dedup(rd.from_pandas(df).repartition(1), w=5, min_docs=2,
                        n_partitions=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_bigram_lm_score_matches_brute_force(ray_session):
    """lm_score: trained hashed counts and per-doc integer ppm scores
    equal a single-process brute-force over the same hash functions;
    <2-token docs are excluded; result invariant to partitioning."""
    import ray.data as rd

    from ocr_ray.stages.embed import hash_token
    from ocr_ray.stages.lm import lm_score

    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "a dog ran over the hill and far away",
        "singleton",            # 1 token -> excluded
        "   ",                  # empty -> excluded
        "the the the the",      # repetition -> high conditional prob
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})
    got = (lm_score(rd.from_pandas(df).repartition(3), threshold_ppm=680_000,
                    b_uni=64, b_big=128, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force with the same tiny tables (collisions exercised)
    c1 = np.zeros(64, dtype=np.int64)
    c2 = np.zeros(128, dtype=np.int64)
    hs = {t: [hash_token(w) for w in t.split()] for t in texts}
    scored = [t for t in texts if len(t.split()) >= 2]
    for t in scored:
        h = hs[t]
        for x in h:
            c1[x % 64] += 1
        for a, b in zip(h, h[1:]):
            c2[((a * 1000003 + b) % 2147483647) % 128] += 1
    assert got["doc_id"].tolist() == [0, 1, 2, 5]
    for row_i, t in zip(got.index, scored):
        h = hs[t]
        qs = [int(c2[((a * 1000003 + b) % 2147483647) % 128]) * 1_000_000
              // int(c1[a % 64]) for a, b in zip(h, h[1:])]
        assert got.loc[row_i, "n_bigrams"] == len(qs)
        assert got.loc[row_i, "lm_ppm"] == sum(qs) // len(qs)
    assert (got["keep"] == (got["lm_ppm"] >= 680_000).astype("int64")).all()
    assert got["keep"].nunique() == 2  # gate exercised both ways

    got2 = (lm_score(rd.from_pandas(df).repartition(6), threshold_ppm=680_000,
                     b_uni=64, b_big=128, n_partitions=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got2["lm_ppm"].tolist() == got["lm_ppm"].tolist()


def test_incremental_containment_flags_near_copies(ray_session):
    """incremental_containment: containment equals the exact fraction of
    a shard doc's distinct shingles present in the corpus; a verbatim
    copy scores 1.0/is_dup, fresh text scores 0.0."""
    import ray.data as rd

    from ocr_ray.stages.dedup import PolySimHasher, incremental_containment

    corpus_texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red green blue yellow purple orange cyan magenta",
    ]
    shard_texts = [
        corpus_texts[0],                                   # verbatim copy
        "alpha beta gamma delta NEW WORDS HERE entirely",  # partial overlap
        "totally fresh text with no shared window at all",  # novel
    ]
    corpus = rd.from_pandas(pd.DataFrame({"text": corpus_texts}))
    shard = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(3, dtype="int64"), "text": shard_texts}))

    got = (incremental_containment(corpus, shard, threshold=0.8,
                                   n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    hasher = PolySimHasher()
    corpus_h = set(np.concatenate(
        [hasher.features(t) for t in corpus_texts]).tolist())
    for i, t in enumerate(shard_texts):
        f = hasher.features(t)
        n_seen = sum(1 for h in f.tolist() if h in corpus_h)
        assert got.loc[i, "n_shingles"] == f.size
        assert got.loc[i, "n_seen"] == n_seen
    assert got.loc[0, "containment"] == 1.0 and got.loc[0, "is_dup"] == 1
    assert 0.0 < got.loc[1, "containment"] < 0.8
    assert got.loc[2, "containment"] == 0.0 and got.loc[2, "is_dup"] == 0


def test_dsir_ranks_target_like_docs(ray_session):
    """dsir_score: docs sharing the target slice's vocabulary score
    strictly higher than off-target docs; scores are integer-exact and
    partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.dsir import dsir_score

    rng = np.random.RandomState(7)
    tgt_vocab = [f"alpha{i}" for i in range(30)]
    off_vocab = [f"omega{i}" for i in range(30)]
    mk = lambda vocab: " ".join(rng.choice(vocab, size=25))
    texts = [mk(tgt_vocab) for _ in range(40)] + \
            [mk(off_vocab) for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(80, dtype="int64"),
                       "text": texts})
    raw = rd.from_pandas(df).repartition(5)
    target = rd.from_pandas(df.iloc[:20]).repartition(2)

    got = (dsir_score(raw, target, threshold_ppm=100_000, n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 80
    on, off = got["dsir_ppm"][:40], got["dsir_ppm"][40:]
    assert on.min() > off.max()  # clean vocab separation
    assert (got["keep"] == (got["dsir_ppm"] >= 100_000).astype("int64")).all()

    got2 = (dsir_score(rd.from_pandas(df).repartition(2),
                       rd.from_pandas(df.iloc[:20]), threshold_ppm=100_000,
                       n_partitions=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_countmin_estimates_bound_exact_counts(ray_session):
    """countmin_sketch: est >= exact for every term, equality on a sketch
    with far fewer terms than cells, and the merged sketch equals a
    single-partition build (cells are order-free sums)."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import countmin_estimate, countmin_sketch

    rng = np.random.RandomState(13)
    vocab = [f"tok{i}" for i in range(300)]
    weights = 1.0 / np.arange(1, 301)  # zipf-ish
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=60, p=weights))
             for _ in range(200)]
    df = pd.DataFrame({"text": texts})

    sk = countmin_sketch(rd.from_pandas(df).repartition(6),
                         n_partitions=4).to_pandas()
    sk2 = countmin_sketch(rd.from_pandas(df).repartition(1),
                          n_partitions=2).to_pandas()
    key = lambda t: t.sort_values(["r", "cell"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(sk), key(sk2))

    from collections import Counter
    exact = Counter()
    for t in texts:
        exact.update(t.split())
    est = countmin_estimate(sk, list(exact.keys()))
    for term, n in exact.items():
        assert est[term] >= n
    # 300 distinct terms vs 4x16384 cells: collisions are ~impossible
    assert sum(int(est[t]) != n for t, n in exact.items()) == 0


def test_pagerank_exact_integer_iteration(ray_session):
    """pagerank: matches a driver-side replica of the integer recurrence
    on a known graph, concentrates mass on the sink-heavy node, and is
    partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.graph import pagerank

    # 0 -> 1 (w3), 0 -> 2 (w1), 1 -> 2 (w2), 2 -> 0 (w1): node 2 is the
    # most-pointed-to node
    e = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 2, 0],
                      "w": [3, 1, 2, 1]})
    got = pagerank(rd.from_pandas(e).repartition(2), iters=2,
                   n_partitions=3).sort_values("node").reset_index(drop=True)

    n = 3
    pr = {v: 1_000_000 // n for v in range(n)}
    ow = {0: 4, 1: 2, 2: 1}
    for _ in range(2):
        s = {v: 0 for v in range(n)}
        for src, dst, w in e.itertuples(index=False):
            s[dst] += pr[src] * w // ow[src]
        # teleport is 0.15/N: 15 * PPM // n folded with the final //100
        # (sixth review wave: the old 150x constant inflated rank mass)
        pr = {v: (15_000_000 // n + 85 * s[v]) // 100 for v in range(n)}
    assert got["pr_ppm"].tolist() == [pr[0], pr[1], pr[2]]
    assert got["out_w"].tolist() == [4, 2, 1]
    # the engine's 2-iteration ranking equals the replica's (node 0 leads
    # at iters=2 — it receives ALL of node 2's out-mass; the asymptotic
    # winner 2 only overtakes after more iterations)
    assert got["pr_ppm"].idxmax() == max(pr, key=pr.get) == 0

    got2 = pagerank(rd.from_pandas(e).repartition(4), iters=2,
                    n_partitions=2).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)


def test_export_jsonl_roundtrip(ray_session, tmp_path):
    """api.export_jsonl writes sharded JSONL a trainer can stream back."""
    import glob
    import json as _json

    import pandas as pd
    import ray.data as rd

    from ocr_ray import api

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    out = str(tmp_path / "jsonl")
    api.export_jsonl(rd.from_pandas(df), out, columns=["doc_id", "text"])
    rows = []
    for f in sorted(glob.glob(out + "/*.json")):
        rows += [_json.loads(line) for line in open(f) if line.strip()]
    got = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)


def test_exchange_semi_anti_join(ray_session):
    """semi/anti exchange modes: complements partition the left side; an
    int32 probe key against an int64 left key is cast, not silently
    dropped; empty results keep the left schema."""
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.join import exchange_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
         "v": ["a", "b", "c", "d", "e"]}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series([2, 4, 9], dtype="int32")}))

    semi = exchange_join(left, right, on="k", n_partitions=4, how="semi").to_pandas()
    anti = exchange_join(left, right, on="k", n_partitions=4, how="anti").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3, 5]

    nothing = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    empty = exchange_join(left, nothing, on="k", n_partitions=4, how="semi")
    assert empty.count() == 0
    assert set(empty.schema().names) == {"k", "v"}


def test_sequence_validation_gaps_and_dups(ray_session):
    """Turn-index integrity: contiguous, gapped, duplicated, and
    wrong-base sequences are each flagged correctly, and batch boundaries
    (same key split across blocks) don't break the distinct counting."""
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.validate import sequence_validation

    rows = pd.DataFrame(
        {
            "conv_id": ["A"] * 5 + ["B"] * 4 + ["C"] * 4 + ["D"] * 3 + ["E"] * 3,
            "turn_idx": pd.array(
                [0, 1, 2, 3, 4,    # A contiguous from 0
                 0, 1, 3, 4,       # B gap at 2
                 0, 1, 1, 2,       # C duplicate idx 1
                 1, 2, 3,          # D starts at 1 (wrong base)
                 0, None, 1],      # E null turn_idx (collector corruption)
                dtype="Int64",
            ),
        }
    )
    # two single-conv blocks plus a split of A across blocks
    ds = rd.from_pandas([rows.iloc[:3], rows.iloc[3:9], rows.iloc[9:]])
    out = (
        sequence_validation(ds, "conv_id", "turn_idx", base=0, n_partitions=4)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert list(out["conv_id"]) == ["A", "B", "C", "D", "E"]
    assert list(out["n_rows"]) == [5, 4, 4, 3, 3]
    assert list(out["n_distinct"]) == [5, 4, 3, 3, 2]
    assert list(out["n_null_idx"]) == [0, 0, 0, 0, 1]
    assert list(out["has_dups"]) == [False, False, True, False, True]
    assert list(out["is_contiguous"]) == [True, False, False, False, False]
