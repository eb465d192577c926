"""User-facing facade: the one-stop API a reference user switches to.

Thin, tested wrappers over the pipeline/stage layer:

    import ocr_ray.api as ocr

    turns = ocr.extract_turns("/data/transcripts")       # per-turn extraction
    convs = ocr.extract_conversations("/data/transcripts")
    pairs = ocr.dedup_pairs(docs_ds, method="minhash")   # near-dup candidates
    top   = ocr.cosine_topk(emb_ds, query_vec, k=10)     # similarity search

Everything returns ``ray.data.Dataset`` (or a small pandas frame for
driver-side results) and composes with plain Ray Data operations.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig


def extract_turns(
    paths: "List[str] | str",
    config: PipelineConfig = DEFAULT_CONFIG,
    emit_segments: bool = False,
) -> "rd.Dataset":
    """Transcripts parquet -> per-turn extracted + cleaned text Dataset."""
    from ocr_ray.pipelines.extract import build_turn_pipeline

    return build_turn_pipeline(paths, config=config, emit_segments=emit_segments)


def extract_conversations(
    paths: "List[str] | str", config: PipelineConfig = DEFAULT_CONFIG
) -> "rd.Dataset":
    """Transcripts parquet -> one row per conversation (ordered turn join)."""
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.reassemble import assemble_conversations

    return assemble_conversations(build_turn_pipeline(paths, config), config)


def run_job(input_dir: str, out_dir: str, **kwargs) -> dict:
    """Checkpointed, resumable extraction job (see ocr_ray.run_job CLI)."""
    from ocr_ray.pipelines.extract import run_extraction_job

    return run_extraction_job(input_dir, out_dir, **kwargs)


def dedup_pairs(
    docs: "rd.Dataset",
    method: str = "minhash",
    threshold: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: str = "exact",
) -> pd.DataFrame:
    """Near-duplicate pairs (left_id < right_id) by the chosen method.

    ``exact``: identical text.  ``minhash``: shingle MinHash+LSH candidates
    verified by true shingle Jaccard >= threshold.  ``simhash``: band-bucket
    candidates verified by Hamming <= 9 over 62-bit SQL-replicable
    signatures (provably equal to the all-pairs filter; see
    stages/dedup.py:PolySimHasher).

    ``verify`` (minhash only): ``"exact"`` ships texts to the verify
    step; ``"estimate"`` ships 8*n_perm-byte signatures instead and
    scores ``jaccard_est`` = matching-permutation fraction — the scale
    path for candidate-heavy/self-similar corpora where exact verify's
    O(pairs x text) attach traffic is the bottleneck (see
    stages/dedup.py:minhash_dedup_pairs).
    """
    from ocr_ray.stages.dedup import (
        add_content_hash,
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    if method == "exact":
        # distributed, same shape as pipelines/queries.py:q_dedup_exact —
        # text is dropped before the exchange (16-byte hash keys move, not
        # payloads) and pair emission happens inside the hash partitions;
        # only the (small) verified pair table reaches the driver
        from ocr_ray.stages.join import exchange_map_partitions

        def hash_only(b: pd.DataFrame) -> pd.DataFrame:
            h = add_content_hash(b, col=text_col)
            return pd.DataFrame(
                {id_col: h[id_col], "content_hash": h["content_hash"]}
            )

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({"left_id": pd.Series([], dtype="object"),
                                     "right_id": pd.Series([], dtype="object")})
            # id dtype preserved (int, string, UUID — anything orderable):
            # the keeper is the per-hash minimum under the column's own order
            g = g.sort_values(["content_hash", id_col], kind="mergesort")
            first = g.groupby("content_hash")[id_col].transform("min")
            dup = g[id_col] != first
            return pd.DataFrame(
                {"left_id": first[dup].to_numpy(),
                 "right_id": g.loc[dup, id_col].to_numpy()}
            )

        hashed = docs.map_batches(hash_only, batch_format="pandas")
        out = exchange_map_partitions(hashed, "content_hash", pairs,
                                      n_partitions=None).to_pandas()
        if "left_id" not in out.columns:
            # duplicate-free or empty corpus: to_pandas drops columns
            return pd.DataFrame({"left_id": pd.Series(dtype="object"),
                                 "right_id": pd.Series(dtype="object")})
        return out.sort_values(["left_id", "right_id"]).reset_index(drop=True)

    # both LSH paths are end-to-end distributed (stages/dedup.py); the facade
    # materializes only the (small) verified pair table
    if method == "minhash":
        return minhash_dedup_pairs(
            docs, shingle_k=3, threshold=threshold,
            text_col=text_col, id_col=id_col, n_partitions=None,
            verify=verify,
        ).to_pandas()
    if method == "simhash":
        return simhash_dedup_pairs(
            docs, text_col=text_col, id_col=id_col, n_partitions=None,
        ).to_pandas()

    raise ValueError(f"unknown dedup method: {method}")


def dedup_clusters(
    docs: "rd.Dataset",
    method: str = "minhash",
    threshold: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Near-dup components: every doc in a dup pair labeled with its
    cluster's minimum id (``doc_id``, ``cluster_id``).  Keep-one-per-cluster
    is then ``filter(doc_id == cluster_id)`` plus the unpaired docs."""
    from ocr_ray.stages.dedup import (
        connected_components,
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    if method == "minhash":
        pairs = minhash_dedup_pairs(
            docs, threshold=threshold, text_col=text_col, id_col=id_col,
            n_partitions=None,
        )
    elif method == "simhash":
        pairs = simhash_dedup_pairs(
            docs, text_col=text_col, id_col=id_col, n_partitions=None,
        )
    else:
        raise ValueError(f"unknown dedup method: {method}")
    return connected_components(pairs, n_partitions=None)


def redact_pii(docs: "rd.Dataset", text_col: str = "text") -> "rd.Dataset":
    """Sequential PII redaction (url -> email -> phone -> dates) with
    per-category counts; adds ``redacted`` + ``n_*`` columns."""
    from ocr_ray.functions.entities import redact_pii as _redact

    def batch_fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        # NULL text redacts as empty (in-band) rather than AttributeError
        recs = [_redact(t if isinstance(t, str) else "")
                for t in b[text_col]]
        for k in ("redacted", "n_urls", "n_emails", "n_phones", "n_dates"):
            out[k] = [r[k] for r in recs]
        return out

    return docs.map_batches(batch_fn, batch_format="pandas")


def split_contamination(
    docs: "rd.Dataset",
    split_of,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Non-train docs sharing any k-word shingle with a train doc (see
    stages/dedup.py:cross_split_contamination)."""
    from ocr_ray.stages.dedup import cross_split_contamination

    return cross_split_contamination(
        docs, split_of, shingle_k=shingle_k, text_col=text_col, id_col=id_col,
    )


def embed_texts(
    docs: "rd.Dataset",
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Text table -> deterministic feature-hash embeddings (A7 analog);
    persist/reload with save_embedding_store / load_embedding_store."""
    from ocr_ray.stages.embed import embed_documents

    return embed_documents(docs, dim=dim, text_col=text_col, id_col=id_col)


def answer_questions(
    docs: "rd.Dataset", query: str, k: int = 3, dim: int = 64
) -> "rd.Dataset":
    """Full RAG orchestration per document (R6): chunk -> embed -> cosine
    retrieve top-k -> heuristic answer + confidence."""
    from ocr_ray.stages.rag import EmbedRAG
    from ocr_ray.stages.taskpool import task_pool

    return docs.map_batches(
        task_pool(EmbedRAG, query=query, k=k, dim=dim), batch_format="pandas"
    )


def near_dup_embeddings(
    embeddings: "rd.Dataset", threshold: float = 0.9, **kwargs
) -> "rd.Dataset":
    """Embedding near-dup pairs at scale (multi-table LSH candidates +
    exchange-verified exact cosine)."""
    from ocr_ray.stages.similarity import lsh_embed_dedup_pairs

    return lsh_embed_dedup_pairs(embeddings, threshold=threshold, **kwargs)


def benchmark_engines(transcripts_dir: str, oracle_dir: str, **kwargs) -> "rd.Dataset":
    """Engine-accuracy benchmark vs a ground-truth table (src/ocr_benchmark
    analog); summarize with ocr_ray.stages.benchmark.benchmark_summary."""
    from ocr_ray.stages.benchmark import benchmark_engines as _bench

    return _bench(transcripts_dir, oracle_dir, **kwargs)


def cosine_topk(
    embeddings: "rd.Dataset",
    query: "Sequence[float] | np.ndarray",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Brute-force cosine top-k of ``query`` against an embedding Dataset
    (broadcast query, per-batch matmul, per-block top-k + driver merge —
    ``sort().limit(k)`` would range-shuffle the ENTIRE score table before
    the limit applies; global_topk moves k rows per block instead)."""
    from ocr_ray.stages.aggregate import global_topk
    from ocr_ray.stages.similarity import CosineTopK
    from ocr_ray.stages.taskpool import task_pool

    qref = ray.put(np.asarray(query, dtype=np.float64))
    scored = embeddings.map_batches(
        task_pool(CosineTopK, query_ref=qref, id_col=id_col,
                  vec_col=vec_col),
        batch_format="pandas",
    )
    return global_topk(scored, by=["sim", id_col], k=k,
                       descending=[True, False])


def iter_training_batches(
    paths: "List[str] | str",
    batch_size: int = 4096,
    columns: Optional[List[str]] = None,
    config: PipelineConfig = DEFAULT_CONFIG,
    shuffle_seed: Optional[int] = None,
):
    """Stream extracted turns to a trainer: the flagship pipeline consumed
    via ``iter_batches`` (pyarrow format, zero-copy off the object store) —
    the engine never materializes the dataset; backpressure paces
    extraction to the consumer.  ``shuffle_seed`` enables Ray's windowed
    ``random_shuffle`` for epoch randomization (a full shuffle — use only
    when the trainer needs it; local per-batch shuffling is usually enough
    at 100 TB)."""
    from ocr_ray.pipelines.extract import build_turn_pipeline

    ds = build_turn_pipeline(paths, config=config)
    if columns:
        ds = ds.select_columns(columns)
    if shuffle_seed is not None:
        ds = ds.random_shuffle(seed=shuffle_seed)
    return ds.iter_batches(batch_size=batch_size, batch_format="pyarrow")


def curate(
    docs: "rd.Dataset",
    min_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """End-to-end curation composite (quality gate -> exact dedup ->
    deterministic 80/10/10 split) as one streaming job; returns
    (doc_id, split) for the kept documents."""
    import re as _re

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.dedup import add_content_hash

    word = _re.compile(r"\w+")
    from ocr_ray.pipelines.queries import _id_hash32

    def quality_gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for t in b[text_col]:
            if not isinstance(t, str):  # NULL text can't pass a token gate
                keep.append(False)
                continue
            toks = word.findall(t.lower())
            keep.append(len(toks) >= min_tokens and 2 * len(set(toks)) >= len(toks))
        out = b[pd.Series(keep, index=b.index)]
        return pd.DataFrame({id_col: out[id_col],  # dtype preserved
                             text_col: out[text_col]})

    def hash_text(b: pd.DataFrame) -> pd.DataFrame:
        return add_content_hash(b, col=text_col)[[id_col, "content_hash"]]

    kept = hash_aggregate(
        docs.map_batches(quality_gate, batch_format="pandas")
            .map_batches(hash_text, batch_format="pandas"),
        keys=["content_hash"], aggs={id_col: "min"}, n_partitions=None,
    )

    def assign_split(b: pd.DataFrame) -> pd.DataFrame:
        if pd.api.types.is_integer_dtype(b[id_col]):
            h = _id_hash32(b[id_col])  # mod-first: exact for any int64 id
        else:
            # string/UUID ids (supported by the sibling dedup facades):
            # deterministic cross-process hash, same 80/10/10 semantics
            h = pd.util.hash_pandas_object(b[id_col], index=False).to_numpy()
        bucket = (h % 100).astype("int64")
        return pd.DataFrame(
            {id_col: b[id_col],
             "split": np.where(bucket < 80, "train",
                               np.where(bucket < 90, "val", "test"))}
        )

    return kept.map_batches(assign_split, batch_format="pandas")


def dedup_survivors(
    docs: "rd.Dataset",
    method: str = "minhash",
    threshold: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Ids kept after collapsing each near-dup cluster to its minimum-id
    representative — :func:`dedup_clusters` followed by the hash-exchange
    anti-join (stages/dedup.py:keep_representatives)."""
    from ocr_ray.stages.dedup import keep_representatives

    clusters = dedup_clusters(
        docs, method=method, threshold=threshold,
        text_col=text_col, id_col=id_col,
    )
    return keep_representatives(docs, clusters, id_col=id_col)


def novelty_scores(
    docs: "rd.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "rd.Dataset":
    """Per-doc fraction of distinct 3-word shingles first seen in that doc
    (stages/dedup.py:shingle_novelty) — flags near-total rehashes that slip
    past pairwise thresholds."""
    from ocr_ray.stages.dedup import shingle_novelty

    return shingle_novelty(docs, text_col=text_col, id_col=id_col)


def shuffle_deterministic(
    ds: "rd.Dataset", id_col: str = "doc_id", n_buckets: int = 4096
) -> "rd.Dataset":
    """Reproducible global shuffle (stages/shuffle.py): adds an exact
    global position under a bijective hash order — no random_shuffle
    materialization, no sort range-shuffle."""
    from ocr_ray.stages.shuffle import deterministic_shuffle

    return deterministic_shuffle(ds, id_col=id_col, n_buckets=n_buckets)


def pack_sequences(
    ds: "rd.Dataset",
    budget: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> "rd.Dataset":
    """Concat-and-chunk sequence packing (stages/shuffle.py): assigns each
    doc its fixed-token-budget training bin via an exact distributed
    prefix-sum over the deterministic shuffle order."""
    from ocr_ray.stages.shuffle import deterministic_pack

    return deterministic_pack(ds, budget=budget, text_col=text_col,
                              id_col=id_col, n_buckets=n_buckets)


def dedup_against_corpus(
    corpus: "rd.Dataset",
    shard: "rd.Dataset",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Incremental crawl-refresh dedup (stages/dedup.py): shingle
    containment of each new-shard doc against the existing corpus —
    flags near-copies without re-clustering the corpus."""
    from ocr_ray.stages.dedup import incremental_containment

    return incremental_containment(corpus, shard, threshold=threshold,
                                   text_col=text_col, id_col=id_col)


def cluster_embeddings(
    ds: "rd.Dataset",
    k: int = 8,
    iters: int = 2,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """Exact-integer distributed k-means (stages/cluster.py) — the
    SemDeDup cluster-then-curate primitive; bit-identical trajectory
    across partitionings."""
    from ocr_ray.stages.cluster import kmeans_embeddings

    return kmeans_embeddings(ds, k=k, iters=iters, embed_col=embed_col,
                             id_col=id_col)


def rank_by_value(
    ds: "rd.Dataset",
    value_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> "rd.Dataset":
    """Exact global rank/percentile by an integer column without a sort
    shuffle (stages/shuffle.py:value_rank) — top-X% selection and
    curriculum ordering."""
    from ocr_ray.stages.shuffle import value_rank

    return value_rank(ds, value_col, id_col=id_col, n_buckets=n_buckets)


def rank_within_groups(
    ds: "rd.Dataset",
    group_col: str,
    quota: int | None = None,
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> "rd.Dataset":
    """Exact per-group rank under the deterministic shuffle order
    (stages/shuffle.py:grouped_rank) — reproducible per-domain quota
    sampling without a global sort."""
    from ocr_ray.stages.shuffle import grouped_rank

    return grouped_rank(ds, group_col, id_col=id_col, quota=quota,
                        n_buckets=n_buckets)


def dedup_semantic_embeddings(
    ds: "rd.Dataset",
    k: int = 8,
    iters: int = 2,
    dist_threshold: int = 1_300_000_000_000,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """SemDeDup (stages/cluster.py): flag vectors within an exact
    fixed-point L2 ball of a lower-id same-cluster member; clustering
    bounds the pairwise work."""
    from ocr_ray.stages.cluster import semantic_dedup

    return semantic_dedup(ds, k=k, iters=iters,
                          dist_threshold=dist_threshold,
                          embed_col=embed_col, id_col=id_col)


def remove_duplicate_blocks(
    docs: "rd.Dataset",
    w: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """CCNet/MassiveText-style boilerplate removal (stages/dedup.py:
    block_dedup): blocks repeated across >= min_docs docs are dropped
    from every doc; survivors rejoined in order."""
    from ocr_ray.stages.dedup import block_dedup

    return block_dedup(docs, w=w, min_docs=min_docs, text_col=text_col,
                       id_col=id_col)


def lm_quality_score(
    docs: "rd.Dataset",
    threshold_ppm: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Corpus-trained hashed bigram LM score per doc (stages/lm.py) —
    the CCNet/KenLM-style perplexity quality gate: train on pass 1,
    broadcast the tables, score in a pure map_batches pass 2."""
    from ocr_ray.stages.lm import lm_score

    return lm_score(docs, threshold_ppm=threshold_ppm, text_col=text_col,
                    id_col=id_col)


def quality_classify(
    docs: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    filter_kept: bool = False,
) -> "rd.Dataset":
    """Fasttext-style hashed linear quality classifier
    (stages/classify.py): per-doc integer logit, bounded score and keep
    flag — pure map_batches, no shuffle.  ``filter_kept=True`` applies the
    gate and returns the surviving docs with text."""
    from ocr_ray.stages.classify import classifier_filter, classify_documents

    if filter_kept:
        return classifier_filter(docs, text_col=text_col, id_col=id_col)
    return classify_documents(docs, text_col=text_col, id_col=id_col)


def distinct_shingles_estimate(
    docs: "rd.Dataset", k: int = 256, text_col: str = "text"
) -> "rd.Dataset":
    """Bounded-memory approximate distinct-shingle count (KMV sketch,
    stages/aggregate.py:kmv_distinct_shingles): one row
    (k, kth_hash, est_distinct)."""
    from ocr_ray.stages.aggregate import kmv_distinct_shingles

    return kmv_distinct_shingles(docs, k=k, text_col=text_col)


def build_index(
    docs: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    n_partitions: "int | None" = None,
    warn_unbounded: bool = True,
) -> "rd.Dataset":
    """Term-partitioned inverted index (stages/index.py:build_postings):
    one row per term with df, tf_total and the ascending doc-id postings
    list.  Pass ``max_df`` (gate: 2*df <= max_df) to drop stop-term giants
    before they skew a partition; ``max_df=None`` warns (unbounded rows)
    unless acknowledged with ``warn_unbounded=False``."""
    from ocr_ray.stages.index import build_postings

    return build_postings(
        docs, id_col=id_col, text_col=text_col,
        max_df=max_df, n_partitions=n_partitions,
        warn_unbounded=warn_unbounded,
    )


def search_index(postings: "rd.Dataset", terms: list) -> list:
    """Conjunctive AND retrieval over a built index
    (stages/index.py:conjunctive_lookup): doc ids containing every term,
    ascending; cost bounded by the query terms' postings, not the corpus."""
    from ocr_ray.stages.index import conjunctive_lookup

    return conjunctive_lookup(postings, terms)


def resample_mixture(
    ds: "rd.Dataset",
    weights: dict,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Deterministic mixture resampling (stages/sample.py): downsample
    each group to hit a target weight vector — integer-exact keep rates,
    no RNG, no shuffle, no upsampling."""
    from ocr_ray.stages.sample import mixture_resample

    return mixture_resample(ds, weights, group_col=group_col, id_col=id_col)


def quantized_search(
    ds: "rd.Dataset",
    query: "object",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "object":
    """KNN over int8-quantized embeddings (stages/similarity.py:
    QuantizedDot) — 4x-compressed corpus, exact int64 scoring.  Top-k via
    per-block reduction (aggregate.global_topk, same plan as the
    oracle-checked embed_qknn query) instead of a full range-shuffle
    ``sort().limit(k)``; returns the k-row DataFrame."""
    from ocr_ray.stages.aggregate import global_topk
    from ocr_ray.stages.similarity import QuantizedDot, quantize_int8
    from ocr_ray.stages.taskpool import task_pool

    qm = np.asarray(query, dtype=np.float64)[None, :]
    qref = ray.put(quantize_int8(qm)[0][0])
    scored = ds.map_batches(task_pool(QuantizedDot, query_codes_ref=qref,
                                      id_col=id_col, vec_col=vec_col),
                            batch_format="pandas")
    return global_topk(scored, by=["dot", id_col], k=k,
                       descending=[True, False])


def dsir_select(
    raw: "rd.Dataset",
    target: "rd.Dataset",
    threshold_ppm: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """DSIR-style importance scoring (stages/dsir.py, arXiv:2302.03169):
    score every raw doc by its integer target/raw hashed-unigram
    frequency ratio; chain rank_by_value on ``dsir_ppm`` for an exact
    top-X% resample."""
    from ocr_ray.stages.dsir import dsir_score

    return dsir_score(raw, target, text_col=text_col, id_col=id_col,
                      threshold_ppm=threshold_ppm)


def sketch_term_counts(
    ds: "rd.Dataset", text_col: str = "text"
) -> "rd.Dataset":
    """CountMin frequency sketch over the corpus vocabulary
    (stages/aggregate.py:countmin_sketch): one bounded-memory streaming
    pass -> (r, cell, c) counter rows; estimate any term's count with
    countmin_estimate on the collected table."""
    from ocr_ray.stages.aggregate import countmin_sketch

    return countmin_sketch(ds, text_col=text_col)


def rank_graph(
    edges: "rd.Dataset",
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> pd.DataFrame:
    """Exact-integer PageRank over a weighted edge Dataset
    (stages/graph.py): edges stream once per iteration, the ppm rank
    vector broadcasts once per iteration — the domain-quality-prior
    shape of web curation."""
    from ocr_ray.stages.graph import pagerank

    return pagerank(edges, iters=iters, src_col=src_col, dst_col=dst_col,
                    w_col=w_col)


def count_triangles(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Exact per-node triangle counts (stages/graph.py:triangle_counts):
    the degree-oriented node iterator — wedge volume bounded ~m^1.5, every
    stage a hash exchange — for clustering-coefficient / community
    signals over a link graph."""
    from ocr_ray.stages.graph import triangle_counts

    return triangle_counts(edges, src_col=src_col, dst_col=dst_col,
                           n_partitions=n_partitions)


def gopher_filter(
    docs: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    filter_kept: bool = False,
    min_stop_hits: int = 2,
) -> "rd.Dataset":
    """Gopher quality-rule bundle (Rae et al. 2021 Table A1 analog,
    stages/analysis.py:gopher_rules_batch): per-doc rule signals +
    composite keep flag, integer-exact thresholds.  ``filter_kept=True``
    applies the gate and returns surviving (id, text) rows.
    ``min_stop_hits`` defaults to the published 2; pass 1 over corpora
    whose vocabulary rarely carries the canonical stop words.  Pure
    map_batches — runs inline with the read at any scale."""
    import functools

    from ocr_ray.stages.analysis import gopher_rules_batch

    rules = functools.partial(gopher_rules_batch, min_stop_hits=min_stop_hits)

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b[id_col], "text": b[text_col]})

    scored = docs.map_batches(rename, batch_format="pandas").map_batches(
        rules, batch_format="pandas"
    )
    if not filter_kept:
        return scored

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        g = rules(pd.DataFrame({"doc_id": b[id_col], "text": b[text_col]}))
        return b.loc[g["keep"].to_numpy(), [id_col, text_col]]

    return docs.map_batches(gate, batch_format="pandas")


def screen_against_corpus(
    corpus: "rd.Dataset",
    shard: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Bloom-filter corpus membership (stages/bloom.py:bloom_screen): one
    streaming pass summarizes the corpus into a fixed m-bit filter, then
    the shard is screened with k probes per doc — (doc_id, key62,
    in_corpus).  No false negatives; false-positive rate set by m vs
    corpus cardinality.  Filter state is O(m) regardless of corpus size."""
    from ocr_ray.stages.bloom import bloom_screen

    return bloom_screen(corpus, shard, text_col=text_col, id_col=id_col)


def distinct_terms_estimate(docs: "rd.Dataset", text_col: str = "text") -> "rd.Dataset":
    """HyperLogLog distinct-term estimate (stages/aggregate.py:
    hll_distinct_terms): fixed 256-register state, order-free maxima —
    bit-identical sketch under any partitioning.  One row:
    (m, n_zero_registers, sum_rho, est_raw, est_distinct)."""
    from ocr_ray.stages.aggregate import hll_distinct_terms

    return hll_distinct_terms(docs, text_col=text_col)


def reduce_dimensions(
    embeddings: "rd.Dataset",
    r_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "rd.Dataset":
    """Random-projection dimensionality reduction (similarity.py:RPReducer,
    Achlioptas-style ±1 JL): int8-quantize then sign-project — every
    reduced component an exact int64.  Returns exploded (id, b, y) rows;
    pivot or regroup downstream for KNN over the cheap space."""
    from ocr_ray.stages.similarity import rp_reduce

    return rp_reduce(embeddings, r_dim=r_dim, dim=dim,
                     id_col=id_col, vec_col=vec_col)


def export_jsonl(
    ds: "rd.Dataset",
    out_dir: str,
    columns: Optional[List[str]] = None,
) -> None:
    """Write a Dataset as sharded JSONL (the trainer-ingest sibling of the
    parquet sinks; S5 writer surface).  One .json file per block — shard
    count follows the pipeline's parallelism, so a failed export can be
    re-run per partition like the parquet layout; never one giant file."""
    if columns:
        ds = ds.select_columns(columns)
    ds.write_json(out_dir)


def train_bpe(sf_dir: str):
    """Distributed BPE merge-table learning over the corpus word
    vocabulary (pipelines/queries.py:q_bpe_train): one corpus scan builds
    the weighted vocab, each round explodes pair partials into a bounded
    hash aggregate and applies the argmax merge with \\b-anchored
    left-to-right regex semantics."""
    from ocr_ray.pipelines.queries import q_bpe_train

    return q_bpe_train(sf_dir)


def fuzzy_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_id: str = "left_id",
    left_name: str = "left_name",
    right_id: str = "right_id",
    right_name: str = "right_name",
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Record linkage at edit distance <= 1 (stages/join.py:
    fuzzy_join_ed1): SymSpell deletion-signature blocking — provably
    exact recall, O(rows x strlen) signatures, never the cross
    product."""
    from ocr_ray.stages.join import fuzzy_join_ed1

    return fuzzy_join_ed1(left, right, left_id=left_id, left_name=left_name,
                          right_id=right_id, right_name=right_name,
                          n_partitions=n_partitions)


def latest_per_key(
    ds: "rd.Dataset",
    key: str,
    order_cols: list,
    n_partitions: "int | None" = None,
    on_tie: str = "raise",
) -> "rd.Dataset":
    """CDC / upsert compaction: last-write-wins row per key by
    ``order_cols`` — per-batch argmax partial, one key exchange, second
    argmax (the shape of pipelines/queries.py:q_events_latest).

    ``order_cols`` must be a TOTAL order per key for the winner to be
    deterministic across runs/partitionings: the sort is stable
    (mergesort), so rows tied on every order col resolve by arrival
    order, which a distributed input does not fix.  The contract is
    ENFORCED, not just documented: with ``on_tie="raise"`` (default) the
    per-batch partial keeps EVERY row tying its batch-max order tuple
    (folding them to one there would hide a co-batched tie from the
    exchange), and the post-exchange pass — where each key is fully
    co-located — raises ValueError naming the offending keys iff the
    GLOBAL winner's (key, *order_cols) tuple is duplicated.  A tie that
    loses to a strictly greater tuple never raises, under any
    partitioning; a winning tie always does.  Extra exchange traffic
    exists only for pathological (tied) keys.  Callers who have proven
    their order total (or accept arrival-order winners) pass
    ``on_tie="allow"`` for the original single-row partial.  Callers
    merging two streams with equal order values (e.g. a change row
    carrying the same version as its base row) must append an explicit
    precedence column — see :func:`apply_upserts`."""
    from ocr_ray.stages.join import exchange_map_partitions

    if on_tie not in ("raise", "allow"):
        raise ValueError(
            f"latest_per_key: on_tie must be 'raise' or 'allow', "
            f"got {on_tie!r}")

    def latest(b):
        if not len(b):
            return b
        b = b.sort_values([key, *order_cols], kind="mergesort")
        return b.groupby(key, as_index=False).tail(1)

    def keep_max_ties(b):
        # all rows equal to their key's batch-max order tuple survive to
        # the exchange (NaN == NaN, like SQL DISTINCT); NaN keys drop,
        # matching the groupby(...).tail(1) path.  The batch-max tuple is
        # the POSITIONALLY last row of each (contiguous, post-sort) key
        # group — groupby.transform("last") skips NaN, so a key whose
        # sorted-max order tuple contains a null would elect the max
        # NON-null row here while the on_tie="allow" tail(1) path elects
        # the NaN row: a silent winner divergence (round-4 advisory).
        if not len(b):
            return b
        b = b.sort_values([key, *order_cols], kind="mergesort")
        n = len(b)
        ks = b[key].reset_index(drop=True)
        # pandas .eq + fillna(False) instead of a raw numpy != — a
        # nullable-extension key (Int64/string with pd.NA) would make
        # `kv[:-1] == kv[1:]` yield pd.NA and crash the bool cast; NA/NaN
        # keys become singleton groups either way and are dropped below
        same = ks.eq(ks.shift()).fillna(False).to_numpy(dtype=bool)
        is_last = np.ones(n, dtype=bool)
        is_last[:-1] = ~same[1:]
        ends = np.flatnonzero(is_last)
        group_id = np.zeros(n, dtype=np.int64)
        group_id[1:] = np.cumsum(is_last[:-1])
        last_pos = ends[group_id]
        m = pd.Series(b[key]).notna().to_numpy()
        for c in order_cols:
            vs = b[c].reset_index(drop=True)
            lastv = vs.iloc[last_pos].reset_index(drop=True)
            m &= (vs.eq(lastv) | (vs.isna() & lastv.isna())).to_numpy()
        return b[m]

    def latest_checked(b):
        if not len(b):
            return b
        b = b.sort_values([key, *order_cols], kind="mergesort")
        tied = b.duplicated(subset=[key, *order_cols], keep=False)
        winner = ~b.duplicated(subset=[key], keep="last")
        bad = (tied & winner).to_numpy()
        if bad.any():
            ks = b.loc[bad, key].unique()[:5].tolist()
            raise ValueError(
                f"latest_per_key: {int(bad.sum())} key(s) have multiple "
                f"rows tied on ALL of order_cols={list(order_cols)} "
                f"(e.g. {key}={ks}) — the winner would be arrival-order "
                f"nondeterministic. Append a precedence column (see "
                f"apply_upserts) or pass on_tie='allow'.")
        return b.groupby(key, as_index=False).tail(1)

    if on_tie == "allow":
        partial = ds.map_batches(latest, batch_format="pandas")
        return exchange_map_partitions(partial, key, latest, n_partitions)
    partial = ds.map_batches(keep_max_ties, batch_format="pandas")
    return exchange_map_partitions(partial, key, latest_checked,
                                   n_partitions)


def gram_matrix(
    embeddings: "rd.Dataset",
    dim: int = 64,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact int64 Gram matrix X^T X over int8-quantized embeddings
    (the covariance/whitening building block): per-batch D x D partial
    outer products reduced through the bounded hash exchange —
    O(batches x D^2) exchange traffic, independent of N.  Returns the
    upper triangle as (i, j, g) rows."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.similarity import _as_matrix, quantize_int8

    iu, ju = np.triu_indices(dim)

    def partial_gram(b: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(b[vec_col], dim)  # shape-correct on zero-row batches
        codes, _ = quantize_int8(m)
        g = codes.T @ codes
        return pd.DataFrame(
            {"i": iu.astype("int64"), "j": ju.astype("int64"), "g": g[iu, ju]}
        )

    out = hash_aggregate(
        embeddings.map_batches(partial_gram, batch_format="pandas"),
        keys=["i", "j"], aggs={"g": "sum"}, n_partitions=None,
    ).to_pandas()
    if "g" not in out.columns:
        # empty embeddings: the gram of a zero-row matrix is all zeros
        # (to_pandas drops columns on an all-empty aggregate)
        return pd.DataFrame({"i": iu.astype("int64"),
                             "j": ju.astype("int64"),
                             "g": np.zeros(len(iu), dtype="int64")})
    out["g"] = out["g"].astype("int64")
    return out


def winnow_fingerprints(
    docs: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Winnowing fingerprint selection (Schleimer et al. SIGMOD'03 — the
    MOSS scheme; stages/analysis.py:winnow_docs_batch): one (doc_id, pos,
    fp) row per selected k-gram hash.  Any shared token run of
    >= WINNOW_W + WINNOW_K - 1 tokens between two docs shares a
    fingerprint.  Pure per-row map, no shuffle."""
    from ocr_ray.stages.analysis import winnow_docs_batch

    if text_col != "text" or id_col != "doc_id":
        # select first: a pre-existing unrelated 'text'/'doc_id' column
        # would otherwise survive the rename as a duplicate label
        docs = docs.map_batches(
            lambda b: b[[id_col, text_col]].rename(
                columns={id_col: "doc_id", text_col: "text"}),
            batch_format="pandas",
        )
    return docs.map_batches(winnow_docs_batch, batch_format="pandas")


def detect_overlap(sf_dir: str) -> "rd.Dataset":
    """End-to-end MOSS overlap candidates over the documents table
    (pipelines/queries.py:q_doc_overlap): winnow fingerprints exchanged by
    fp with a df<=32 boilerplate gate, per-pair shared-fingerprint
    counts."""
    from ocr_ray.pipelines.queries import q_doc_overlap

    return q_doc_overlap(sf_dir)


def build_sft_examples(sf_dir: str) -> "rd.Dataset":
    """The full transcript->SFT-examples curation composite
    (__ray_entry__._q_pipeline_sft): extraction -> role-alternation gate
    -> (prompt, completion) example build with a last-3-turns context
    window -> corpus-wide keep-first completion dedup."""
    import __ray_entry__ as entry

    return entry._q_pipeline_sft(sf_dir)


def dedup_conversations(sf_dir: str) -> "rd.Dataset":
    """Conversation-level MinHash near-dup pairs over assembled dialogue
    texts (__ray_entry__._q_transcripts_convdedup): 32x2 banding gives
    provable recall at the 0.8 shingle-Jaccard verify threshold."""
    import __ray_entry__ as entry

    return entry._q_transcripts_convdedup(sf_dir)


def compact_output(
    in_dir: str,
    out_dir: str,
    target_mb: int = 128,
) -> int:
    """Small-files compaction — the lakehouse maintenance op for outputs
    written incrementally (many small parquet fragments read slowly and
    bloat metadata): stream the directory, repartition to
    ``ceil(total_bytes / target_mb)`` blocks, rewrite.  Returns the
    number of output blocks.  Row contents are untouched; only the file
    layout changes (one all-to-all move of the data, the unavoidable
    cost of re-binning)."""
    import math
    import os

    ds = rd.read_parquet(in_dir)
    # size from the input files ON DISK: the in-memory Arrow estimate is
    # several-fold larger than serialized parquet for text-heavy tables,
    # which would undershoot target_mb badly
    size = sum(os.path.getsize(f) for f in ds.input_files()) or 1
    n_blocks = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    ds.repartition(n_blocks).write_parquet(out_dir)
    return n_blocks


def find_duplicated_spans(docs: "rd.Dataset", L: int = 8) -> "rd.Dataset":
    """Exact duplicated-span detection (Lee et al. 2022 ExactSubstr
    analog; stages/dedup.py:duplicated_spans): maximal token spans whose
    every L-token window occurs elsewhere in the corpus."""
    from ocr_ray.stages.dedup import duplicated_spans

    return duplicated_spans(docs, L=L)


def remove_duplicated_spans(docs: "rd.Dataset", L: int = 8) -> "rd.Dataset":
    """ExactSubstr removal: splice duplicated spans out of each document,
    with per-doc token accounting (stages/dedup.py:
    remove_duplicated_spans)."""
    from ocr_ray.stages.dedup import remove_duplicated_spans as _rm

    return _rm(docs, L=L)


def drift_by_source(sf_dir: str):
    """Per-source term-distribution drift (exact ppm total variation;
    pipelines/queries.py:q_corpus_drift)."""
    from ocr_ray.pipelines.queries import q_corpus_drift

    return q_corpus_drift(sf_dir)


def detect_anomalies(sf_dir: str):
    """Hampel-rule (median/3xMAD) daily volume anomalies per event type
    (pipelines/queries.py:q_events_anomaly)."""
    from ocr_ray.pipelines.queries import q_events_anomaly

    return q_events_anomaly(sf_dir)


def apply_upserts(
    base: "rd.Dataset",
    changes: "rd.Dataset",
    key: str,
    order_cols: list,
    out_dir: str,
) -> None:
    """CDC MERGE/upsert apply — the lakehouse compaction sink: union the
    base table with the change stream, keep the last-write-wins row per
    key by ``order_cols`` (the latest_per_key exchange), write the
    compacted result as partitioned parquet.  Deletes are modeled as
    change rows a downstream filter drops (soft-delete column), matching
    standard CDC practice.

    A change row tied with its base row on every order col wins
    deterministically (standard CDC merge expectation): each side is
    tagged with a precedence flag (base=0, change=1) appended as the
    final order col, then dropped from the output."""
    def _tag(prec: int):
        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_cdc_prec"] = np.int64(prec)
            return b
        return tag

    merged = latest_per_key(
        base.map_batches(_tag(0), batch_format="pandas").union(
            changes.map_batches(_tag(1), batch_format="pandas")
        ),
        key,
        [*order_cols, "_cdc_prec"],
    )
    merged.drop_columns(["_cdc_prec"]).write_parquet(out_dir)


def write_clustered(
    ds: "rd.Dataset",
    col: str,
    out_dir: str,
) -> None:
    """Sort-clustered parquet write — the data-layout optimization that
    makes read-side pruning work: rows are globally sorted by ``col`` so
    each output file covers a disjoint key range, and a later
    ``read_parquet(columns=..., filter=...)`` on that column skips whole
    files/row-groups instead of scanning.  One all-to-all (the sort) at
    write time buys every future selective read."""
    ds.sort(col).write_parquet(out_dir)


def join_skewed(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: "str | None" = None,
    how: str = "inner",
    left_key_source: "rd.Dataset | None" = None,
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Skew-aware equi-join (stages/join.py:skew_join): Misra-Gries
    hot-key detection + salt-and-replicate exchange, so a key holding
    percent-level row share of the left side spreads across all merge
    tasks instead of serializing one.  Pass ``left_key_source`` as a
    key-column-pruned read of the same input to keep the detection pass
    one-column cheap."""
    from ocr_ray.stages.join import skew_join

    return skew_join(left, right, on=on, right_on=right_on, how=how,
                     left_key_source=left_key_source,
                     n_partitions=n_partitions)


def join_adaptive(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: "str | None" = None,
    how: str = "inner",
    left_key_source: "rd.Dataset | None" = None,
    n_partitions: "int | None" = None,
    min_hot_rows: int = 50_000_000,
) -> "rd.Dataset":
    """AQE-style join dispatch (stages/join.py:adaptive_join): one
    Misra-Gries hot-key probe, then plain exchange below the measured
    skew crossover and salt-and-replicate above it (or whenever the
    heaviest key's estimated bytes exceed a worker's heap budget —
    where salting is mandatory, not just faster)."""
    from ocr_ray.stages.join import adaptive_join

    return adaptive_join(left, right, on=on, right_on=right_on, how=how,
                         left_key_source=left_key_source,
                         n_partitions=n_partitions,
                         min_hot_rows=min_hot_rows)


def join_selective(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: "str | None" = None,
    how: str = "inner",
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Bloom-prefiltered equi-join (stages/join.py:bloom_pruned_join):
    when only a sliver of the big left side matches, the right side's
    keys broadcast as a fixed-size Bloom mask and non-matching left rows
    drop inside the scan stage — the exchange ships matches plus rare
    false positives (removed exactly at the merge)."""
    from ocr_ray.stages.join import bloom_pruned_join

    return bloom_pruned_join(left, right, on=on, right_on=right_on,
                             how=how, n_partitions=n_partitions)


def top_terms_exact(
    docs: "rd.Dataset",
    k: int = 64,
    text_col: str = "text",
) -> "pd.DataFrame":
    """Exact heavy hitters — every term with count*k > total occurrences
    (stages/aggregate.py:heavy_hitters: Misra-Gries candidates with a
    provable superset bound, then an exact verify pass over the
    broadcast candidate set)."""
    from ocr_ray.stages.aggregate import heavy_hitters

    return heavy_hitters(docs, k=k, text_col=text_col)


def sample_weighted(sf_dir: str) -> "pd.DataFrame":
    """Deterministic length-weighted priority sample of documents
    (queries.q_doc_sample_weighted — Duffield-Lund-Thorup priority
    sampling on the multiplicative id hash, int64-exact)."""
    from ocr_ray.pipelines.queries import q_doc_sample_weighted

    return q_doc_sample_weighted(sf_dir)


def sample_per_group(sf_dir: str) -> "pd.DataFrame":
    """Deterministic per-source quota sample (k docs per source by id
    hash; queries.q_doc_sample_per_source)."""
    from ocr_ray.pipelines.queries import q_doc_sample_per_source

    return q_doc_sample_per_source(sf_dir)


def source_similarity(
    docs: "rd.Dataset",
    text_col: str = "text",
    group_col: str = "source",
) -> "pd.DataFrame":
    """Pairwise source-overlap estimates via per-source MinHash
    signatures (stages/dedup.py:source_minhash_similarity): one
    streaming corpus pass + one bounded (source, perm) exchange; the
    pairwise step runs over the tiny signature table."""
    from ocr_ray.stages.dedup import source_minhash_similarity

    return source_minhash_similarity(docs, text_col=text_col,
                                     group_col=group_col)


def cluster_balanced_sample(
    embeddings: "rd.Dataset",
    k: int = 8,
    iters: int = 2,
    cap: int = 32,
) -> "rd.Dataset":
    """Cluster-balanced curation resample (stages/cluster.py:
    cluster_cap_sample): exact-integer k-means assignment, then keep the
    ``cap`` centroid-nearest vectors per cluster through one cluster-id
    exchange."""
    from ocr_ray.stages.cluster import cluster_cap_sample

    return cluster_cap_sample(embeddings, k=k, iters=iters, cap=cap)


def quality_gate_per_group(
    docs: "rd.Dataset",
    group_col: str = "lang",
    q: float = 0.5,
) -> "rd.Dataset":
    """Per-group adaptive quality gate (stages/analysis.py:
    grouped_quantile_gate): exact PERCENTILE_DISC thresholds from a
    bounded count-histogram exchange, broadcast back for a streaming
    filter — each group keeps its own upper (1-q) tail."""
    from ocr_ray.stages.analysis import grouped_quantile_gate

    return grouped_quantile_gate(docs, group_col=group_col, q=q)


def dedup_keep_best(
    meta: "rd.Dataset",
    clusters: "rd.Dataset",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> "rd.Dataset":
    """Quality-aware near-dup collapse (stages/dedup.py:
    keep_best_representatives): per cluster keep the highest-score
    member (tie: lowest id); three bounded metadata exchanges, the
    removed set never lands on the driver."""
    from ocr_ray.stages.dedup import keep_best_representatives

    return keep_best_representatives(meta, clusters, id_col=id_col,
                                     score_col=score_col)


def select_by_token_budget(
    docs: "rd.Dataset",
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Per-group token-budget mixture selection (stages/analysis.py:
    budget_select_per_group): keep docs in id order while the group's
    cumulative token count stays within ``budget``; the exchange moves
    (id, group, n_tok) metadata only."""
    from ocr_ray.stages.analysis import budget_select_per_group

    return budget_select_per_group(docs, budget, group_col=group_col,
                                   text_col=text_col, id_col=id_col)


def winsorized_stats(
    docs: "rd.Dataset",
    group_col: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
) -> "pd.DataFrame":
    """Per-group winsorized token statistics (stages/analysis.py:
    winsorized_group_stats): integer-exact PERCENTILE_DISC clamp band
    from a bounded count-histogram exchange; all-integer output."""
    from ocr_ray.stages.analysis import winsorized_group_stats

    return winsorized_group_stats(docs, group_col=group_col, lo=lo, hi=hi)


def temperature_mix(
    docs: "rd.Dataset",
    scale: int = 1000,
    alpha_pm: int = 500,
    group_col: str = "source",
) -> "rd.Dataset":
    """Temperature-weighted mixture selection (stages/analysis.py:
    temperature_mix_select): per-group quota floor(scale * tot^alpha)
    with alpha in permille (500 = sqrt), then the deterministic
    id-order prefix selection — the alpha<1 data-mixing rule that
    upweights small sources."""
    from ocr_ray.stages.analysis import temperature_mix_select

    return temperature_mix_select(docs, scale=scale, alpha_pm=alpha_pm,
                                  group_col=group_col)


def bm25_search(
    docs: "rd.Dataset",
    query_terms: list,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> "pd.DataFrame":
    """BM25 document retrieval (stages/rag.py:bm25_topk): one text pass
    emits per-doc integer metadata, corpus stats reduce to scalars, and
    scoring + per-block top-k run over the metadata only — the text
    column is never re-scanned or shuffled."""
    from ocr_ray.stages.rag import bm25_topk

    return bm25_topk(docs, query_terms, k=k, k1=k1, b=b)


def transition_matrix(sf_dir: str) -> "pd.DataFrame":
    """Per-user event-type transition counts (queries.q_events_markov):
    one user_id exchange, vectorized consecutive-pair shift, bounded
    |event_types|^2 rollup."""
    from ocr_ray.pipelines.queries import q_events_markov

    return q_events_markov(sf_dir)


def fk_check(sf_dir: str) -> "pd.DataFrame":
    """Referential-integrity gate (queries.q_fk_violations): orphan-key
    counts per FK edge via key-column-only ANTI exchanges.  Nonzero cell
    -> quarantine the ingest shard."""
    from ocr_ray.pipelines.queries import q_fk_violations

    return q_fk_violations(sf_dir)


def transcribe_payloads(
    docs: "rd.Dataset",
    artifact_path: str,
    max_len: int = 64,
    concurrency: int = 2,
    batch_size: int = 64,
) -> "rd.Dataset":
    """Generative model-backed transcription over a binary ``payload``
    column (stages/model_engine.py:ModelTranscriber — the A5 contract:
    load-once artifact, autoregressive generate, min(1, len/100)
    confidence, in-band nulls)."""
    from ocr_ray.stages.model_engine import ModelTranscriber

    return docs.map_batches(
        ModelTranscriber,
        fn_constructor_kwargs={"artifact_path": artifact_path,
                               "max_len": max_len},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pandas",
    )


def table_diff(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key_col: str,
    compare_cols: list,
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Keyed snapshot diff (stages/validate.py:snapshot_diff): one row per
    key with status added/removed/changed/unchanged; sides ship
    (key, fingerprint) only."""
    from ocr_ray.stages.validate import snapshot_diff

    return snapshot_diff(left, right, key_col=key_col,
                         compare_cols=compare_cols,
                         n_partitions=n_partitions)


def profile(
    ds: "rd.Dataset",
    columns: list,
    n_partitions: "int | None" = None,
) -> "pd.DataFrame":
    """Per-column data profile (stages/validate.py:profile_table): one
    row per column with (col, n, n_null, n_distinct, min_str, max_str) —
    Arrow min/max partials + the exact two-level distinct plan; the
    ingest gate to run before anything else touches a new drop."""
    from ocr_ray.stages.validate import profile_table

    return profile_table(ds, columns, n_partitions=n_partitions)


def profile_distinct_approx(
    ds: "rd.Dataset",
    columns: list,
    n_partitions: "int | None" = None,
) -> "pd.DataFrame":
    """Approximate per-column distinct counts via the HLL register sketch
    (stages/aggregate.py:hll_distinct_values) — the profile() cutover for
    key-like columns where exact distinct would exchange the full key
    set; <= |columns| x 256 register rows move regardless of table
    size."""
    from ocr_ray.stages.aggregate import hll_distinct_values

    return hll_distinct_values(ds, columns, n_partitions=n_partitions)


def reconcile(sf_dir: str) -> "pd.DataFrame":
    """Cross-table aggregate reconciliation
    (queries.q_orders_reconcile): do order-header totals equal the sum
    over their lines, in exact undivided integer units?  One combiner +
    orderkey exchange; single summary row (n_orders, n_no_lines,
    n_match, n_mismatch, max_abs_diff)."""
    from ocr_ray.pipelines.queries import q_orders_reconcile

    return q_orders_reconcile(sf_dir)


def attribute_last_touch(sf_dir: str) -> "pd.DataFrame":
    """Last-touch attribution (queries.q_events_attribution): for every
    purchase, the same user's latest strictly-preceding click within a
    7-day lookback — one user_id exchange, vectorized forward-carry, no
    self-join."""
    from ocr_ray.pipelines.queries import q_events_attribution

    return q_events_attribution(sf_dir)


def compact_parquet_dir(
    in_dir: str,
    out_dir: str,
    target_rows: int = 1 << 20,
) -> int:
    """Small-file compaction — the maintenance op every resumable
    partitioned layout eventually needs: a long-running pipeline's
    per-partition writes leave hundreds of tiny parquet files whose
    open/footer overhead dominates re-reads.  Streams the fragmented
    directory and rewrites it as ``ceil(n / target_rows)`` right-sized
    files (``repartition`` without shuffle — a coalesce/split of blocks,
    no all-to-all).  Returns the output file count.

    At 100 TB run this PER PARTITION DIRECTORY (one compaction job per
    ``key=value`` subdir), preserving the partition layout and its
    resume semantics — never against the root of a huge layout, which
    would serialize the whole table through one repartition."""
    import math

    ds = rd.read_parquet(in_dir)
    n = ds.count()  # parquet metadata fast path — no data scan
    n_files = max(1, math.ceil(n / target_rows))
    ds.repartition(n_files).write_parquet(out_dir)
    return n_files


def pca(
    embeddings: "rd.Dataset",
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """PCA fit + project (stages/cluster.py:pca_project): exact int64
    sufficient statistics (per-dim sums + int8-code Gram through one
    bounded exchange), one driver-side eigh, sign-pinned components
    broadcast once — every partitioning sees the identical basis."""
    from ocr_ray.stages.cluster import pca_project

    return pca_project(embeddings, k=k, dim=dim, vec_col=vec_col,
                       id_col=id_col, n_partitions=n_partitions)


def trend_per_group(sf_dir: str) -> "pd.DataFrame":
    """Grouped OLS trend (queries.q_events_trend): slope of daily count
    on day index per event type, fit from five exact integers per group
    and reported as the cross-multiplied rational (num, den) — no rows
    move, no float drift, degenerate single-day groups surface den=0."""
    from ocr_ray.pipelines.queries import q_events_trend

    return q_events_trend(sf_dir)


def correlation_per_group(sf_dir: str) -> "pd.DataFrame":
    """Grouped Pearson correlation (queries.q_events_corr): value-vs-day
    drift per type from five exact-int64 sufficient statistics; exact
    integer components plus r as the both-sides-identical float."""
    from ocr_ray.pipelines.queries import q_events_corr

    return q_events_corr(sf_dir)


def moving_window(sf_dir: str) -> "pd.DataFrame":
    """Rows-based sliding window (queries.q_events_moving): per-user
    SUM/COUNT over each event's last-4-rows frame via one exchange and a
    prefix-sum — exact integer cents."""
    from ocr_ray.pipelines.queries import q_events_moving

    return q_events_moving(sf_dir)


def summarize(sf_dir: str) -> "rd.Dataset":
    """Extractive summaries (queries.q_doc_summary): Luhn significant-word
    scoring over the shared sentence splitter, top-2 sentences in
    position order, embarrassingly parallel."""
    from ocr_ray.pipelines.queries import q_doc_summary

    return q_doc_summary(sf_dir)


def readability(sf_dir: str) -> "rd.Dataset":
    """Flesch reading-ease per document (queries.q_doc_readability):
    three exact integer counts from vectorized str.count kernels, the
    score derived identically on both sides."""
    from ocr_ray.pipelines.queries import q_doc_readability

    return q_doc_readability(sf_dir)


def value_histogram(sf_dir: str) -> "pd.DataFrame":
    """Equi-width value histogram per event type
    (queries.q_events_histogram): one (type, bin) combiner + bounded
    exchange; output bounded by occupied bins, not rows."""
    from ocr_ray.pipelines.queries import q_events_histogram

    return q_events_histogram(sf_dir)
