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
) -> pd.DataFrame:
    """Near-duplicate pairs (left_id < right_id) by the chosen method.

    ``exact``: identical text.  ``minhash``: shingle MinHash+LSH candidates
    verified by true shingle Jaccard >= threshold.  ``simhash``: band-bucket
    candidates verified by Hamming <= 16.
    """
    from ocr_ray.stages.dedup import (
        MinHasher,
        SimHasher,
        add_content_hash,
        bucket_pairs,
        jaccard_sets,
        shingle_set,
    )

    if method == "exact":
        hashed = docs.map_batches(
            lambda b: add_content_hash(b, col=text_col), batch_format="pandas"
        ).to_pandas()
        out_l, out_r = [], []
        for _, g in hashed.groupby("content_hash"):
            ids = sorted(g[id_col])
            out_l.extend(ids[0] for _ in ids[1:])
            out_r.extend(ids[1:])
        return pd.DataFrame({"left_id": out_l, "right_id": out_r})

    if method in ("minhash", "simhash"):
        cls = MinHasher if method == "minhash" else SimHasher
        kwargs = (
            {"n_perm": 64, "n_bands": 16, "shingle_k": 3}
            if method == "minhash"
            else {"n_bands": 8, "shingle_k": 3}
        )
        rows = docs.map_batches(
            cls, batch_format="pandas", concurrency=2,
            fn_constructor_kwargs={**kwargs, "text_col": text_col, "id_col": id_col},
        ).materialize()
        bucket_cols = (
            ["band_id", "band_hash"] if method == "minhash" else ["band_id", "band_key"]
        )
        cands = (
            bucket_pairs(rows, bucket_cols, id_col=id_col)
            .to_pandas()
            .drop_duplicates(["left_id", "right_id"])
        )
        pdf = docs.select_columns([id_col, text_col]).to_pandas()
        if method == "minhash":
            sets = {i: shingle_set(t, 3) for i, t in zip(pdf[id_col], pdf[text_col])}
            jac = np.array(
                [jaccard_sets(sets[l], sets[r])
                 for l, r in zip(cands["left_id"], cands["right_id"])]
            ) if len(cands) else np.array([])
            keep = jac >= threshold
        else:
            sig_df = rows.to_pandas().drop_duplicates(id_col)
            sigs = pd.Series(sig_df["simhash"].to_numpy(dtype=np.uint64),
                             index=sig_df[id_col])
            if len(cands):
                xor = (sigs.loc[cands["left_id"]].to_numpy()
                       ^ sigs.loc[cands["right_id"]].to_numpy())
                ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                keep = ham <= 16
            else:
                keep = np.array([], dtype=bool)
        return (
            cands[keep].reset_index(drop=True)
            if len(cands)
            else pd.DataFrame({"left_id": [], "right_id": []})
        )

    raise ValueError(f"unknown dedup method: {method}")


def cosine_topk(
    embeddings: "rd.Dataset",
    query: "Sequence[float] | np.ndarray",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Brute-force cosine top-k of ``query`` against an embedding Dataset
    (broadcast query, per-batch matmul, global sort + limit)."""
    from ocr_ray.stages.similarity import CosineTopK

    qref = ray.put(np.asarray(query, dtype=np.float64))
    scored = embeddings.map_batches(
        CosineTopK, batch_format="pandas", concurrency=2,
        fn_constructor_kwargs={"query_ref": qref, "id_col": id_col, "vec_col": vec_col},
    )
    return scored.sort(["sim", id_col], descending=[True, False]).limit(k).to_pandas()
