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
