"""Distributed hash-partitioned aggregation for high-cardinality keys.

``Dataset.groupby(key).aggregate(...)`` degrades with the number of distinct
keys (measured: 31 s for a 150k-row sum over 15k keys at 32 CPUs, vs 2.4 s
for the same shape with ~100 keys) and even the bounded-partition
``groupby(pk).map_groups`` variant pays a ~1.5-2 s fixed sort-shuffle cost
per call.  The classic two-level plan over the raw-task hash exchange is
both exact and the cheapest shape:

1. partial-aggregate inside ``map_batches`` (combiner: one pandas groupby
   per batch — output is at most #keys-per-batch rows);
2. hash-exchange the partials on the key columns (split tasks launch AS
   upstream blocks materialize — streaming, no barrier);
3. one combine task per partition finishes with a single pandas groupby.

All rows of one key share a partition, so the combine is exact.
``n_partitions`` bounds reduce-task parallelism — size it ~2-4x the cluster
cores for skew resilience; the shuffle payload is the *partially
aggregated* table, not the input.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd

import ray.data

_COMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def hash_aggregate(
    ds: "ray.data.Dataset",
    keys: List[str],
    aggs: Dict[str, str],
    n_partitions: int = 64,
) -> "ray.data.Dataset":
    """Aggregate ``aggs`` (col -> 'sum'|'min'|'max'|'count') per ``keys``.

    'count' counts input rows into the named output column; other ops apply
    to an existing column.  Output columns keep the input names.
    """
    from ocr_ray.stages.join import exchange_map_partitions

    for op in aggs.values():
        if op not in _COMBINE:
            raise ValueError(f"unsupported agg op: {op}")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        for col, op in aggs.items():
            if op == "count":
                b[col] = 1
        spec = {col: ("sum" if op == "count" else op) for col, op in aggs.items()}
        return b.groupby(keys, as_index=False).agg(spec)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        spec = {col: _COMBINE[op] for col, op in aggs.items()}
        return g.groupby(keys, as_index=False).agg(spec)

    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        keys, combine, n_partitions,
    )
