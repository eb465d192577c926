"""Distributed joins.

Two strategies, chosen by side size (guide: Joins and lookups):

* :func:`broadcast_join` — small side shipped once via ``ray.put`` and
  merged per batch inside ``map_batches``; no shuffle.
* :func:`hash_join` — both sides large: add ``bucket = hash(key) % B`` to
  each side, tag provenance, union, ``groupby(bucket)`` and merge the two
  sides pairwise inside ``map_groups``.  One all-to-all on the bucket key;
  hot keys can be salted by raising B.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def broadcast_join(
    large: "rd.Dataset",
    small_df: pd.DataFrame,
    on: str,
    how: str = "inner",
) -> "rd.Dataset":
    ref = ray.put(small_df)

    def merge_batch(b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(ray.get(ref), on=on, how=how)

    return large.map_batches(merge_batch, batch_format="pandas")


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    n_partitions: int = 32,
    how: str = "inner",
    right_on: Optional[str] = None,
) -> "rd.Dataset":
    """Both-sides-large join via Ray Data's native hash-partitioned
    ``Dataset.join`` (one all-to-all per side on the key hash).  Skewed keys:
    raise ``n_partitions``; pathological single hot keys should be broadcast
    or salted upstream instead of joined here."""
    return left.join(
        right,
        join_type=how,
        num_partitions=n_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )
