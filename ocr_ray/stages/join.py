"""Distributed joins.

Two strategies, chosen by side size (guide: Joins and lookups):

* :func:`broadcast_join` — small side shipped once via ``ray.put`` and
  merged per batch inside ``map_batches``; no shuffle.
* :func:`hash_join` — both sides large: add ``bucket = hash(key) % B`` to
  each side, tag provenance, union, ``groupby(bucket)`` and merge the two
  sides pairwise inside ``map_groups``.  One all-to-all on the bucket key;
  hot keys can be salted by raising B.

**Scheduling invariant — every raw exchange task is ``num_cpus=0``.**
The split/merge tasks here sit OUTSIDE Ray Data's resource accounting but
INSIDE its dataflow: a ``from_arrow_refs`` dataset blocks on their results
while Ray Data's actor pools (map_batches stages up- and downstream of the
exchange) hold their CPU reservations for the whole execution.  On a
cluster where chained actor pools reserve every core (measured: the
curation composites at ``num_cpus=4`` — 2 classifier + 2 LM-scorer actors
— left the 1-CPU merge tasks pending forever, a hard deadlock), ANY
positive CPU requirement on these tasks can deadlock.  ``num_cpus=0``
makes them always schedulable; concurrency stays bounded structurally —
merges by ``n_partitions`` (stages size it ~2-4x cores), splits by
upstream block count and their own short lifetime — so oversubscription
is capped and transient, while the deadlock is impossible by
construction.

**Memory invariant — heavy merge tasks carry a ``memory=`` request.**
Structural bounding is not enough at soak scale: a 12.8M-turn
conversation dedup auto-sizes to 200+ partitions, and 200 concurrent
num_cpus=0 merges each concatenating a few hundred MB of text OOM-killed
the node (observed round 4).  Each apply/merge task therefore requests
``~3x its estimated partition bytes`` from Ray's memory resource
(:func:`exchange_task_memory`) — bookkeeping-only, so no enforcement
overhead, but the scheduler now admits merges only while their summed
heap estimate fits the node, and backpressure replaces the OOM killer.
The deadlock analysis still holds: requests are capped well under the
node total, so at least one merge is always admissible, and memory is
the ONLY resource these tasks request.  ``OCR_RAY_EXCHANGE_TASK_MEMORY=0``
disables the requests (micro-benchmarks, tiny fixtures).
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional

import numpy as np
import pandas as pd

import ray
import ray.data as rd

# ~64 MB of estimated in-memory input per reduce partition (override with
# OCR_RAY_EXCHANGE_BUDGET_MB); same sizing rule as
# reassemble.assemble_conversations, lifted here per VERDICT r2 so the
# exchange layer derives partition counts from input size instead of
# hardcoded constants.
_BUDGET_ENV = "OCR_RAY_EXCHANGE_BUDGET_MB"


def _estimate_bytes(src) -> Optional[int]:
    """Metadata-only in-memory size estimate of a Dataset, or None.

    Materialized datasets know their exact size.  Lazy datasets must NOT
    be executed just to size an exchange, so we walk the logical plan to
    the leaf read ops and sum their datasources' own estimates (the same
    numbers a lazy ``read_parquet(...).size_bytes()`` reports without
    execution).  Transforms between the read and the exchange (column
    drops, partial aggregation) make this an over-estimate, which only
    errs toward more, smaller partitions — bounded by the cap below."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(src, MaterializedDataset):
            return src.size_bytes()
        if not hasattr(src, "_plan"):
            return None
        total, found = 0, False
        stack = [src._plan._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = getattr(op, "input_dependencies", None) or []
            if deps:
                stack.extend(deps)
                continue
            dsrc = getattr(op, "_datasource", None)
            est = dsrc.estimate_inmemory_data_size() if dsrc is not None else None
            if est:
                total += est
                found = True
        return total if found else None
    except Exception:
        return None


_CPU_FLOOR_CACHE: List[int] = []


def _cpu_floor() -> int:
    """Lower bound on reduce parallelism: ``min(cluster CPUs, 16)``,
    floored at 8.  Size-derived counts alone under-parallelize SMALL
    inputs on wide nodes (a 10 MB exchange would run 8 merge tasks while
    32 cores idle); the floor keeps the reduce side busy without blowing
    up tiny-object counts, and at real data sizes the size term dominates
    anyway.  Cached for the session (one GCS lookup)."""
    if not _CPU_FLOOR_CACHE:
        try:
            import ray

            if not ray.is_initialized():
                # don't poison the cache before the session exists — a
                # pre-init call would pin the floor at 8 for the whole
                # process even on a 32-core node
                return 8
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            return 8
        _CPU_FLOOR_CACHE.append(max(8, min(cpus, 16)))
    return _CPU_FLOOR_CACHE[0]


def resolve_partitions(
    src,
    explicit: Optional[int],
    default: int = 16,
    budget_mb: Optional[int] = None,
) -> int:
    """Partition count for an exchange over ``src``: the explicit value if
    the caller passed one, else ``max(cpu_floor, min(256, est/budget + 1))``
    from a metadata-only size estimate, else ``default`` (non-Dataset
    inputs, estimate unavailable).  The clamp keeps tiny inputs cheap and
    bounds per-split fan-out; at production scale pass ``n_partitions``
    explicitly (total_bytes / worker-heap budget) — 256 partitions of a
    100 TB exchange would be ~400 GB each.  Floored at 2 partitions:
    ``num_returns=1`` split tasks return a bare ObjectRef instead of a
    list, which the per-partition indexing cannot subscript (same rule
    as reassemble's sizing; the key hash still lands all rows of one key
    together).

    Hitting the 256 clamp means the budget CANNOT be honored — each
    partition will hold ~est/256 bytes regardless of ``budget_mb`` — so
    a loud RuntimeWarning fires telling the caller to size
    ``n_partitions`` themselves (the 100 TB case this auto-sizing is
    explicitly not for).  The budget accepts fractional MiB so tests can
    drive real pipelines into the clamp at small scale."""
    if explicit is not None:
        return max(2, explicit)
    if budget_mb is None:
        budget_mb = float(os.environ.get(_BUDGET_ENV, "64"))
    budget_b = max(1, int(float(budget_mb) * (1 << 20)))
    est = _estimate_bytes(src)
    if est is None:
        return default
    raw = int(est // budget_b) + 1
    if raw > 256:
        import warnings

        warnings.warn(
            f"resolve_partitions: ~{est / (1 << 20):.0f} MiB of exchange "
            f"input needs {raw} partitions to honor the "
            f"{float(budget_mb):g} MiB/partition budget, but auto-sizing "
            f"clamps at 256 (~{est / 256 / (1 << 20):.0f} MiB per "
            f"partition). Results are unaffected; to honor the memory "
            f"budget pass n_partitions explicitly "
            f"(total_bytes / per-worker heap budget).",
            RuntimeWarning, stacklevel=2)
    return max(_cpu_floor(), min(256, raw))


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


def launch_splits(
    src, by, n_partitions: int, min_rows_per_split: int = 32768
) -> List:
    """Launch split tasks over upstream blocks, STREAMING: when ``src`` is
    a Dataset, blocks are consumed via ``iter_internal_ref_bundles()`` and
    split tasks are submitted as blocks materialize — the exchange's map
    side overlaps upstream compute instead of waiting behind a full
    ``materialize()`` barrier.  (Single-consumer inputs only; multi-consumer
    datasets should be materialized once by the caller.)  A list input is
    treated as pre-made block refs.

    Consecutive small blocks are BUNDLED into one split task until
    ``min_rows_per_split`` accumulates: datasets arriving in hundreds of
    tiny blocks (small benchmark inputs; high read parallelism over small
    files) would otherwise launch a task per block and ship
    blocks x n_partitions near-empty objects per round — measured as the
    dominant cost of the dedup exchanges at sf0.1.  At production block
    sizes (>=tens of MB) a single block crosses the threshold and bundling
    degenerates to one task per block, so the streaming/backpressure shape
    at scale is unchanged."""
    if n_partitions < 2:
        # num_returns=1 yields a bare ObjectRef (not a 1-list) and the
        # callers' s[j] indexing would TypeError — resolve_partitions
        # floors at 2; a raw caller passing 1 is a bug, fail loudly
        raise ValueError("launch_splits requires n_partitions >= 2")
    # split tasks get the same memory-resource admission as merges (the
    # module-doc memory invariant): a split concats its bundle, converts
    # the key column for hashing, and emits n_partitions sub-tables —
    # observed at 0.5-2 GB heap each at soak scale, and hundreds launch
    # concurrently with num_cpus=0, so unthrottled splits OOM the node
    # even when merges are admitted correctly
    mem = exchange_task_memory(src if not isinstance(src, list) else None,
                               max(1, n_partitions))
    opts = {"num_returns": n_partitions}
    if mem:
        opts["memory"] = mem
    split = _split_blocks.options(**opts)
    if isinstance(src, list):
        # pre-made refs come from prior exchange rounds: already few and
        # partition-sized, no bundling needed
        return [split.remote(by, n_partitions, r) for r in src]
    return [
        split.remote(by, n_partitions, *refs)
        for refs in _iter_split_bundles(src, min_rows_per_split)
    ]


def _concat_tables(tables):
    """``pa.concat_tables(promote_options="default")`` with a CLEAR error
    for schema drift.  "default" unifies field order and null types but
    does NOT promote numerics, so one logical column arriving as int64 in
    some blocks and double in others (drifted shards unioned upstream)
    raises a cryptic ArrowTypeError deep in a worker task — and even if
    concat promoted, per-partition outputs would disagree on the column's
    dtype and the result Dataset's schema unification would fail anyway.
    Mixed physical dtypes for one column are an INGEST problem: normalize
    before the exchange.  (Cross-SIDE int/float join keys are fine — each
    side concats separately and the key hash + pd.merge unify by value.)"""
    import pyarrow as pa

    try:
        return pa.concat_tables(tables, promote_options="default")
    except pa.lib.ArrowTypeError as e:
        raise TypeError(
            "exchange input mixes physical dtypes for the same column "
            f"across blocks ({e}) — schema drift in the input (e.g. a "
            "union of shards where a key is int64 in some and double in "
            "others).  Normalize dtypes before the exchange: "
            "ds.map_batches(lambda b: b.astype({col: dtype}))"
        ) from e


def _concat_pd(pieces) -> pd.DataFrame:
    """Concat per-partition Arrow pieces to pandas, skipping zero-row
    pieces: empty partitions carry null-typed columns that would fail
    concat_tables schema unification.  Pandas schema metadata is stripped
    first: blocks that passed through a pandas stage with an ndarray
    column carry Ray's TensorDtype repr in the ``pandas`` metadata, which
    ``to_pandas`` cannot reconstruct outside Ray Data's block codec
    (observed at num_cpus=4 block layouts on the embedding exchanges)."""
    tables = [t.replace_schema_metadata(None) for t in pieces if t.num_rows]
    if not tables:
        return pieces[0].replace_schema_metadata(None).to_pandas()
    # promote unifies FIELD ORDER by name: pieces of a union whose two legs
    # emitted the same columns in different orders concat cleanly (observed
    # on the fuzzy-join exchange at sf0.1, where block bundling no longer
    # merges both legs into one split task)
    return _concat_tables(tables).to_pandas()


def exchange_task_memory(src, n_partitions: int) -> Optional[int]:
    """Per-merge-task ``memory=`` request in bytes.

    Two components, take the max:

    * ``3x the estimated per-partition input`` — concat copy + kernel
      working set + output (``src`` may be a Dataset, sized via
      :func:`_estimate_bytes`, or an int byte count the caller already
      knows, e.g. a materialized side's ``size_bytes()``);
    * ``memory_resource_total / cluster CPUs`` — an explicit concurrency
      ceiling of ONE exchange task per core.  Byte estimates UNDERSTATE
      pandas kernels (object-dtype strings run 3-6x the Arrow bytes),
      and at soak scale 250 under-requested concurrent merges OOM-killed
      the raylet; a 2-per-core floor still admitted ~1.4 GB requests
      against ~2.1 GB observed split heaps and lost the raylet again.
      The floor makes the admission limit independent of estimate
      quality, and splits/merges are CPU-bound so >1x cores buys no
      throughput anyway.

    SMALL-partition exemption: the flat per-core floor over-serializes
    tiny exchanges — a 10 MB bench partition carrying a ~2.8 GB request
    schedules in ~cpu-count waves, measured +0.3-0.4 s of wave latency
    per exchange across the query sweep.  When the estimate is EXACT
    (an int byte count from the caller, or a materialized dataset's
    ``size_bytes()`` — lazy leaf-read estimates understate expanding
    transforms and never qualify) AND the 3x estimate is under a
    QUARTER of the floor, the request is ``max(2 * 3x_est, 512 MB)``
    instead: 6x the true Arrow bytes covers the worst observed pandas
    widening, so the request still bounds the real heap, while the
    soak-OOM regime (large or uncertain partitions) keeps the
    estimate-independent floor unchanged.

    Clamped to <= 16 GB AND <= half the cluster's ``memory`` resource:
    a request no node can satisfy does not backpressure, it pends the
    task FOREVER (an explicit small ``n_partitions`` over a large input
    can push ``3x est/P`` past node memory while staying under the
    absolute cap) — silent hang, not admission control.  When the raw
    request exceeds the node-capacity clamp a RuntimeWarning names the
    fix (more partitions); the clamped request still serializes the
    oversized merges one-at-a-time, which is the best the scheduler can
    do for a partition that genuinely crowds the node.

    Returns None — no request — when neither component can be computed
    or the ``OCR_RAY_EXCHANGE_TASK_MEMORY=0`` kill switch is set."""
    if os.environ.get("OCR_RAY_EXCHANGE_TASK_MEMORY", "1") == "0":
        return None
    # estimate provenance matters for the exemption below: an int src or
    # a materialized dataset reports EXACT bytes; a lazy source's
    # estimate is the leaf read's size, which UNDERSTATES expanding
    # transforms (a flat_map explode between read and exchange) — the
    # exact regime the floor exists for, so only exact estimates may
    # bypass it
    exact_est = isinstance(src, int)
    if not exact_est:
        try:
            from ray.data.dataset import MaterializedDataset

            exact_est = isinstance(src, MaterializedDataset)
        except Exception:
            pass
    est = src if isinstance(src, int) else _estimate_bytes(src)
    req = 0
    est_pp3 = 0
    if est:
        est_pp3 = 3 * (est // max(1, n_partitions))
        req = max(est_pp3, 256 << 20)
    clamped_from = None
    mem_total = 0
    try:
        if ray.is_initialized():
            res = ray.cluster_resources()
            mem_total = res.get("memory", 0)
            cpus = max(1, int(res.get("CPU", 8)))
            floor = int(mem_total // cpus)
            if est and exact_est and est_pp3 < floor // 4:
                # small EXACTLY-sized partition: 2x the 3x budget
                # (>= 512 MB — a touch of absolute margin over the
                # 256 MB base floor) instead of the per-core floor;
                # see the small-partition exemption in the docstring.
                # Lazy (leaf-read) estimates never take this branch.
                req = max(2 * est_pp3, 512 << 20)
            else:
                req = max(req, floor)
            if mem_total:
                node_cap = int(mem_total // 2)
                if req > node_cap:
                    # clamp FIRST — the warn below must not be able to
                    # skip it (warnings promoted to errors would land in
                    # a blanket except and return the unsatisfiable
                    # request, resurrecting the forever-pend)
                    clamped_from, req = req, node_cap
    except Exception:
        pass
    if clamped_from is not None:
        # ceil division: the suggested count must actually bring
        # 3x est / n under node_cap, not leave it one partition short
        want_n = -(-3 * est // max(1, req)) if est else "total_bytes/cap"
        warnings.warn(
            f"exchange_task_memory: per-task request "
            f"{clamped_from >> 20} MiB exceeds half the cluster "
            f"memory resource ({int(mem_total) >> 20} MiB) and was "
            f"clamped to stay schedulable — partitions are too large "
            f"for this node; raise n_partitions (>= {want_n} for this "
            f"input) to honor the 3x heap budget.",
            RuntimeWarning, stacklevel=2)
    return int(min(req, 16 << 30)) if req else None


def _concat_pa(pieces):
    """Concat per-partition Arrow pieces to ONE metadata-free Arrow table,
    skipping zero-row pieces (they may carry pre-map/null-typed schemas
    that would fail schema unification) — the Arrow-native sibling of
    :func:`_concat_pd` for kernels that stay in pyarrow (string columns
    keep Arrow layout instead of widening to object dtype)."""
    tables = [t.replace_schema_metadata(None) for t in pieces if t.num_rows]
    if not tables:
        return pieces[0].replace_schema_metadata(None)
    if len(tables) == 1:
        return tables[0]
    return _concat_tables(tables)


@ray.remote(num_cpus=0)
def _apply_partition(fn, *pieces):
    import pyarrow as pa

    out = fn(_concat_pd(pieces))
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote(num_cpus=0)
def _apply_partition_arrow(fn, *pieces):
    return fn(_concat_pa(pieces))


def exchange_map_partitions(
    ds: "rd.Dataset", by, fn, n_partitions: Optional[int] = None,
    batch_format: str = "pandas",
) -> "rd.Dataset":
    """``groupby(key).map_groups`` semantics over the raw-task hash
    exchange: every row of one key meets in exactly one partition and
    ``fn(partition) -> same format`` runs once per partition (vectorize
    across the partition's keys inside ``fn``).  Streams — split tasks
    launch as upstream blocks materialize; no Dataset.groupby sort-shuffle
    (measured ~1.5-2 s fixed cost per groupby at bench scale, and the
    sort-based all-to-all dominates at larger scales).  ``n_partitions``
    defaults to the size-derived estimate (:func:`resolve_partitions`).

    ``batch_format="pyarrow"`` hands ``fn`` the concatenated
    ``pa.Table`` and expects one back — zero pandas round-trip, so
    string-heavy partitions stay Arrow-packed (object dtype costs 2-4x
    memory) and hot partition kernels can use pyarrow.compute + numpy
    zero-copy views.  A zero-row partition may carry the PRE-MAP schema
    (Ray Data skips UDFs on empty blocks upstream) in either format."""
    n_partitions = resolve_partitions(ds, n_partitions, default=32)
    splits = launch_splits(ds, by, n_partitions)
    applier = (_apply_partition_arrow if batch_format == "pyarrow"
               else _apply_partition)
    mem = exchange_task_memory(ds, n_partitions)
    if mem:
        applier = applier.options(memory=mem)
    return rd.from_arrow_refs(
        [
            applier.remote(fn, *[s[j] for s in splits])
            for j in range(n_partitions)
        ]
    )


def _canon_key(col: pd.Series) -> pd.Series:
    """Canonicalize numeric key dtype before hashing: int32 vs int64
    sides would hash equal logical keys to different partitions and
    silently drop matches.  Int-vs-float unification happens per VALUE in
    :func:`_key_hash` (dtype casting alone can't do it: float64 can't
    represent every int64)."""
    if pd.api.types.is_integer_dtype(col):
        return col.astype("int64")
    if pd.api.types.is_float_dtype(col):
        return col.astype("float64")
    return col


_I64_MIN_F = float(-(1 << 63))
_I64_MAX_F = float(1 << 63)


def _int_valued_mask(v: np.ndarray) -> np.ndarray:
    """Elementwise: float64 values that equal an int64 exactly."""
    with np.errstate(invalid="ignore"):
        return (np.isfinite(v) & (v == np.floor(v))
                & (v >= _I64_MIN_F) & (v < _I64_MAX_F))


def _key_hash(col: pd.Series) -> np.ndarray:
    """Per-value partition hash for exchange keys.  ``pd.merge`` matches
    int64 1 to float64 1.0 by VALUE, but ``hash_pandas_object`` hashes
    them differently — a mixed int/float key pair would land matching
    rows in different partitions and silently drop them.  Integral
    floats in int64 range therefore hash through the int64 path
    elementwise; non-integral floats only ever match other floats and
    keep the float hash."""
    col = _canon_key(col)
    h = pd.util.hash_pandas_object(col, index=False).to_numpy()
    if pd.api.types.is_float_dtype(col):
        v = col.to_numpy()
        m = _int_valued_mask(v)
        if m.any():
            h[m] = pd.util.hash_pandas_object(
                pd.Series(v[m].astype(np.int64)), index=False).to_numpy()
    return h


def _as_clean_table(t):
    """Block -> metadata-free Arrow table (internal refs may hold pandas
    blocks whose schema metadata records dtype reprs the reverse
    conversion can't parse, e.g. "numpy.ndarray(shape=...)")."""
    import pyarrow as pa

    if isinstance(t, pd.DataFrame):
        return pa.Table.from_pandas(t, preserve_index=False).replace_schema_metadata(None)
    return t.replace_schema_metadata(None)


@ray.remote(num_cpus=0)
def _split_blocks(by, n_partitions: int, *parts):
    """Split one or more bundled blocks into per-partition sub-tables by
    key hash.  ``by``: one column name or a list (multi-column keys hash as
    the sum of per-column hashes — both sides of an exchange must use the
    same form)."""
    import pyarrow as pa

    from ocr_ray.stages.reassemble import _split_table

    tables = [_as_clean_table(p) for p in parts]
    t = tables[0] if len(tables) == 1 else _concat_tables(tables)
    cols = [by] if isinstance(by, str) else list(by)
    if t.num_rows == 0:
        # Ray Data can pass a zero-row input block through a map_batches
        # WITHOUT running the UDF, so an all-empty upstream may deliver the
        # pre-map schema here (key columns absent).  Any empty split works —
        # downstream merges union schemas from the schema-bearing pieces.
        return tuple([t] * n_partitions) if n_partitions > 1 else t
    h = sum(_key_hash(t[c].to_pandas()) for c in cols)
    return _split_table(t, (h % n_partitions).astype(np.int32), n_partitions)


@ray.remote(num_cpus=0)
def _merge_asof_partition(n_left: int, by: str, on: str, direction: str,
                          suffix: str, *pieces):
    import pyarrow as pa

    # _ensure_key: an all-empty side can carry the pre-map schema (key
    # columns absent) — synthesize them so the kernel stays total
    lt = _ensure_key(_ensure_key(pa.concat_tables(pieces[:n_left]), by), on)
    rt = _ensure_key(_ensure_key(pa.concat_tables(pieces[n_left:]), by), on)
    left = lt.to_pandas().sort_values(on)
    right = rt.to_pandas().sort_values(on)
    if not len(left):
        # keep the merged schema stable across empty partitions
        extra = [c for c in right.columns if c not in (by, on)]
        out = left.copy()
        for c in extra:
            out[c + (suffix if c in left.columns else "")] = right[c].iloc[:0]
        return pa.Table.from_pandas(out, preserve_index=False)
    if not len(right):
        # empty right: every left row is unmatched — reindex of an empty
        # series null-fills with the same dtype promotion merge_asof
        # applies to unmatched rows (int64 -> float64 NaN, object -> None),
        # and avoids merge_asof's incompatible-key error on a null-typed
        # synthesized key column
        extra = [c for c in right.columns if c not in (by, on)]
        out = left.copy()
        for c in extra:
            out[c + (suffix if c in left.columns else "")] = (
                right[c].reindex(out.index))
        return pa.Table.from_pandas(out, preserve_index=False)
    out = pd.merge_asof(left, right, on=on, by=by, direction=direction,
                        suffixes=("", suffix))
    return pa.Table.from_pandas(out, preserve_index=False)


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    by: str,
    on: str,
    n_partitions: Optional[int] = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> "rd.Dataset":
    """As-of join (an operator Ray Data lacks — SURVEY §2 custom-operator
    tier (c): explicit two-sided hash exchange over raw Ray tasks, the same
    mechanism as the reassembly shuffle).

    For each left row, attach the right row with the same ``by`` key whose
    ``on`` value is the nearest at-or-before (``backward``) / at-or-after
    (``forward``) the left's.  Both sides are hashed on ``by`` into a
    bounded number of partitions (all rows of one key meet in one
    partition); each partition merges vectorized via ``pandas.merge_asof``.
    Skewed ``by`` keys concentrate in one partition — acceptable while a
    single key's rows fit a worker; beyond that, range-partition ``on``
    within the hot key (not needed at current scales)."""
    if n_partitions is None:  # size by the larger side: both sides shuffle
        n_partitions = max(resolve_partitions(left, None, default=64),
                           resolve_partitions(right, None, default=8))
    lsplits = launch_splits(left, by, n_partitions)
    rsplits = launch_splits(right, by, n_partitions)
    out_refs = [
        _merge_asof_partition.remote(
            len(lsplits), by, on, direction, suffix,
            *[s[j] for s in lsplits], *[s[j] for s in rsplits],
        )
        for j in range(n_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


@ray.remote(num_cpus=0)
def _range_assign_partition(n_left: int, by: str, point_col: str, start_col: str,
                            end_col: str, idx_col: str, *pieces):
    import pyarrow as pa

    points_t = _ensure_key(
        _ensure_key(pa.concat_tables(pieces[:n_left]), by), point_col)
    ivals_t = pa.concat_tables(pieces[n_left:])
    for c in (by, start_col, end_col, idx_col):
        ivals_t = _ensure_key(ivals_t, c)
    points = points_t.to_pandas()
    ivals = ivals_t.to_pandas()
    if not len(points):
        out = points.copy()
        out[idx_col] = pd.Series([], dtype="int64")
        return pa.Table.from_pandas(out, preserve_index=False)
    points = points.sort_values([by, point_col], kind="stable").reset_index(drop=True)
    ivals = ivals.sort_values([by, start_col], kind="stable")
    assigned = np.full(len(points), -1, dtype=np.int64)
    ival_groups = {k: g for k, g in ivals.groupby(by, sort=False)}
    for key, g in points.groupby(by, sort=False):
        iv = ival_groups.get(key)
        if iv is None:
            continue
        starts = iv[start_col].to_numpy()
        ends = iv[end_col].to_numpy()
        idxs = iv[idx_col].to_numpy()
        pos = np.searchsorted(starts, g[point_col].to_numpy(), side="right") - 1
        ok = (pos >= 0) & (g[point_col].to_numpy() <= ends[np.maximum(pos, 0)])
        vals = np.where(ok, idxs[np.maximum(pos, 0)], -1)
        assigned[g.index.to_numpy()] = vals
    points[idx_col] = assigned
    return pa.Table.from_pandas(points, preserve_index=False)


def range_join(
    points: "rd.Dataset",
    intervals: "rd.Dataset",
    by: str,
    point_col: str,
    start_col: str,
    end_col: str,
    idx_col: str = "interval_idx",
    n_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Range (interval-containment) join — an operator Ray Data lacks,
    implemented like :func:`asof_join` as a two-sided hash exchange.

    Each point row gains ``idx_col`` = the id of the same-key interval
    containing it (``start <= point <= end``), or -1.  Intervals of one key
    must be NON-OVERLAPPING (the containing interval is found by binary
    search over sorted starts); overlapping-interval semantics would return
    multiple rows and need an explicit flat-map variant instead."""
    if n_partitions is None:
        n_partitions = max(resolve_partitions(points, None, default=64),
                           resolve_partitions(intervals, None, default=8))
    lsplits = launch_splits(points, by, n_partitions)
    rsplits = launch_splits(intervals, by, n_partitions)
    out_refs = [
        _range_assign_partition.remote(
            len(lsplits), by, point_col, start_col, end_col, idx_col,
            *[s[j] for s in lsplits], *[s[j] for s in rsplits],
        )
        for j in range(n_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    n_partitions: Optional[int] = None,
    how: str = "inner",
    right_on: Optional[str] = None,
) -> "rd.Dataset":
    """Both-sides-large join via Ray Data's native hash-partitioned
    ``Dataset.join`` (one all-to-all per side on the key hash).  Skewed keys:
    raise ``n_partitions``; pathological single hot keys should be broadcast
    or salted upstream instead of joined here."""
    if n_partitions is None:
        n_partitions = max(resolve_partitions(left, None, default=32),
                           resolve_partitions(right, None, default=8))
    return left.join(
        right,
        join_type=how,
        num_partitions=n_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def _ensure_key(t, col: str):
    """Append a null-typed key column to an ALL-EMPTY table that lacks it.

    An all-empty exchange side can deliver the pre-map schema (Ray Data
    passes zero-row blocks through map_batches without running the UDF —
    see _split_blocks), so the join key may be absent.  Zero rows means
    the join/aggregate RESULT is unaffected; synthesizing the column
    keeps the merge kernels total.  A non-empty table missing the key is
    a real caller bug and still raises."""
    import pyarrow as pa

    if col in t.column_names or t.num_rows:
        return t
    return t.append_column(col, pa.nulls(0))


@ray.remote(num_cpus=0)
def _merge_equi_partition(n_left: int, on: str, right_on: str, how: str, *pieces):
    import pyarrow as pa

    if how in ("semi", "anti"):
        # existence probe only, filtered IN ARROW: left schema (and real
        # column types) survive even when the partition result is empty
        import pyarrow.compute as pc

        lt_a = _ensure_key(pa.concat_tables(pieces[:n_left]), on)
        rt_a = _ensure_key(pa.concat_tables(pieces[n_left:]), right_on)
        if lt_a.num_rows == 0:
            return lt_a  # empty left: semi and anti are both empty
        vs = rt_a[right_on].combine_chunks()
        if vs.type != lt_a[on].type:
            vs = vs.cast(lt_a[on].type)  # int32 probe keys vs int64 left
            # (null-typed empty probe side casts to any key type)
        mask = pc.is_in(lt_a[on], value_set=vs)
        if how == "anti":
            mask = pc.fill_null(pc.invert(mask), True)
        else:
            mask = pc.fill_null(mask, False)
        return lt_a.filter(mask)
    lt = _ensure_key(pa.concat_tables(pieces[:n_left]), on).to_pandas()
    rt = _ensure_key(pa.concat_tables(pieces[n_left:]), right_on).to_pandas()
    out = lt.merge(rt, left_on=on, right_on=right_on, how=how)
    if right_on != on and right_on in out.columns:
        out = out.drop(columns=[right_on])
    return pa.Table.from_pandas(out, preserve_index=False)


def exchange_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    n_partitions: Optional[int] = None,
    how: str = "inner",
) -> "rd.Dataset":
    """Equi-join over the explicit two-sided hash exchange (same mechanism
    as :func:`asof_join`): both sides split on the key hash by plain Ray
    tasks, one merge task per partition.  Lighter-weight than the native
    ``Dataset.join`` (no shuffle-aggregator actor pool to spin up) — the
    right choice for mid-pipeline joins of bounded-size tables such as
    dedup-candidate verification; prefer :func:`hash_join` when both sides
    are huge and long-lived aggregator actors amortize."""
    if n_partitions is None:
        n_partitions = max(resolve_partitions(left, None),
                           resolve_partitions(right, None, default=8))
    ron = right_on or on
    lsplits = launch_splits(left, on, n_partitions)
    rsplits = launch_splits(right, ron, n_partitions)
    out_refs = [
        _merge_equi_partition.remote(
            len(lsplits), on, ron, how,
            *[s[j] for s in lsplits], *[s[j] for s in rsplits],
        )
        for j in range(n_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


def _edit_distance_leq1(a: str, b: str) -> int:
    """Edit distance if <= 1, else 2.  Unit-cost Levenshtein semantics
    (matches DuckDB's levenshtein for the <=1 band)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return 2
    if la == lb:  # exactly one substitution?
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by one: b must delete exactly one char to equal a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def fuzzy_join_ed1(
    left: "rd.Dataset",
    right: "rd.Dataset",
    left_id: str = "left_id",
    left_name: str = "left_name",
    right_id: str = "right_id",
    right_name: str = "right_name",
    n_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Fuzzy equi-join at edit distance <= 1 with deletion-signature
    blocking (the SymSpell scheme): each string emits itself plus every
    single-character-deletion variant as a signature; two strings within
    edit distance 1 PROVABLY share a signature (substitution at i ->
    both i-deletions equal; deletion/insertion -> the shorter string is
    a signature of both), so blocking has exact recall — no similarity
    assumption.  Signatures are hashed to uint64, both sides exchange on
    the signature hash, candidate id pairs dedup through a bounded hash
    aggregate, and each partition verifies with the banded edit-distance
    kernel.  Signature volume is O(rows x string length): linear state,
    never the cross product.  Returns (left_id, right_id, dist)."""
    import pyarrow as pa

    n_partitions = resolve_partitions(left, n_partitions)

    from ocr_ray.stages.aggregate import hash_aggregate

    def sigs(b: pd.DataFrame, id_col: str, name_col: str, out_id: str,
             out_name: str) -> pd.DataFrame:
        # deterministic cross-process hash (builtin hash() is seeded
        # per-interpreter and would scatter equal signatures)
        import hashlib

        ids, hs, names = [], [], []
        for i, name in zip(b[id_col].astype("int64"), b[name_col]):
            variants = {name}
            variants.update(name[:p] + name[p + 1:] for p in range(len(name)))
            for v in variants:
                ids.append(i)
                hs.append(int.from_bytes(
                    hashlib.blake2b(v.encode(), digest_size=8).digest(),
                    "big") & 0x7FFFFFFFFFFFFFFF)
                names.append(name)
        return pd.DataFrame(
            {out_id: np.asarray(ids, dtype="int64"),
             "sig": np.asarray(hs, dtype="int64"),
             out_name: pd.Series(names, dtype="string")}
        )

    lsig = left.map_batches(
        sigs, batch_format="pandas",
        fn_kwargs={"id_col": left_id, "name_col": left_name,
                   "out_id": "_lid", "out_name": "_lname"})
    rsig = right.map_batches(
        sigs, batch_format="pandas",
        fn_kwargs={"id_col": right_id, "name_col": right_name,
                   "out_id": "_rid", "out_name": "_rname"})

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        if "_side" not in g.columns:
            # all-empty input: every upstream block skipped the tagging UDF
            # (Ray passes zero-row blocks through map_batches unrun), so the
            # partition carries a pre-map schema — no candidates exist
            return pd.DataFrame(
                {"_lid": pd.Series([], dtype="int64"),
                 "_rid": pd.Series([], dtype="int64"),
                 "_lname": pd.Series([], dtype="string"),
                 "_rname": pd.Series([], dtype="string"),
                 "n": pd.Series([], dtype="int64")}
            )
        lt = g[g["_side"] == 0]
        rt = g[g["_side"] == 1]
        if not len(lt) or not len(rt):
            return pd.DataFrame(
                {"_lid": pd.Series([], dtype="int64"),
                 "_rid": pd.Series([], dtype="int64"),
                 "_lname": pd.Series([], dtype="string"),
                 "_rname": pd.Series([], dtype="string"),
                 "n": pd.Series([], dtype="int64")}
            )
        cand = lt[["sig", "_lid", "_lname"]].merge(
            rt[["sig", "_rid", "_rname"]], on="sig")
        cand = cand.drop_duplicates(["_lid", "_rid"])
        return pd.DataFrame(
            {"_lid": cand["_lid"].to_numpy(dtype="int64"),
             "_rid": cand["_rid"].to_numpy(dtype="int64"),
             "_lname": cand["_lname"].astype("string"),
             "_rname": cand["_rname"].astype("string"),
             "n": np.ones(len(cand), dtype="int64")}
        )

    _COLS = ["sig", "_side", "_lid", "_lname", "_rid", "_rname"]
    tagged_l = lsig.map_batches(
        lambda b: b.assign(_side=np.int64(0), _rid=np.int64(-1),
                           _rname=pd.Series([""] * len(b), dtype="string"))[_COLS],
        batch_format="pandas")
    tagged_r = rsig.map_batches(
        lambda b: b.assign(_side=np.int64(1), _lid=np.int64(-1),
                           _lname=pd.Series([""] * len(b), dtype="string"))[_COLS],
        batch_format="pandas")
    cands = exchange_map_partitions(
        tagged_l.union(tagged_r), "sig", pair_up, n_partitions)
    # candidates can recur across signature partitions: dedup by id pair
    uniq = hash_aggregate(
        cands, keys=["_lid", "_rid", "_lname", "_rname"], aggs={"n": "sum"},
        n_partitions=n_partitions,
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        d = np.asarray(
            [_edit_distance_leq1(x, y) for x, y in zip(b["_lname"], b["_rname"])],
            dtype="int64") if len(b) else np.array([], dtype="int64")
        keep = d <= 1
        return pd.DataFrame(
            {left_id: b["_lid"].to_numpy(dtype="int64")[keep],
             right_id: b["_rid"].to_numpy(dtype="int64")[keep],
             "dist": d[keep]}
        )

    return uniq.map_batches(verify, batch_format="pandas")


@ray.remote(num_cpus=0)
def _range_multi_partition(n_left: int, by: str, point_col: str,
                           start_col: str, end_col: str, *pieces):
    import pyarrow as pa

    points = _concat_pd(pieces[:n_left])
    ivals = _concat_pd(pieces[n_left:])
    if not len(points) or not len(ivals):
        # empty side: synthesize the joined schema without merging (an
        # all-empty side may carry a pre-map schema missing `by`)
        cols = {c: points[c].iloc[0:0] if c in points.columns else pd.Series([])
                for c in points.columns}
        for c in ivals.columns:
            if c not in cols:
                cols[c] = ivals[c].iloc[0:0]
        return pa.Table.from_pandas(pd.DataFrame(cols).iloc[0:0],
                                    preserve_index=False)
    overlap = (set(points.columns) & set(ivals.columns)) - {by}
    if overlap:
        raise ValueError(
            f"range_join_multi: sides share payload columns {sorted(overlap)}"
            " — rename one side before joining (pandas would suffix them"
            " and the containment columns would no longer resolve)")
    out = points.merge(ivals, on=by)
    keep = (out[start_col] <= out[point_col]) & (out[point_col] <= out[end_col])
    return pa.Table.from_pandas(out[keep].reset_index(drop=True),
                                preserve_index=False)


def range_join_multi(
    points: "rd.Dataset",
    intervals: "rd.Dataset",
    by: str,
    point_col: str,
    start_col: str,
    end_col: str,
    n_partitions: Optional[int] = None,
) -> "rd.Dataset":
    """Overlapping-intervals range join — the flat-map variant
    :func:`range_join`'s docstring promises: each point row is emitted
    once per same-key interval CONTAINING it (0..N output rows per
    point), carrying both sides' payload columns.  Same two-sided hash
    exchange; inside a partition the key equi-merge runs first and the
    containment filter prunes.  Partitioning assumption: one key's
    points x intervals product fits a worker — for hot keys pre-bucket
    the interval axis (range-partition ``point_col``) before calling."""
    if n_partitions is None:
        n_partitions = max(resolve_partitions(points, None, default=64),
                           resolve_partitions(intervals, None, default=8))
    lsplits = launch_splits(points, by, n_partitions)
    rsplits = launch_splits(intervals, by, n_partitions)
    out_refs = [
        _range_multi_partition.remote(
            len(lsplits), by, point_col, start_col, end_col,
            *[s[j] for s in lsplits], *[s[j] for s in rsplits],
        )
        for j in range(n_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


@ray.remote(num_cpus=0)
def _split_blocks_skew(by, n_partitions: int, hot, side: str, *parts):
    """Skew-aware split: hot-key rows bypass the one-partition-per-key
    rule.  LEFT side: hot rows scatter round-robin over ALL partitions
    (cold rows hash normally).  RIGHT side: hot rows REPLICATE to every
    partition, so each scattered left row still meets every matching
    right row exactly once — the classic salt-and-replicate skew join,
    exact because hot and cold key sets are disjoint and each left row
    lands in exactly one partition."""
    import pyarrow as pa

    from ocr_ray.stages.reassemble import _split_table

    tables = [_as_clean_table(p) for p in parts]
    t = tables[0] if len(tables) == 1 else _concat_tables(tables)
    if t.num_rows == 0:
        return tuple([t] * n_partitions) if n_partitions > 1 else t
    key = _canon_key(t[by].to_pandas())
    h = (_key_hash(key) % n_partitions).astype(np.int64)
    ishot = key.isin(hot).to_numpy()
    if side == "left":
        spread = np.arange(len(h), dtype=np.int64) % n_partitions
        pk = np.where(ishot, (h + spread) % n_partitions, h).astype(np.int32)
        return _split_table(t, pk, n_partitions)
    cold = t.filter(pa.array(~ishot))
    hot_t = t.filter(pa.array(ishot)).combine_chunks()
    cold_parts = _split_table(cold, h[~ishot].astype(np.int32), n_partitions)
    out = tuple(
        pa.concat_tables([c, hot_t]) if hot_t.num_rows else c
        for c in cold_parts
    )
    return out if n_partitions > 1 else out[0]


def _detect_hot_keys(key_source, on: str, k: int,
                     n_partitions: Optional[int]):
    """Misra-Gries hot-key detection over one key-column scan: per-batch
    MG summaries union-summed through a bounded exchange.  Returns
    ``(hot, max_lb, total)`` — the PROVABLE superset of keys with
    frequency > N/k (lb*k*(k+1) > N; see aggregate.heavy_hitters), the
    largest summed lower bound (>= the true count of the heaviest key
    minus MG compression), and the row count N.  Shared by
    :func:`skew_join` (needs ``hot``) and :func:`adaptive_join` (needs
    the absolute mass to place the dispatch against the measured
    crossover)."""
    # row count N for the hot threshold: metadata-only for parquet reads
    # and materialized datasets (the supported key_source shapes —
    # a transformed lazy source would execute here AND in the MG pass)
    total = int(key_source.count())

    def mg_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b[on].value_counts()
        if len(c) > k:
            cut = int(c.iloc[k])  # value_counts sorts descending
            c = (c - cut)[c > cut]
        return pd.DataFrame({"_key": c.index,
                             "lb": c.to_numpy().astype("int64")})

    from ocr_ray.stages.aggregate import hash_aggregate

    summed = hash_aggregate(
        key_source.map_batches(mg_partial, batch_format="pandas"),
        keys=["_key"], aggs={"lb": "sum"},
        n_partitions=n_partitions,
    ).to_pandas()
    if not len(summed) or "_key" not in summed.columns:
        # uniform keys: every per-batch MG compress cancels to empty (and
        # an all-empty Dataset's to_pandas() drops columns) — no hot keys
        return frozenset(), 0, total
    lbs = summed["lb"].astype("int64")
    hot = frozenset(summed.loc[lbs * k * (k + 1) > total, "_key"].tolist())
    return hot, int(lbs.max()), total


def skew_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    n_partitions: Optional[int] = None,
    how: str = "inner",
    k: int = 64,
    left_key_source: Optional["rd.Dataset"] = None,
    precomputed_hot: Optional[frozenset] = None,
) -> "rd.Dataset":
    """Skew-aware equi-join — ONE scan of each side, no materialize of
    the big side, no straggler reduce task.

    A plain hash exchange sends EVERY row of one key to one merge task,
    so a key holding 30% of a 100 TB left side turns one task into the
    job's critical path.  Plan:

    1. **Hot-key detection**: Misra-Gries per-batch key summaries over
       ``left_key_source`` (pass a key-column-pruned read of the same
       input — a one-column scan — to keep ``left`` itself
       single-consumer; defaults to ``left``, which is then materialized
       once), union-summed through a bounded exchange.  Keys whose
       summed lower bound satisfies lb*k*(k+1) > N form a PROVABLE
       superset of every key with frequency > N/k (see
       aggregate.heavy_hitters); no exact verify needed — treating a
       near-hot key as hot only costs a little extra replication.
    2. **Salt-and-replicate exchange** (:func:`_split_blocks_skew`):
       hot LEFT rows scatter round-robin across all partitions; hot
       RIGHT rows replicate to all partitions (bounded: <= ~k hot keys
       x the right side's per-key rows x n_partitions — the scheme
       assumes a dim-like right side); cold rows hash normally.  One
       merge task per partition, each holding ~1/P of the hot mass.

    Supports how='inner'|'left' (each left row lands in exactly one
    partition, each hot left row meets each matching right row exactly
    once).  With no hot keys detected this degrades to exactly
    :func:`exchange_join`."""
    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")
    if isinstance(left, list) or isinstance(right, list):
        raise TypeError("skew_join takes Datasets, not block refs")
    ron = right_on or on

    if left_key_source is None:
        left = left.materialize()
        left_key_source = left

    if precomputed_hot is not None:
        hot = precomputed_hot  # adaptive_join already ran the probe
    else:
        hot, _, _ = _detect_hot_keys(left_key_source, on, k, n_partitions)

    if not hot:
        return exchange_join(left, right, on=on, right_on=ron,
                             n_partitions=n_partitions, how=how)

    if n_partitions is None:
        n_partitions = max(resolve_partitions(left, None),
                           resolve_partitions(right, None, default=8))

    hot_ref = ray.put(hot)  # shipped once, not re-pickled per split task
    lsplits = [
        _split_blocks_skew.options(num_returns=n_partitions).remote(
            on, n_partitions, hot_ref, "left", *refs)
        for refs in _iter_split_bundles(left)
    ]
    rsplits = [
        _split_blocks_skew.options(num_returns=n_partitions).remote(
            ron, n_partitions, hot_ref, "right", *refs)
        for refs in _iter_split_bundles(right)
    ]
    out_refs = [
        _merge_equi_partition.remote(
            len(lsplits), on, ron, how,
            *[s[j] for s in lsplits], *[s[j] for s in rsplits],
        )
        for j in range(n_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


def _adaptive_choice(max_lb: int, bytes_per_row: float,
                     heap_budget: int, min_hot_rows: int) -> str:
    """Pure dispatch rule for :func:`adaptive_join` (unit-testable):

    * ``"skew"`` when the heaviest key's estimated bytes exceed the
      per-worker heap budget — salt-and-replicate is then MANDATORY
      (the mega-partition would not fit one merge task), or when its
      row count crosses ``min_hot_rows``, the measured single-node
      latency crossover (plain exchange wins below ~50M hot rows at
      40% skew on 32 cores — BENCH/BASELINE.md round-5 crossover
      curve; the crossover moves earlier on wider clusters, so pass a
      smaller threshold there);
    * ``"exchange"`` otherwise — below the crossover the plain
      exchange's lower fixed cost wins even against heavy skew."""
    if bytes_per_row and max_lb * bytes_per_row > heap_budget:
        return "skew"
    if max_lb >= min_hot_rows:
        return "skew"
    return "exchange"


def adaptive_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    n_partitions: Optional[int] = None,
    how: str = "inner",
    k: int = 64,
    left_key_source: Optional["rd.Dataset"] = None,
    min_hot_rows: int = 50_000_000,
) -> "rd.Dataset":
    """AQE-style skew dispatch: run the Misra-Gries hot-key probe ONCE,
    then pick the join strategy from the heaviest key's ABSOLUTE mass —
    :func:`skew_join`'s own gate is relative (frequency > N/k), which
    salts a 40%-mass key even when the whole input is small enough that
    the plain exchange's lower fixed cost wins (measured: the plain
    exchange beats salt-and-replicate below ~50M hot-key rows on one
    32-core node; above, skew_join wins 1.59-1.86x and becomes
    MANDATORY once the hot partition outgrows a worker's heap).

    The probe's hot set is reused by the skew path (no second scan);
    the exchange path costs one extra key-column scan over what a
    direct :func:`exchange_join` call would — the price of not knowing
    the skew in advance.

    ``how`` is validated UPFRONT to the skew arm's 'inner'|'left':
    accepting semi/anti here would make the join's supported semantics
    DATA-DEPENDENT (fine below the crossover, ValueError the day skew
    appears) — callers who need those hows use exchange_join, whose
    straggler risk they then accept explicitly."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"adaptive_join supports how='inner'|'left' (the skew arm's "
            f"constraint; got {how!r}) — a data-dependent dispatch must "
            f"not widen its accepted semantics beyond its narrowest arm. "
            f"Use exchange_join for semi/anti/right joins.")
    if left_key_source is None:
        left = left.materialize()
        left_key_source = left
    hot, max_lb, total = _detect_hot_keys(left_key_source, on, k,
                                          n_partitions)

    bytes_per_row = 0.0
    est = _estimate_bytes(left)
    if est and total:
        bytes_per_row = est / total
    heap_budget = 4 << 30
    try:
        if ray.is_initialized():
            res = ray.cluster_resources()
            cpus = max(1, int(res.get("CPU", 8)))
            heap_budget = int(res.get("memory", 32 << 30) // (2 * cpus))
    except Exception:
        pass

    choice = _adaptive_choice(max_lb, bytes_per_row, heap_budget,
                              min_hot_rows)
    if choice == "exchange" or not hot:
        return exchange_join(left, right, on=on, right_on=right_on,
                             n_partitions=n_partitions, how=how)
    return skew_join(left, right, on=on, right_on=right_on,
                     n_partitions=n_partitions, how=how, k=k,
                     left_key_source=left_key_source,
                     precomputed_hot=hot)


def _iter_split_bundles(src, min_rows_per_split: int = 32768):
    """Yield bundled block-ref lists from a Dataset, streaming — the same
    bundling policy as :func:`launch_splits`, factored so split-task
    VARIANTS (e.g. the skew splitter) reuse it."""
    pending, pending_rows, last, yielded = [], 0, None, False
    for bundle in src.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            last = ref
            if meta.num_rows:
                pending.append(ref)
                pending_rows += meta.num_rows
                if pending_rows >= min_rows_per_split:
                    yield pending
                    pending, pending_rows, yielded = [], 0, True
    if pending:
        yield pending
    elif not yielded and last is not None:
        # all-empty input: one schema-bearing empty split.  The `yielded`
        # guard matters: when the loop drained exactly on a threshold
        # yield, re-yielding `last` would DUPLICATE the final block
        # (caught by the --skew-join bench row-count assert).
        yield [last]


# Join-key Bloom prefilter: k multiplicative probes into an m-bit mask.
# Distinct constants from bloom.py's corpus filter (different domain:
# int64 join keys, not document content hashes).
_JBLOOM_CONSTS = ((0x9E3779B97F4A7C15, 0x7F4A7C15),
                  (0xC2B2AE3D27D4EB4F, 0x165667B1),
                  (0x2545F4914F6CDD1D, 0x27D4EB2F),
                  (0xFF51AFD7ED558CCD, 0x9E3779B9))


def _jbloom_key64(col: "pd.Series") -> np.ndarray:
    """Join key column -> int64 probe input: integers pass through,
    everything else (strings, dates) goes through the same deterministic
    pandas hash the exchange splitter uses — both sides of the join MUST
    agree, which they do because both call this helper.  Float keys that
    are exactly int-valued take the raw-int path elementwise so an int64
    side and a float64 side of the same logical key probe the same bits
    (mirrors :func:`_key_hash`)."""
    if pd.api.types.is_integer_dtype(col):
        return col.to_numpy().astype(np.int64)
    if pd.api.types.is_float_dtype(col):
        v = col.to_numpy(dtype=np.float64)
        out = pd.util.hash_pandas_object(
            pd.Series(v), index=False).to_numpy().astype(np.int64)
        m = _int_valued_mask(v)
        out[m] = v[m].astype(np.int64)
        return out
    return pd.util.hash_pandas_object(
        _canon_key(col), index=False).to_numpy().astype(np.int64)


def _jbloom_positions(keys: np.ndarray, m_bits_log2: int) -> np.ndarray:
    """(n, k) bit positions for int64 keys — top bits of k multiplicative
    mixes (vectorized uint64 wraparound)."""
    u = keys.astype(np.uint64)
    shift = np.uint64(64 - m_bits_log2)
    return np.stack([((u * np.uint64(a)) + np.uint64(b)) >> shift
                     for a, b in _JBLOOM_CONSTS], axis=1)


def bloom_pruned_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    n_partitions: Optional[int] = None,
    how: str = "inner",
    m_bits_log2: int = 20,
) -> "rd.Dataset":
    """Equi-join with a Bloom prefilter on the BIG left side — sideways
    information passing for the selective-join case: when only a sliver
    of a 100 TB left side has a match, a plain exchange still shuffles
    every left row.  Here the right side's keys are summarized into an
    m-bit Bloom filter (fixed m/8 bytes regardless of right size; built
    with one streaming pass whose per-batch output is <= m positions),
    the mask is broadcast once via ``ray.put``, and left rows failing
    any of the k probes are dropped INSIDE map_batches — before the
    exchange.  False positives only add shuffle volume; the merge task
    removes them, so results are exact.  how='inner'|'semi' only (a
    pruned row can't produce its left-outer null extension).

    The right side is consumed twice (key scan + join) and is therefore
    materialized once here — it is the SMALL side by assumption."""
    if how not in ("inner", "semi"):
        raise ValueError("bloom_pruned_join supports how='inner'|'semi'")
    ron = right_on or on
    right = right.materialize()

    def key_positions(b: pd.DataFrame) -> pd.DataFrame:
        pos = np.unique(_jbloom_positions(
            _jbloom_key64(b[ron]), m_bits_log2))
        return pd.DataFrame({"pos": pos.astype("int64")})

    pos_df = right.map_batches(key_positions, batch_format="pandas").to_pandas()
    if "pos" not in pos_df.columns:
        # all-empty right: to_pandas() drops columns; an all-zero mask
        # prunes every left row and the (hardened) exchange returns the
        # typed empty result, matching exchange_join's contract
        pos_df = pd.DataFrame({"pos": pd.Series(dtype="int64")})
    pos = np.unique(pos_df["pos"].to_numpy())
    mask = np.zeros(1 << m_bits_log2, dtype=bool)
    mask[pos] = True
    mask_ref = ray.put(np.packbits(mask))

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.unpackbits(ray.get(mask_ref)).view(bool)
        p = _jbloom_positions(_jbloom_key64(b[on]), m_bits_log2)
        return b[bits[p].all(axis=1)]

    pruned = left.map_batches(prune, batch_format="pandas")
    return exchange_join(pruned, right, on=on, right_on=ron,
                         n_partitions=n_partitions, how=how)
