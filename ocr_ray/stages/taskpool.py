"""Task-pool execution for cheap-setup callable-class stages.

``map_batches(Cls, concurrency=N)`` builds a FIXED actor pool: right for
expensive setup (models, big indexes) but wrong for cheap-setup stages —
the pool reserves CPUs for the whole execution, caps parallelism at N, and
pays actor spin-up (~1-3 s) per query.  :func:`task_pool` wraps the same
callable class as a plain map_batches function with a per-worker-process
instance cache: setup still happens once per process (amortized like an
actor), but scheduling is the default task pool — parallelism scales to
every free CPU and nothing is reserved or spun up.

Rule of thumb: task_pool for regex/hash/projection stages (setup < ~10 ms);
a real actor pool for model loads and index builds (the Extractor keeps its
actor pool deliberately — its fused cleanup makes it the pipeline's one
long-running heavy stage).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

_CACHE: Dict[Tuple, object] = {}
# keys embed per-query ObjectRefs (each lm_score/dsir_score call ray.puts
# fresh broadcast tables), so long-lived worker processes would otherwise
# accumulate one instance — holding MB-scale arrays — per historical query
_CACHE_MAX = 32


def task_pool(cls, **ctor_kwargs) -> Callable:
    """Wrap callable-class ``cls(**ctor_kwargs)`` as a batch function with
    one cached instance per (class, kwargs) per worker process.  Kwargs
    must be hashable (ObjectRefs are — broadcast refs work unchanged).
    The per-process cache is bounded: past ``_CACHE_MAX`` distinct
    (class, kwargs) keys the OLDEST entry is evicted (FIFO — dicts keep
    insertion order), so a worker interleaving >_CACHE_MAX live queries
    re-sets-up one instance per overflow instead of the former clear(),
    which wiped all 32 live instances and re-ran every setup on each
    of their next batches."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(ctor_kwargs.items())))

    def fn(batch):
        inst = _CACHE.get(key)
        if inst is None:
            while len(_CACHE) >= _CACHE_MAX:
                _CACHE.pop(next(iter(_CACHE)))
            inst = _CACHE.setdefault(key, cls(**ctor_kwargs))
        return inst(batch)

    fn.__name__ = f"task_pool[{cls.__name__}]"
    return fn
