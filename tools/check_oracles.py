"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle SQL at a given sf dir, compare row count + (sorted-column)
values order-insensitively.  Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import ray.data as rd
    import pyarrow as pa

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if not len(df.columns):
            # Ray quirk: to_pandas() on an all-empty-block Dataset drops
            # columns even when blocks carry an Arrow schema — rebuild the
            # empty frame from the schema so legitimately-empty results
            # (e.g. anti-joins) still column/schema-compare
            schema = res.schema()
            if schema is not None:
                df = pa.schema(
                    list(zip(schema.names, schema.types))
                ).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def run_checks(sf_dir: str, names=None, records=None) -> list[str]:
    """Compare every queries() entry (the full __ray_entry__ surface,
    including the synthesized-transcript pipelines) against its oracle;
    returns failure messages (empty = all green).  Assumes a live Ray
    session.  When ``records`` (a dict) is given, one machine-readable
    entry per query is added: {"status": "value_match" | "rows_only" |
    "fail", "rows": n, "oracle_rows": n | None, "err": str | None}."""
    import __ray_entry__ as entry_mod
    from ocr_ray.pipelines.queries import ORACLE_SQL as _BASE_SQL

    ORACLE_SQL = dict(_BASE_SQL)
    # transcripts oracles read golden parquet paths that depend on the sf
    # tier — rebuild them for the tier under test
    ORACLE_SQL.update(entry_mod.transcripts_oracle_sql(sf_dir))
    queries = entry_mod.queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures: list[str] = []

    def record(name, status, rows=None, oracle_rows=None, err=None):
        if records is not None:
            records[name] = {"status": status, "rows": rows,
                             "oracle_rows": oracle_rows, "err": err}

    for name, fn in queries().items():
        if names is not None and name not in names:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(f"{name}: ray side raised {type(e).__name__}: {e}")
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            record(name, "fail", err=f"ray side raised {type(e).__name__}: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            record(name, "rows_only", rows=len(got))
            continue
        try:
            want = canon(con.execute(ORACLE_SQL[name]).df())
        except Exception as e:
            failures.append(f"{name}: oracle sql raised {e}")
            print(f"FAIL {name}: oracle sql raised {e}")
            record(name, "fail", rows=len(got), err=f"oracle sql raised {e}")
            continue
        status = []
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=True, rtol=0, atol=0)
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[0])
                # show first difference
                for c in got.columns:
                    neq = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                    if neq.any():
                        i = int(np.argmax(neq.to_numpy()))
                        status.append(f"  first diff col={c} row={i}: {got[c].iloc[i]!r} vs {want[c].iloc[i]!r}")
                        break
        if status:
            msg = f"{name}: " + "; ".join(status)
            failures.append(msg)
            print("FAIL " + msg)
            record(name, "fail", rows=len(got), oracle_rows=len(want),
                   err="; ".join(status))
        else:
            print(f"ok   {name}: {len(got)} rows match oracle")
            record(name, "value_match", rows=len(got), oracle_rows=len(want))
    return failures


def main(sf_dir: str, names=None, json_path=None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    records = {} if json_path else None
    failures = run_checks(sf_dir, names=names, records=records)
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(records),
                       "n_fail": len(failures), "queries": records},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_path}: {len(records)} queries, "
              f"{len(failures)} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    json_path = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.exit(main(sf, names=only, json_path=json_path))
