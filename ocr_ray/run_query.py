"""CLI for the named query/pipeline surface — the analog of the
reference's command-line app (``app.py``) for this engine: every
pipeline a ``queries()`` entry exposes becomes runnable without writing
Python.

::

    python -m ocr_ray.run_query --list
    python -m ocr_ray.run_query doc_clean /root/testdata/sf0.001
    python -m ocr_ray.run_query dedup_minhash /data/sf --out /tmp/pairs \
        --format parquet

``--out`` writes the full result (parquet dir for Dataset results —
distributed write, no driver materialization; a single parquet/csv/jsonl
file for small driver-side frames); without it the row count and first
rows print to stdout.  The full surface (including the synthesized-
transcript waves) resolves through ``__ray_entry__`` when the repo root
is importable — e.g. under ``ray job submit --working-dir .`` — and
falls back to the package-internal table queries otherwise.
"""

from __future__ import annotations

import argparse
import sys


def _surface() -> dict:
    try:
        import __ray_entry__ as entry  # repo root / job working-dir

        return dict(entry.queries())
    except ImportError:
        from ocr_ray.pipelines.queries import queries

        return dict(queries())


def main(argv: "list[str] | None" = None) -> int:
    ap = argparse.ArgumentParser(prog="ocr_ray.run_query")
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("sf_dir", nargs="?", help="dir holding the parquet tables")
    ap.add_argument("--list", action="store_true", help="print query names")
    ap.add_argument("--out", default=None, help="write result here")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "csv", "jsonl"])
    ap.add_argument("--head", type=int, default=5,
                    help="rows to print when --out is absent")
    args = ap.parse_args(argv)

    # list / name validation need only imports, not a Ray cluster —
    # `--list` and the typo path stay instant
    qs = _surface()
    if args.list:
        for n in sorted(qs):
            print(n)
        return 0
    if not args.name or not args.sf_dir:
        ap.error("name and sf_dir are required unless --list")
    if args.name not in qs:
        import difflib

        close = difflib.get_close_matches(args.name, qs, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        ap.error(f"unknown query {args.name!r}{hint}; see --list")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    res = qs[args.name](args.sf_dir)

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        # a Dataset result may be arbitrarily large: NEVER fully
        # materialize it on the driver.  --out parquet = distributed
        # write (the 100 TB path); headless = count + a limited head;
        # csv/jsonl would be a driver-side single file, so refuse.
        if args.out and args.format == "parquet":
            res.write_parquet(args.out)
            print(f"wrote dataset to {args.out}/ (parquet)")
            return 0
        if args.out:
            ap.error(
                f"--format {args.format} writes one driver-side file; a "
                f"Dataset result may not fit the driver. Use --format "
                f"parquet (distributed write).")
        n = res.count()
        head = res.limit(args.head).to_pandas()
        print(f"{args.name}: {n} rows x {len(head.columns)} cols")
        print(head.to_string(index=False))
        return 0

    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if args.out:
        if args.format == "parquet":
            df.to_parquet(args.out)
        elif args.format == "csv":
            df.to_csv(args.out, index=False)
        else:
            df.to_json(args.out, orient="records", lines=True,
                       force_ascii=False)
        print(f"wrote {len(df)} rows to {args.out} ({args.format})")
    else:
        print(f"{args.name}: {len(df)} rows x {len(df.columns)} cols")
        print(df.head(args.head).to_string(index=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
