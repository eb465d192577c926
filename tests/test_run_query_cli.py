"""The query-runner CLI (ocr_ray/run_query.py): list / run / write /
typo-hint surface, driven in-process against the session Ray."""

import os

import pandas as pd
import pytest


def test_list_covers_full_surface(ray_session, capsys):
    from ocr_ray.run_query import main

    assert main(["--list"]) == 0
    names = capsys.readouterr().out.split()
    import __ray_entry__ as entry

    assert set(names) == set(entry.queries())


def test_run_prints_head(ray_session, capsys):
    from ocr_ray.run_query import main

    assert main(["doc_top_terms", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "doc_top_terms:" in out and "rows" in out


def test_out_parquet_roundtrip(ray_session, tmp_path, capsys):
    from ocr_ray.run_query import main

    dest = str(tmp_path / "out.parquet")
    assert main(["doc_top_terms", "/root/testdata/sf0.001",
                 "--out", dest]) == 0
    df = pd.read_parquet(dest)
    assert len(df) > 0 and "term" in df.columns


def test_dataset_result_writes_distributed_parquet(ray_session, tmp_path):
    from ocr_ray.run_query import main

    dest = str(tmp_path / "ds_out")
    assert main(["doc_clean", "/root/testdata/sf0.001",
                 "--out", dest]) == 0
    files = os.listdir(dest)
    assert files and all(f.endswith(".parquet") for f in files)
    assert len(pd.read_parquet(dest)) == 500


def test_unknown_name_hints(ray_session, capsys):
    from ocr_ray.run_query import main

    with pytest.raises(SystemExit):
        main(["doc_cleen", "/root/testdata/sf0.001"])
    assert "did you mean" in capsys.readouterr().err


def test_dataset_headless_does_not_materialize(ray_session, capsys):
    """Headless Dataset printing must use count + limit(head), never a
    full to_pandas — pin via output shape (full row count reported, only
    `--head` rows printed)."""
    from ocr_ray.run_query import main

    assert main(["doc_clean", "/root/testdata/sf0.001", "--head", "2"]) == 0
    out = capsys.readouterr().out
    assert "doc_clean: 500 rows" in out
    # 2 data rows + 1 header line of the frame repr
    assert len([ln for ln in out.splitlines() if ln.strip()]) <= 4


def test_dataset_csv_out_refused(ray_session, tmp_path, capsys):
    """csv/jsonl write one driver-side file — refused for Dataset
    results with guidance toward the distributed parquet write."""
    from ocr_ray.run_query import main

    with pytest.raises(SystemExit):
        main(["doc_clean", "/root/testdata/sf0.001",
              "--out", str(tmp_path / "x.csv"), "--format", "csv"])
    assert "parquet" in capsys.readouterr().err


def test_list_runs_without_ray(capsys):
    """--list must not boot a Ray cluster (validated by NOT requesting
    the ray_session fixture here and asserting Ray stays down if it was
    down; when another test already started the session this still
    exercises the pre-init code path)."""
    import ray

    from ocr_ray.run_query import main

    was_up = ray.is_initialized()
    assert main(["--list"]) == 0
    assert ray.is_initialized() == was_up
    assert len(capsys.readouterr().out.split()) >= 200
