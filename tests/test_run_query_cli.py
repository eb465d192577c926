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
