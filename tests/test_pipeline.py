"""Pipeline-level tests (FIXTURES.md §3): per-turn equality, order
independence, skew, and checkpoint-resume."""

import glob
import os
import shutil

import pandas as pd
import pytest

from ocr_ray.config import PipelineConfig
from ocr_ray.sources.transcripts import generate_transcripts

CFG = PipelineConfig(fragment_group_size=2, extract_concurrency=2, batch_size=512)


@pytest.fixture(scope="module")
def small_run(ray_session, tmp_path_factory):
    import ray.data as rd

    from ocr_ray.pipelines.extract import run_extraction_job

    root = str(tmp_path_factory.mktemp("graft"))
    in_dir = os.path.join(root, "in")
    out_dir = os.path.join(root, "out")
    generate_transcripts(in_dir, n_convs=24, seed=42, n_shards=4)
    metrics = run_extraction_job(os.path.join(in_dir, "transcripts"), out_dir, CFG)
    turns = rd.read_parquet(os.path.join(out_dir, "turns")).to_pandas()
    oracle = rd.read_parquet(os.path.join(in_dir, "oracle")).to_pandas()
    return root, in_dir, out_dir, turns, oracle, metrics


def test_per_turn_equality(small_run):
    _, _, _, turns, oracle, _ = small_run
    m = oracle.merge(turns, on=["conv_id", "turn_idx"], how="left", suffixes=("_o", ""))
    assert len(m) == len(oracle)
    assert (m["expected_extracted"] == m["extracted_text"]).all()
    assert (m["expected_clean"] == m["clean_text"]).all()


def test_error_and_empty_semantics(small_run):
    _, _, _, turns, oracle, _ = small_run
    m = oracle.merge(turns, on=["conv_id", "turn_idx"], suffixes=("_o", ""))
    errs = m[m["kind_o"] == "error"]
    assert len(errs) > 0
    assert (errs["extracted_text"] == "Error: All OCR engines failed").all()
    assert (errs["error"] == "boxed_parse_failed").all()
    empties = m[m["kind_o"] == "empty"]
    assert (empties["extracted_text"] == "").all()


def test_order_independence(small_run, tmp_path):
    """Shuffling input row order must not change any per-turn output."""
    import ray.data as rd

    from ocr_ray.pipelines.extract import build_turn_pipeline

    _, in_dir, _, turns, _, _ = small_run
    df = rd.read_parquet(os.path.join(in_dir, "transcripts")).to_pandas()
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    alt = tmp_path / "shuffled"
    alt.mkdir()
    df.to_parquet(alt / "all.parquet", index=False)

    got = build_turn_pipeline(str(alt / "all.parquet"), CFG).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = turns.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_series_equal(a["extracted_text"], b["extracted_text"])
    pd.testing.assert_series_equal(a["clean_text"], b["clean_text"])


def test_conversation_assembly_ordering(small_run):
    """conv_text holds every turn in turn_idx order (stable-ordering invariant)."""
    import ray.data as rd

    _, _, out_dir, turns, _, _ = small_run
    convs = rd.read_parquet(os.path.join(out_dir, "convs")).to_pandas()
    assert convs["n_turns"].sum() == len(turns)
    t = turns.sort_values(["conv_id", "turn_idx"])
    for conv_id, g in t.groupby("conv_id"):
        expected = "\n\n".join(
            f"[{r}] {c}" for r, c in zip(g["role"], g["clean_text"])
        )
        got = convs.loc[convs["conv_id"] == conv_id, "conv_text"].iloc[0]
        assert got == expected, conv_id


def test_skewed_conversation(ray_session, tmp_path):
    """A mega-conversation (~20%% of all turns) still reassembles correctly
    through the salted two-phase groupby."""
    import ray.data as rd

    from ocr_ray.pipelines.extract import run_extraction_job

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    generate_transcripts(in_dir, n_convs=20, seed=11, n_shards=2, mega_share=0.2)
    cfg = PipelineConfig(
        fragment_group_size=4, extract_concurrency=2, batch_size=512, salt_span=16
    )
    run_extraction_job(os.path.join(in_dir, "transcripts"), out_dir, cfg)
    turns = rd.read_parquet(os.path.join(out_dir, "turns")).to_pandas()
    oracle = rd.read_parquet(os.path.join(in_dir, "oracle")).to_pandas()
    m = oracle.merge(turns, on=["conv_id", "turn_idx"], suffixes=("_o", ""))
    assert (m["expected_clean"] == m["clean_text"]).all()

    convs = rd.read_parquet(os.path.join(out_dir, "convs")).to_pandas()
    mega = turns[turns["conv_id"] == "conv-00000000"].sort_values("turn_idx")
    assert len(mega) > 16  # spans multiple salt sub-groups
    expected = "\n\n".join(f"[{r}] {c}" for r, c in zip(mega["role"], mega["clean_text"]))
    got = convs.loc[convs["conv_id"] == "conv-00000000", "conv_text"].iloc[0]
    assert got == expected


def test_resume_skips_completed_groups(small_run):
    """Re-running the job must skip every committed group; invalidating one
    lineage record recomputes exactly that group, byte-identically."""
    import ray.data as rd

    from ocr_ray.pipelines.extract import run_extraction_job

    _, in_dir, out_dir, turns, _, _ = small_run
    tdir = os.path.join(in_dir, "transcripts")

    m2 = run_extraction_job(tdir, out_dir, CFG)
    assert m2["rows_processed"] == 0
    assert len(m2["groups_skipped"]) == m2["groups_total"] >= 2

    # simulate a crash that lost group 0's commit record
    lineage0 = os.path.join(out_dir, "turns", "_lineage", "group-00000.json")
    os.remove(lineage0)
    m3 = run_extraction_job(tdir, out_dir, CFG)
    assert 0 not in m3["groups_skipped"]
    assert m3["rows_processed"] > 0
    assert os.path.exists(lineage0)

    got = rd.read_parquet(os.path.join(out_dir, "turns")).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        turns.sort_values(key).reset_index(drop=True)[["conv_id", "turn_idx", "clean_text"]],
        got.sort_values(key).reset_index(drop=True)[["conv_id", "turn_idx", "clean_text"]],
    )


def test_lineage_records_complete(small_run):
    _, _, out_dir, turns, _, _ = small_run
    import json

    recs = sorted(glob.glob(os.path.join(out_dir, "turns", "_lineage", "*.json")))
    assert recs
    total = 0
    for p in recs:
        rec = json.load(open(p))
        assert rec["extractor_version"] == CFG.extractor_version
        assert rec["fragments"]
        assert len(rec["checksum"]) == 16
        total += rec["row_count"]
    assert total == len(turns)


def test_resume_recomputes_missing_convs(small_run, tmp_path):
    """A group committed with with_conversations=False must be recomputed by
    a later run that needs the convs partition (lineage alone is not
    sufficient evidence of completeness)."""
    from ocr_ray.pipelines.extract import run_extraction_job

    _, in_dir, _, _, _, _ = small_run
    tdir = os.path.join(in_dir, "transcripts")
    out_dir = str(tmp_path / "out_noconvs")

    m1 = run_extraction_job(tdir, out_dir, CFG, with_conversations=False)
    assert m1["rows_processed"] > 0
    assert not glob.glob(os.path.join(out_dir, "convs", "*", "*.parquet"))

    m2 = run_extraction_job(tdir, out_dir, CFG, with_conversations=True)
    assert m2["groups_skipped"] == []          # nothing may be skipped
    assert m2["rows_processed"] == m1["rows_processed"]
    assert glob.glob(os.path.join(out_dir, "convs", "*", "*.parquet"))

    m3 = run_extraction_job(tdir, out_dir, CFG, with_conversations=True)
    assert m3["rows_processed"] == 0           # now genuinely complete


def test_config_file_surface(ray_session, tmp_path):
    """§2.9 parity: a pipeline is assembled from a JSON config file with
    dot-path overrides (ocr_app/config/settings.py:94-133 analog) — and an
    engine flipped off via the file actually changes extraction."""
    import json

    import pyarrow as pa

    from ocr_ray.config import (
        DEFAULT_CONFIG,
        config_get,
        config_set,
        config_to_dict,
        load_config,
        save_config,
    )
    from ocr_ray.stages.extract import Extractor

    # round trip
    path = str(tmp_path / "config.json")
    save_config(DEFAULT_CONFIG, path)
    assert load_config(path) == DEFAULT_CONFIG

    # dot-path get/set
    d = config_to_dict(DEFAULT_CONFIG)
    assert config_get(d, "extraction.cleanup_mode") == "extracted"
    assert config_get(d, "no.such.path", "fallback") == "fallback"
    config_set(d, "extraction.engines", ["density"])
    assert config_get(d, "extraction.engines") == ["density"]

    # file + overrides -> pipeline behavior change: only 'density' runs, so
    # a sparse-words payload (density extracts nothing) falls to naive_strip
    with open(path, "w") as f:
        json.dump(d, f)
    cfg = load_config(path, {"execution.batch_size": 128})
    assert cfg.engines == ("density",) and cfg.batch_size == 128

    batch = pa.table({"norm_text": ["<p>one two</p>"], "kind": ["html"]})
    out_density = Extractor(cfg)(batch)
    out_default = Extractor(DEFAULT_CONFIG)(batch)
    assert out_density["engine"].to_pylist() == ["naive_strip"]
    assert out_default["engine"].to_pylist() == ["tagstrip"]

    # unknown override paths are typo-protected
    try:
        load_config(path, {"extraction.enginez": ["x"]})
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_run_job_cli_smoke(tmp_path):
    """``python -m ocr_ray.run_job`` end-to-end in a fresh process (the
    ``ray job submit`` entry path): runs the job twice against the same
    output dir and asserts the second run resumes (zero recomputed groups),
    with metrics JSON on stdout both times."""
    import json as _json
    import subprocess
    import sys as _sys

    from ocr_ray.sources.transcripts import generate_transcripts

    in_dir = generate_transcripts(str(tmp_path / "gen"), n_convs=40,
                                  n_shards=4, with_oracle=False)
    out_dir = str(tmp_path / "out")
    cmd = [_sys.executable, "-m", "ocr_ray.run_job",
           "--input", str(tmp_path / "gen" / "transcripts"),
           "--output", out_dir,
           "--concurrency", "2", "--batch-size", "256"]
    env = {**__import__("os").environ, "RAY_ADDRESS": ""}
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=600, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["groups_total"] >= 1 and m1["rows_processed"] > 0
    assert m1["groups_skipped"] == []

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert len(m2["groups_skipped"]) == m1["groups_total"]
    assert m2["rows_processed"] == 0
