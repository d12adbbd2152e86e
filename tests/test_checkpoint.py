"""Resume semantics: kill after k partitions, rerun, identical output and
completed partitions skipped (SURVEY.md §5 resume test)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from deepseek_ocr_ray import PipelineConfig
from deepseek_ocr_ray.schema import write_interleaved
from deepseek_ocr_ray.state.checkpoint import (
    load_manifest,
    run_checkpointed,
    run_fingerprint,
)

N_DOCS = 64
N_PARTS = 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_interleaved(d, N_DOCS, seed=42, num_partitions=N_PARTS)
    return d


def _read_sorted(out_root):
    tbl = pq.read_table(out_root, columns=["doc_id", "markdown", "n_spans"])
    return tbl.sort_by("doc_id").to_pylist()


def test_resume_after_partial_run(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    cfg = PipelineConfig()

    # "crash" after 2 of 4 partitions
    s1 = run_checkpointed(corpus, out, cfg, max_partitions=2)
    assert len(s1["computed"]) == 2 and not s1["skipped"]
    m0 = load_manifest(out, s1["computed"][0])
    mtime0 = os.path.getmtime(
        os.path.join(out, "_ckpt", f"partition={s1['computed'][0]}.json")
    )

    # resume: finishes the rest, skips the done ones (manifests untouched)
    s2 = run_checkpointed(corpus, out, cfg)
    assert sorted(s2["skipped"]) == sorted(s1["computed"])
    assert len(s2["computed"]) == 2
    assert (
        os.path.getmtime(
            os.path.join(out, "_ckpt", f"partition={s1['computed'][0]}.json")
        )
        == mtime0
    )

    # third run: everything skipped
    s3 = run_checkpointed(corpus, out, cfg)
    assert not s3["computed"] and len(s3["skipped"]) == N_PARTS

    # full single-shot run in a fresh dir produces identical content
    out2 = str(tmp_path / "out2")
    run_checkpointed(corpus, out2, cfg)
    assert _read_sorted(out) == _read_sorted(out2)

    # manifests carry lineage + metrics
    assert m0["docs"] > 0 and m0["wall_sec"] > 0 and m0["input_fingerprint"]
    assert m0["config_fingerprint"] == run_fingerprint(cfg)


def test_config_change_invalidates(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(corpus, out, PipelineConfig(), partitions=[0])
    s = run_checkpointed(
        corpus, out, PipelineConfig(skip_repeat=False), partitions=[0]
    )
    assert s["computed"] == [0]  # different config ⇒ recompute, not skip


def test_input_change_invalidates(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed(corpus, out, PipelineConfig(), partitions=[1])
    # shrink the partition's input (valid parquet, different fingerprint)
    part_file = os.path.join(corpus, "part=1", "data.parquet")
    tbl = pq.read_table(part_file)
    pq.write_table(tbl.slice(0, tbl.num_rows - 1), part_file)
    try:
        s = run_checkpointed(corpus, out, PipelineConfig(), partitions=[1])
        assert s["computed"] == [1]
    finally:
        # restore the corpus deterministically for any later tests
        write_interleaved(corpus, N_DOCS, seed=42, num_partitions=N_PARTS)


def test_tmp_sweep_scoped_to_this_runs_partitions(ray_session, corpus, tmp_path):
    """Orphan .tmp-{pid}-* dirs are swept only for partitions THIS run
    processes — a concurrent run over a disjoint partition set must not
    lose its in-flight writes."""
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    mine = os.path.join(out, ".tmp-0-deadbeef")       # partition 0: this run's
    theirs = os.path.join(out, ".tmp-1-cafebabe")     # partition 1: other run's
    os.makedirs(mine)
    os.makedirs(theirs)

    run_checkpointed(corpus, out, PipelineConfig(), partitions=[0])
    assert not os.path.exists(mine), "this run's orphan tmp must be swept"
    assert os.path.exists(theirs), "another run's in-flight tmp must survive"
