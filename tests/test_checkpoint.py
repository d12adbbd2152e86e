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


def test_lance_output_gate_raises_without_lib(ray_session, tmp_path):
    """In environments without pylance the lance path must fail loudly
    (never silently fall back to parquet)."""
    try:
        import lance  # noqa: F401

        pytest.skip("lance installed — gate not reachable")
    except ImportError:
        pass
    corpus = str(tmp_path / "in")
    write_interleaved(corpus, 20, seed=42, num_partitions=2)
    with pytest.raises(ImportError, match="pylance"):
        run_checkpointed(
            corpus, str(tmp_path / "out"), PipelineConfig(),
            output_format="lance",
        )


def test_unknown_output_format_rejected(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_interleaved(corpus, 20, seed=42, num_partitions=2)
    with pytest.raises(ValueError, match="output_format"):
        run_checkpointed(
            corpus, str(tmp_path / "out"), PipelineConfig(),
            output_format="orc",
        )


def test_output_format_in_lineage_fingerprint():
    """Switching the output format must invalidate resume skips — same
    config, different format → different fingerprint."""
    cfg = PipelineConfig()
    assert run_fingerprint(cfg, "none", "parquet") != run_fingerprint(
        cfg, "none", "lance"
    )
    # and the default signature is the parquet one (manifest compat)
    assert run_fingerprint(cfg) == run_fingerprint(cfg, "none", "parquet")


def test_lance_round_trip_and_resume(ray_session, tmp_path):
    """Gated: full extract → write_lance → manifest → resume-skip → read
    back through read_partition (prefers read_lance when the lib exists)."""
    pytest.importorskip("lance")
    corpus = str(tmp_path / "in")
    out = str(tmp_path / "out")
    write_interleaved(corpus, 30, seed=42, num_partitions=3)
    s1 = run_checkpointed(corpus, out, PipelineConfig(), output_format="lance")
    assert sorted(s1["computed"]) == [0, 1, 2]
    assert s1["total_docs"] == 30
    # resume skips everything
    s2 = run_checkpointed(corpus, out, PipelineConfig(), output_format="lance")
    assert s2["computed"] == [] and sorted(s2["skipped"]) == [0, 1, 2]
    # parquet-format rerun must NOT skip lance output
    s3 = run_checkpointed(corpus, out, PipelineConfig(), output_format="parquet")
    assert sorted(s3["computed"]) == [0, 1, 2]
    # read back partition 0 via the lance-preferring reader
    from deepseek_ocr_ray.sources.interleaved import read_partition

    ds = read_partition(out, 0)
    assert ds.count() > 0


# --- export_shards resume ---


def test_export_shards_resume_recomputes_only_missing(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import export_shards

    tab = pa.table({
        "doc_id": pa.array(list(range(900)), pa.int64()),
        "lang": pa.array([f"l{i % 3}" for i in range(900)], pa.string()),
    })
    out = str(tmp_path / "shards")
    ds = ray.data.from_arrow(tab).repartition(4)
    m1 = export_shards(ds, out, id_col="doc_id", n_shards=6)
    assert m1.num_rows == 6
    assert not any(m1["skipped"].to_pylist())
    assert sum(m1["n_rows"].to_pylist()) == 900
    before = {
        s: pq.read_table(p)
        for s, p in zip(m1["shard"].to_pylist(), m1["path"].to_pylist())
    }

    # crash simulation: two shard files vanish
    os.remove(os.path.join(out, "shard=1", "data.parquet"))
    os.remove(os.path.join(out, "shard=4", "data.parquet"))
    m2 = export_shards(ds, out, id_col="doc_id", n_shards=6)
    skipped = dict(zip(m2["shard"].to_pylist(), m2["skipped"].to_pylist()))
    assert skipped == {0: True, 1: False, 2: True, 3: True, 4: False, 5: True}
    after = {
        s: pq.read_table(p)
        for s, p in zip(m2["shard"].to_pylist(), m2["path"].to_pylist())
    }
    for s in range(6):  # recomputed shards are byte-identical
        assert after[s].equals(before[s])
    # positions are contiguous inside every shard file
    for s, t in after.items():
        assert t["pos"].to_pylist() == list(range(t.num_rows))
        assert set(t["shard"].to_pylist()) == {s}


# ---------------------------------------------------------------------------
# resumable span-level scrub
# ---------------------------------------------------------------------------


def _scrub_corpus(tmp_path, n_parts=4):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(10)]
    root = str(tmp_path / "in")
    doc_id = 0
    all_rows = []
    for pid in range(n_parts):
        d = os.path.join(root, f"part={pid}")
        os.makedirs(d)
        rows = []
        for _ in range(40):
            rows.append(
                (doc_id, " ".join(rng.choice(vocab, size=rng.integers(3, 20))))
            )
            doc_id += 1
        all_rows += rows
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            os.path.join(d, "data.parquet"),
        )
    return root, all_rows


def test_scrub_checkpointed_resume(ray_session, tmp_path):
    """First run computes every partition; a rerun skips all; deleting one
    partition's output recomputes exactly it, byte-identical; results
    match the non-checkpointed scrub over the union (the dup-gram set is
    corpus-global, not per-partition)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from deepseek_ocr_ray.pipelines.curation import substring_dup_scrub_ds
    from deepseek_ocr_ray.state.checkpoint import run_scrub_checkpointed

    root, rows = _scrub_corpus(tmp_path)
    out = str(tmp_path / "out")
    s1 = run_scrub_checkpointed(root, out, ngram=3)
    assert s1["computed"] == [0, 1, 2, 3] and s1["skipped"] == []

    # global-dup-set semantics: equals the plain scrub over the union
    whole = ray.data.read_parquet(root, columns=["doc_id", "text"])
    want = (
        substring_dup_scrub_ds(whole, ngram=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        pq.read_table(out, columns=None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = got[want.columns]
    pd.testing.assert_frame_equal(got, want)

    # rerun: everything skips
    s2 = run_scrub_checkpointed(root, out, ngram=3)
    assert s2["computed"] == [] and s2["skipped"] == [0, 1, 2, 3]

    # delete one partition's output+manifest → exactly it recomputes
    part2 = pq.read_table(os.path.join(out, "part=2")).sort_by("doc_id")
    import shutil

    shutil.rmtree(os.path.join(out, "part=2"))
    os.remove(os.path.join(out, "_ckpt", "partition=2.json"))
    s3 = run_scrub_checkpointed(root, out, ngram=3)
    assert s3["computed"] == [2] and sorted(s3["skipped"]) == [0, 1, 3]
    part2b = pq.read_table(os.path.join(out, "part=2")).sort_by("doc_id")
    assert part2b.equals(part2)

    # changing a parameter invalidates every skip
    s4 = run_scrub_checkpointed(root, out, ngram=4)
    assert s4["computed"] == [0, 1, 2, 3]
