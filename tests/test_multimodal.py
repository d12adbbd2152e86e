"""Multimodal stage tests — the Ray-side plumbing (schemas, fan-out,
quarantine) is real; the codec kernels are deterministic fakes."""

from __future__ import annotations

import pyarrow as pa

from deepseek_ocr_ray.stages import multimodal as mm


def test_decode_stage_schema_and_determinism():
    tbl = mm.synthesize_media_table(8, seed=1)
    stage = mm.DecodeImageStage()
    out1 = stage(tbl)
    out2 = stage(tbl)
    assert out1.equals(out2)
    assert "payload" not in out1.column_names
    for col in ("width", "height", "mode", "mean_rgb", "decode_error"):
        assert col in out1.column_names
    assert all(e is None for e in out1["decode_error"].to_pylist())


def test_decode_stage_quarantines_empty_payload():
    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([b"", b"realbytes"], pa.binary()),
        }
    )
    out = mm.DecodeImageStage()(tbl)
    errs = out["decode_error"].to_pylist()
    assert errs[0] == "empty payload" and errs[1] is None
    assert out.num_rows == 2  # quarantined, not dropped


def test_resize_stage_geometry():
    tbl = pa.table(
        {
            "width": pa.array([2048, 512, 100], pa.int32()),
            "height": pa.array([1024, 512, 3000], pa.int32()),
        }
    )
    out = mm.ResizeStage(target=1024)(tbl)
    assert out["resized_w"].to_pylist() == [1024, 512, 34]
    assert out["resized_h"].to_pylist() == [512, 512, 1024]


def test_frame_sample_fanout():
    tbl = pa.table({"media_ref": pa.array(["blob://v/1", "blob://v/2"])})
    stage = mm.FrameSampleStage(stride=10, max_frames=5)
    out = stage(tbl)
    assert out.num_rows <= 10
    refs = out["media_ref"].to_pylist()
    frames = out["frame_no"].to_pylist()
    # per-ref frame numbers ascend in stride steps from 0
    for ref in set(refs):
        fs = [f for r, f in zip(refs, frames) if r == ref]
        assert fs == sorted(fs) and fs[0] == 0
        assert all(f % 10 == 0 for f in fs)
    assert stage(tbl).equals(out)  # deterministic


def test_audio_stage():
    tbl = mm.synthesize_media_table(4, seed=9)
    out = mm.AudioFeatureStage()(tbl)
    assert out.num_rows == 4
    assert all(d > 0 for d in out["duration_sec"].to_pylist())
    assert set(out["sample_rate"].to_pylist()) <= {16000, 22050, 44100, 48000}


def test_real_codec_gate():
    import pytest

    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.DecodeImageStage(use_real_codec=True)
