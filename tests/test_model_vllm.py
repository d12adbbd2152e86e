"""T2: the import-gated real-model (vLLM) actor class.

The sandbox has no vllm/GPU, so the real engine never constructs here — but
everything around it is plain Python and IS tested: the engine-kwarg shape
(pinned to the reference's LLM(...) call), the sampling params, the
no-repeat-ngram logits-processor adapter, the batch→generate→text plumbing
(with an injected fake engine), and the OcrStage backend dispatch.  A final
importorskip("vllm") test constructs the class against the real
SamplingParams where vllm is installed.
"""

from __future__ import annotations

import numpy as np
import pytest

from deepseek_ocr_ray.config import PipelineConfig
from deepseek_ocr_ray.stages.model_vllm import (
    VllmOcrModel,
    engine_kwargs,
    sampling_kwargs,
    vllm_ngram_logits_processor,
)


def test_engine_kwargs_match_reference_pins():
    """app/engine.py:89-101 / DSV/run_dpsk_ocr_pdf.py:34-48 constants."""
    cfg = PipelineConfig(ocr_batch_size=12, gpu_memory_utilization=0.9)
    kw = engine_kwargs(cfg, "/models/deepseek-ocr")
    assert kw["model"] == "/models/deepseek-ocr"
    assert kw["tokenizer"] == "/models/deepseek-ocr"  # defaults to model path
    assert kw["hf_overrides"] == {"architectures": ["DeepseekOCRForCausalLM"]}
    assert kw["block_size"] == 256
    assert kw["enforce_eager"] is False
    assert kw["trust_remote_code"] is False
    assert kw["max_model_len"] == 8192
    assert kw["swap_space"] == 0
    assert kw["max_num_seqs"] == 12
    assert kw["tensor_parallel_size"] == 1
    assert kw["gpu_memory_utilization"] == 0.9
    assert kw["disable_mm_preprocessor_cache"] is True
    kw2 = engine_kwargs(cfg, "/m", "/tok")
    assert kw2["tokenizer"] == "/tok"


def test_sampling_kwargs_match_reference_pins():
    """DSV/run_dpsk_ocr_pdf.py:52-59."""
    kw = sampling_kwargs(PipelineConfig())
    assert kw == {
        "temperature": 0.0,
        "max_tokens": 8192,
        "skip_special_tokens": False,
        "include_stop_str_in_output": True,
    }


def test_logits_processor_bans_repeat_and_respects_whitelist():
    """The adapter reproduces the reference processor's observable behavior
    (process/ngram_norepeat.py:18-40): completing a window-repeated n-gram
    is banned to -inf, whitelisted tokens never are, and untouched steps
    return scores unmodified (no copy)."""
    proc = vllm_ngram_logits_processor(3, 10, frozenset({7}))
    scores = np.zeros(16, dtype=np.float64)
    # history ...1,2,3... then current tail 1,2 → 3 would complete a repeat
    out = proc([1, 2, 3, 4, 5, 1, 2], scores)
    assert out is not scores  # copied before mutation
    assert out[3] == float("-inf")
    assert scores[3] == 0.0  # input untouched
    # whitelisted completion stays allowed
    out2 = proc([1, 2, 7, 4, 5, 1, 2], np.zeros(16))
    assert out2[7] == 0.0
    # no repetition → same object back
    s3 = np.zeros(16)
    assert proc([1, 2, 3], s3) is s3


class _FakeEngine:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.calls = []

    def generate(self, batch_inputs, sampling_params):
        self.calls.append((batch_inputs, sampling_params))

        class _Out:
            def __init__(self, text):
                self.outputs = [type("O", (), {"text": text})()]

        return [_Out(f"ocr::{b['prompt'][:4]}::{i}") for i, b in enumerate(batch_inputs)]


def _mock_model(cfg=None, **extra):
    cfg = cfg or PipelineConfig(model_path="/models/x", ocr_batch_size=8)
    holder = {}

    def factory(**kw):
        holder["engine"] = _FakeEngine(**kw)
        return holder["engine"]

    m = VllmOcrModel(
        cfg,
        decode_fn=lambda ref: f"img:{ref}",
        preprocess_fn=lambda img: {"pre": img},
        engine_factory=factory,
        **extra,
    )
    return m, holder["engine"]


def test_generate_plumbing_with_mock_engine():
    """Batch of refs → one engine call with prompt + multi_modal_data per
    input, outputs mapped back in order (DSV/run_dpsk_ocr_pdf.py:254-277)."""
    m, eng = _mock_model()
    texts = m.generate(["blob://a/1", "blob://a/2"])
    assert len(texts) == 2 and texts[0].endswith("::0") and texts[1].endswith("::1")
    assert len(eng.calls) == 1  # ONE generate for the whole batch
    batch, sp = eng.calls[0]
    assert [b["multi_modal_data"]["image"] for b in batch] == [
        {"pre": "img:blob://a/1"},
        {"pre": "img:blob://a/2"},
    ]
    assert all(b["prompt"] == m.prompt for b in batch)
    # sampling params carried the logits processor + reference pins
    assert sp["temperature"] == 0.0 and sp["max_tokens"] == 8192
    assert len(sp["logits_processors"]) == 1
    assert m.generate([]) == []
    assert len(eng.calls) == 1  # empty batch never hits the engine


def test_engine_factory_receives_reference_kwargs():
    cfg = PipelineConfig(model_path="/models/x", ocr_batch_size=16)
    m, eng = _mock_model(cfg)
    assert eng.kwargs["max_num_seqs"] == 16
    assert eng.kwargs["model"] == "/models/x"
    assert eng.kwargs["block_size"] == 256


def test_missing_model_path_raises():
    with pytest.raises(ValueError, match="model_path"):
        VllmOcrModel(PipelineConfig(), engine_factory=lambda **kw: None)


def test_default_decode_refuses_to_fabricate():
    m, _ = _mock_model(
        PipelineConfig(model_path="/m"),
    )
    from deepseek_ocr_ray.stages.model_vllm import _default_decode

    with pytest.raises(NotImplementedError, match="decode_fn"):
        _default_decode("blob://x/0")


def test_ocr_stage_dispatches_backend(monkeypatch):
    """OcrStage(model_backend='vllm') constructs the real-model class —
    verified with the class monkeypatched so no vllm import happens."""
    from deepseek_ocr_ray.stages import model_stub, model_vllm

    built = {}

    class _FakeVllmModel:
        def __init__(self, config):
            built["config"] = config

        def generate(self, refs):
            return ["fake"] * len(refs)

    monkeypatch.setattr(model_vllm, "VllmOcrModel", _FakeVllmModel)
    cfg = PipelineConfig(model_backend="vllm", model_path="/m")
    stage = model_stub.OcrStage(cfg)
    assert isinstance(stage.model, _FakeVllmModel)
    assert built["config"] is cfg
    # default stays the stub
    assert isinstance(
        model_stub.OcrStage(PipelineConfig()).model, model_stub.StubOcrModel
    )


def test_real_vllm_sampling_params_accept_our_kwargs():
    """Where vllm IS installed: the kwarg shapes construct real
    SamplingParams and the LLM signature accepts our engine kwargs."""
    vllm = pytest.importorskip("vllm")
    import inspect

    cfg = PipelineConfig(model_path="/m")
    sp = vllm.SamplingParams(
        **sampling_kwargs(cfg),
        logits_processors=[vllm_ngram_logits_processor(20, 50)],
    )
    assert sp.temperature == 0.0 and sp.max_tokens == 8192
    sig = inspect.signature(vllm.LLM.__init__)
    accepted = set(sig.parameters)
    if not any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    ):
        assert set(engine_kwargs(cfg, "/m")) <= accepted
