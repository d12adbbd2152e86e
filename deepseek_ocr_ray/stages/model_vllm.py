"""Import-gated REAL-model actor class: a vLLM engine behind the exact
interface of :class:`~.model_stub.StubOcrModel`.

This makes "swap the stub for the real model" a tested code path instead of
a documentation claim: ``OcrStage`` dispatches here when
``PipelineConfig.model_backend == "vllm"`` and nothing else in the pipeline
changes.  The sandbox has no GPU/vllm, so the real import is gated — but the
engine-kwarg shape, the sampling parameters, the no-repeat-ngram logits
processor adapter, and the batch→generate→text plumbing are all plain
Python, constructed and unit-tested here with an injected fake engine.

Reference parity (studied, not copied):

- engine construction kwargs: /root/reference/app/engine.py:89-101 and
  DSV/run_dpsk_ocr_pdf.py:34-48 (block_size=256, hf_overrides architecture
  override, swap_space=0, tensor_parallel_size=1, max_model_len=8192,
  max_num_seqs = concurrency, gpu_memory_utilization)
- sampling params: DSV/run_dpsk_ocr_pdf.py:52-59 (temperature 0, max_tokens
  8192, logits_processors=[NoRepeatNGram...], skip_special_tokens=False,
  include_stop_str_in_output=True)
- batch call: DSV/run_dpsk_ocr_pdf.py:254-277 (preprocess each image →
  {"prompt", "multi_modal_data": {"image": ...}} → one ``llm.generate``
  over the whole batch → ``output.outputs[0].text`` per input)
"""

from __future__ import annotations

from typing import Any, Callable

from ..config import PipelineConfig
from ..functions.ngram_norepeat import DEFAULT_WHITELIST, NoRepeatNGramProcessor


def engine_kwargs(
    config: PipelineConfig,
    model_path: str,
    tokenizer_path: str | None = None,
) -> dict[str, Any]:
    """The exact ``vllm.LLM(...)`` kwargs the reference uses
    (app/engine.py:89-101) with the engine-shape knobs taken from the
    pipeline config: ``max_num_seqs`` is the per-actor concurrent-sequence
    budget (= ``ocr_batch_size``, the unit A3's pool sizing already counts
    in), ``max_model_len`` tracks ``max_tokens``."""
    return {
        "model": model_path,
        "tokenizer": tokenizer_path or model_path,
        "hf_overrides": {"architectures": ["DeepseekOCRForCausalLM"]},
        "block_size": 256,
        "enforce_eager": False,
        "trust_remote_code": False,
        "max_model_len": config.max_tokens,
        "swap_space": 0,
        "max_num_seqs": config.ocr_batch_size,
        "tensor_parallel_size": 1,
        "gpu_memory_utilization": config.gpu_memory_utilization,
        "disable_mm_preprocessor_cache": True,
    }


def sampling_kwargs(config: PipelineConfig) -> dict[str, Any]:
    """Greedy decoding to ``max_tokens`` with special tokens kept — the
    span parser consumes the ref/det markup downstream
    (DSV/run_dpsk_ocr_pdf.py:52-59)."""
    return {
        "temperature": 0.0,
        "max_tokens": config.max_tokens,
        "skip_special_tokens": False,
        "include_stop_str_in_output": True,
    }


def vllm_ngram_logits_processor(
    ngram_size: int,
    window_size: int,
    whitelist: frozenset[int] = DEFAULT_WHITELIST,
) -> Callable:
    """Adapt the engine's :class:`NoRepeatNGramProcessor` policy to vLLM's
    per-step logits-processor contract ``(token_ids, scores) -> scores``
    (reference process/ngram_norepeat.py:18-40).  Framework-agnostic: works
    on torch tensors (``.clone``) and numpy arrays (``.copy``) alike."""
    policy = NoRepeatNGramProcessor(
        ngram_size=ngram_size,
        window_size=window_size,
        whitelist_token_ids=whitelist,
    )

    def processor(token_ids, scores):
        banned = policy.banned_tokens(list(token_ids))
        if banned:
            scores = scores.clone() if hasattr(scores, "clone") else scores.copy()
            for t in banned:
                scores[t] = float("-inf")
        return scores

    return processor


def _default_decode(media_ref: str):
    """media_ref → PIL image.  Resolution of ``blob://`` refs against the
    production blob store is deployment-specific — inject ``decode_fn``
    with your store client.  No default exists on purpose: silently
    fabricating pixels for a real model would corrupt output."""
    raise NotImplementedError(
        "VllmOcrModel needs a decode_fn mapping media_ref -> PIL.Image "
        f"(cannot resolve {media_ref!r}); pass decode_fn= at construction"
    )


def _default_preprocess(config: PipelineConfig) -> Callable:
    """PIL image → model input via the engine's real pixel path
    (pixel_preprocess_pil: decode→tile→pad→normalize→tokenize, the same
    7-tuple the reference's DeepseekOCRProcessor.tokenize_with_images
    builds, DSV/run_dpsk_ocr_pdf.py:254-263)."""
    from ..functions.preprocess import pixel_preprocess_pil

    def preprocess(image):
        pre, _global_views, _local_views = pixel_preprocess_pil(
            image,
            prompt=config.prompt,
            base_size=config.base_size,
            image_size=config.image_size,
            cropping=config.crop_mode,
            min_crops=config.min_crops,
            max_crops=config.max_crops,
        )
        return pre

    return preprocess


class VllmOcrModel:
    """Drop-in for ``StubOcrModel``: load-once engine in ``__init__``,
    batch-in/batch-out ``generate(media_refs) -> list[str]``.

    ``engine_factory`` / ``sampling_params_factory`` exist for tests (and
    alternative backends): when given, they receive the exact kwargs the
    real ``vllm.LLM`` / ``vllm.SamplingParams`` would, and the vllm import
    is skipped entirely.  In production leave them None and the gated
    import builds the real engine."""

    def __init__(
        self,
        config: PipelineConfig,
        *,
        model_path: str | None = None,
        tokenizer_path: str | None = None,
        decode_fn: Callable | None = None,
        preprocess_fn: Callable | None = None,
        engine_factory: Callable | None = None,
        sampling_params_factory: Callable | None = None,
    ):
        self.config = config
        self.prompt = config.prompt
        self.decode_fn = decode_fn or _default_decode
        # preprocess resolution is lazy for the default so a mocked-engine
        # construction needs neither vllm nor PIL
        self._preprocess_fn = preprocess_fn
        path = model_path or config.model_path
        if not path:
            raise ValueError(
                "model_backend='vllm' needs PipelineConfig.model_path "
                "(or model_path=) pointing at the DeepSeek-OCR weights"
            )
        proc = vllm_ngram_logits_processor(
            config.ngram_size, config.ngram_window
        )
        ekw = engine_kwargs(config, path, tokenizer_path)
        skw = {**sampling_kwargs(config), "logits_processors": [proc]}
        if engine_factory is not None:
            self.llm = engine_factory(**ekw)
            self.sampling_params = (sampling_params_factory or dict)(**skw)
        else:  # pragma: no cover - needs vllm + GPU
            from vllm import LLM, SamplingParams  # import gate

            self.llm = LLM(**ekw)
            self.sampling_params = SamplingParams(**skw)

    @property
    def preprocess_fn(self) -> Callable:
        if self._preprocess_fn is None:
            self._preprocess_fn = _default_preprocess(self.config)
        return self._preprocess_fn

    def generate(self, media_refs: list[str]) -> list[str]:
        """Decode + preprocess every ref, ONE engine call for the whole
        batch (vLLM schedules up to max_num_seqs concurrently), outputs in
        input order (DSV/run_dpsk_ocr_pdf.py:274-277)."""
        if not media_refs:
            return []
        pre = self.preprocess_fn
        batch_inputs = [
            {
                "prompt": self.prompt,
                "multi_modal_data": {"image": pre(self.decode_fn(r))},
            }
            for r in media_refs
        ]
        outputs = self.llm.generate(
            batch_inputs, sampling_params=self.sampling_params
        )
        return [o.outputs[0].text for o in outputs]
