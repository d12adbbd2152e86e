"""deepseek_ocr_ray — a Ray-Data-native interleaved-document extraction engine.

Built from scratch against the capabilities of changxiaoyangbrain/DeepSeek-OCR
(reference studied in SURVEY.md; no code copied).  Public surface:

    from deepseek_ocr_ray import PipelineConfig, extract_dataset, extract_path
"""

from .config import PROMPT_MODES, RESOLUTION_PRESETS, PipelineConfig, get_prompt
from .pipelines.extract import extract_dataset, extract_path
from .schema import IN_SCHEMA, OUT_SCHEMA, gen_doc, synthesize_interleaved

__all__ = [
    "PipelineConfig",
    "PROMPT_MODES",
    "RESOLUTION_PRESETS",
    "get_prompt",
    "extract_dataset",
    "extract_path",
    "IN_SCHEMA",
    "OUT_SCHEMA",
    "gen_doc",
    "synthesize_interleaved",
]

__version__ = "0.1.0"
