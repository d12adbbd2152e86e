"""Deterministic stand-ins for the GPU model stage and the media decoder.

No GPU, no model weights and no image libraries ship in this sandbox, so the
vLLM actor (reference: engine singleton at /root/reference/app/engine.py:27-131,
model at DSV/deepseek_ocr.py:261-582) is replaced by a **deterministic stub**
with the same interface shape: load-once state in ``__init__``, batch-in /
batch-out ``__call__``.  The stub's output is a pure function of
``media_ref`` and exercises every branch of the reference's output grammar:

- grounded markup ``<|ref|>label<|/ref|><|det|>[[x1,y1,x2,y2],...]<|/det|>``
  with single and multi-box refs (coords on the 0-999 grid),
- image refs (→ crops / markdown image substitution),
- tables with ``<td>`` cells (the no-repeat whitelist tokens),
- display formulas with ``\\quad (N)`` equation tags (clean_formula cases),
- ``\\coloneqq`` / ``\\eqqcolon`` and 3-4 newline runs (cleaner cases),
- occasionally malformed coordinate literals (must be skipped safely —
  the reference ``eval``s and drops them, app/processors.py:69-71),
- a ~3% no-EOS tail (generation "ran to max_tokens repeating"; SKIP_REPEAT
  drops such pages, DSV/run_dpsk_ocr_pdf.py:295-299).

Swapping in the real model is a CONFIG switch, not a code edit:
``PipelineConfig(model_backend="vllm", model_path=...)`` dispatches
``OcrStage`` to :class:`~.model_vllm.VllmOcrModel` — the import-gated real
engine wrapper with this stub's exact interface (tested with a mocked
engine in tests/test_model_vllm.py); every other stage is production code.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.grounding import EOS_MARKER
from ..functions.tiling import count_tiles, num_image_tokens
from ..schema import MEDIA_KINDS

# Page-size table spanning the tiling decision space (FIXTURES.md F4):
# ≤640×640 → untiled; the rest hit distinct (w,h) grids.
_PAGE_DIMS: list[tuple[int, int]] = [
    (640, 640),
    (512, 512),
    (800, 600),
    (1024, 1024),
    (1280, 720),
    (900, 1800),
    (2000, 500),
    (4000, 3000),
    (1100, 1100),
]

_WORDS = (
    "stream arrow block ratio lemma graph signal matrix vector tensor "
    "theorem proof corollary figure caption axis legend model layer token"
).split()


def _ref_rng(media_ref: str) -> np.random.RandomState:
    h = hashlib.md5(media_ref.encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def fake_decode_dims(media_ref: str) -> tuple[int, int]:
    """Deterministic page (width, height) for a media_ref.

    Stands in for image decode / PDF rasterization (reference
    ``pdf_to_images_high_quality``, DSV/run_dpsk_ocr_pdf.py:70-101 and
    ``load_image``, run_dpsk_ocr_image.py:40-54).  A real deployment decodes
    the bytes behind the ref; the Ray-side plumbing is identical.
    """
    rng = _ref_rng(media_ref + "#dims")
    return _PAGE_DIMS[int(rng.randint(0, len(_PAGE_DIMS)))]


def _box(rng: np.random.RandomState) -> str:
    x1, y1 = int(rng.randint(0, 900)), int(rng.randint(0, 900))
    x2, y2 = int(rng.randint(x1 + 10, 1000)), int(rng.randint(y1 + 10, 1000))
    return f"[{x1}, {y1}, {x2}, {y2}]"


def _det(rng: np.random.RandomState, n_boxes: int = 1, malformed: bool = False) -> str:
    if malformed:
        # two reference-observed failure shapes: truncated box, non-numeric
        return "[[12, 34, 56]]" if rng.rand() < 0.5 else "[[a, b, c, d]]"
    return "[" + ", ".join(_box(rng) for _ in range(n_boxes)) + "]"


def _sent(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))


def generate_page_markdown(media_ref: str) -> str:
    """The stub "model": raw grounded-markdown output for one page.

    Pure function of ``media_ref`` — identical at any parallelism level, on
    resume, and between the pipeline and the sequential test oracle.
    """
    rng = _ref_rng(media_ref + "#gen")
    parts: list[str] = []
    n_elems = int(rng.randint(2, 9))
    for _ in range(n_elems):
        r = rng.rand()
        malformed = rng.rand() < 0.02
        if r < 0.15:
            parts.append(
                f"<|ref|>title<|/ref|><|det|>{_det(rng, 1, malformed)}<|/det|>"
                f"# {_sent(rng, int(rng.randint(2, 6)))}\n\n"
            )
        elif r < 0.55:
            body = _sent(rng, int(rng.randint(10, 40)))
            if rng.rand() < 0.15:
                body += " \\coloneqq " + _sent(rng, 3)
            if rng.rand() < 0.1:
                body += " \\eqqcolon " + _sent(rng, 2)
            nl = "\n" * int(rng.choice([2, 2, 2, 3, 4]))
            nb = 2 if rng.rand() < 0.15 else 1
            parts.append(
                f"<|ref|>text<|/ref|><|det|>{_det(rng, nb, malformed)}<|/det|>"
                f"{body}{nl}"
            )
        elif r < 0.70:
            parts.append(
                f"<|ref|>image<|/ref|><|det|>{_det(rng, 1, malformed)}<|/det|>\n"
            )
        elif r < 0.82:
            rows = "".join(
                "<tr>"
                + "".join(
                    f"<td>{_sent(rng, 2)}</td>" for _ in range(int(rng.randint(2, 4)))
                )
                + "</tr>"
                for _ in range(int(rng.randint(1, 4)))
            )
            parts.append(
                f"<|ref|>table<|/ref|><|det|>{_det(rng, 1, malformed)}<|/det|>"
                f"<table>{rows}</table>\n\n"
            )
        else:
            tag = f" \\quad ({int(rng.randint(1, 20))})" if rng.rand() < 0.7 else ""
            parts.append(
                f"<|ref|>formula<|/ref|><|det|>{_det(rng, 1, malformed)}<|/det|>"
                f"\\[ E_{{{int(rng.randint(0, 9))}}} = m c^2{tag} \\]\n\n"
            )
    out = "".join(parts)
    if rng.rand() >= 0.03:  # ~3% of pages repeat to max_tokens → no EOS marker
        out += EOS_MARKER
    return out


def generate_page_plain(media_ref: str) -> str:
    """Non-grounding-mode stub output (Free OCR / Describe / Parse Figure):
    plain text, no ref/det markup (reference prompt table rows without
    ``<|grounding|>``, app/config.py:40-71)."""
    rng = _ref_rng(media_ref + "#plain")
    paras = [
        _sent(rng, int(rng.randint(15, 50)))
        for _ in range(int(rng.randint(1, 4)))
    ]
    out = "\n\n".join(paras)
    if rng.rand() >= 0.03:
        out += EOS_MARKER
    return out


def generate_page_locate(media_ref: str, target: str) -> str:
    """Locate-mode stub output: 0-2 grounded refs whose label is the target
    text (reference prompt ``Locate <|ref|>{t}<|/ref|> ...``,
    app/config.py:104-123)."""
    rng = _ref_rng(media_ref + "#locate")
    n = int(rng.randint(0, 3))
    parts = [
        f"<|ref|>{target}<|/ref|><|det|>{_det(rng, 1)}<|/det|>\n"
        for _ in range(n)
    ]
    out = "".join(parts)
    if rng.rand() >= 0.03:  # same ~3% no-EOS tail as the other grammars
        out += EOS_MARKER
    return out


class DeltaStreamPrinter:
    """W6: incremental text streaming with printed-length delta semantics.

    Mirrors the reference's async-generation progress loop
    (DSV/run_dpsk_ocr_image.py:194-216): each ``feed(full_text)`` receives
    the generation-so-far and writes only the unseen suffix
    (``full_text[printed_length:]``), then records the new length —
    including the reference's behavior when the text shrinks (the slice is
    empty and the printed length follows the text down).  ``finish()``
    writes the terminal blank line (the reference's ``print('\\n')`` emits
    two newlines) and resets for the next request.

    Actor-side: each OCR actor owns one printer, so progress interleaves
    per actor process exactly like per-request engine output would.
    """

    def __init__(self, stream=None):
        import sys

        self._stream = stream if stream is not None else sys.stdout
        self._printed = 0

    def feed(self, full_text: str) -> str:
        new_text = full_text[self._printed :]
        if new_text:
            self._stream.write(new_text)
            self._stream.flush()
        self._printed = len(full_text)
        return new_text

    def finish(self) -> None:
        self._stream.write("\n\n")
        self._stream.flush()
        self._printed = 0


class StubOcrModel:
    """Load-once "model" with the call shape of a vLLM engine wrapper.

    ``__init__`` is the once-per-actor setup (the reference builds the vLLM
    engine once per process and reuses it, app/engine.py:27-131, and warms it
    up, app/engine.py:150-249); ``generate`` is batch-in/batch-out like
    ``llm.generate`` (DSV/run_dpsk_ocr_pdf.py:274-277).  Output grammar
    follows the prompt mode (M1 dispatch): grounding modes emit ref/det
    markup, non-grounding modes plain text, locate mode target-labeled refs.
    """

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.prompt = config.prompt
        self.has_grounding = config.has_grounding
        self.mode = config.prompt_mode
        # warmup: one tiny deterministic generation (availability smoke)
        generate_page_markdown("warmup://0")

    def _one(self, ref: str) -> str:
        if self.mode == "locate":
            return generate_page_locate(ref, self.config.prompt_text.strip())
        if self.has_grounding:
            return generate_page_markdown(ref)
        return generate_page_plain(ref)

    def generate(self, media_refs: list[str]) -> list[str]:
        return [self._one(r) for r in media_refs]


class OcrStage:
    """Actor-pool ``map_batches`` stage: OCR for media units, passthrough else.

    Adds columns ``raw_text`` (null for non-media rows), ``page_w``/``page_h``,
    ``n_tiles`` and ``vision_tokens`` (the cost model of deepseek_ocr.py:61-106
    — used for size-balanced batching at scale).  Rows whose media_ref is
    malformed are quarantined via the ``unit_error`` column instead of being
    dropped (the reference skips bad inputs with a warning,
    app/processors.py:345-358 — silent drops break resumability accounting).
    """

    def __init__(
        self,
        config: PipelineConfig | None = None,
        *,
        stream_progress: bool = False,
        progress_stream=None,
    ):
        self.config = config or PipelineConfig()
        if self.config.model_backend == "vllm":
            # real-model dispatch (import-gated; see stages/model_vllm.py)
            from .model_vllm import VllmOcrModel

            self.model = VllmOcrModel(self.config)
        else:
            self.model = StubOcrModel(self.config)
        # W6 sink: opt-in actor-side streaming of each unit's text as it is
        # produced (the stub generates whole pages, so each unit arrives as
        # one delta; a token-streaming model feeds the same printer
        # incrementally)
        self.printer = (
            DeltaStreamPrinter(progress_stream) if stream_progress else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        n = len(kinds)
        raw = [None] * n
        pw = [0] * n
        ph = [0] * n
        tiles = [0] * n
        vtok = [0] * n
        err = [None] * n
        cfg = self.config
        todo_idx: list[int] = []
        todo_ref: list[str] = []
        for i, (k, ref) in enumerate(zip(kinds, refs)):
            if k not in MEDIA_KINDS:
                continue
            if not ref.startswith("blob://"):
                err[i] = f"bad media_ref: {ref!r}"
                continue
            w, h = fake_decode_dims(ref)
            pw[i], ph[i] = w, h
            if cfg.crop_mode and not (w <= 640 and h <= 640):
                wt, ht = count_tiles(w, h, cfg.min_crops, cfg.max_crops, cfg.image_size)
            else:
                wt = ht = 1
            tiles[i] = wt * ht
            vtok[i] = num_image_tokens(
                w, h, cfg.base_size, cfg.image_size, cfg.crop_mode,
                cfg.min_crops, cfg.max_crops, tiles=(wt, ht),
            )
            todo_idx.append(i)
            todo_ref.append(ref)
        for i, text in zip(todo_idx, self.model.generate(todo_ref)):
            raw[i] = text
            if self.printer is not None:
                self.printer.feed(text)
                self.printer.finish()
        return (
            batch.append_column("raw_text", pa.array(raw, pa.large_string()))
            .append_column("page_w", pa.array(pw, pa.int32()))
            .append_column("page_h", pa.array(ph, pa.int32()))
            .append_column("n_tiles", pa.array(tiles, pa.int32()))
            .append_column("vision_tokens", pa.array(vtok, pa.int32()))
            .append_column("unit_error", pa.array(err, pa.string()))
        )
