"""Deterministic stub tokenizer (reference M7: HF tokenizer wrappers).

The reference loads a HuggingFace tokenizer at import time and wraps
encode/decode (/root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/
process/image_process.py:256-267, config.py:75-79).  No tokenizer weights
ship in this sandbox, so this module provides the same *interface* with
deterministic hash-derived ids over the engine's BPE-ish segmentation
(functions/text_stats.BPE_PATTERN): encode → decode round-trips exactly,
ids are stable across processes/machines, and the two table-cell special
tokens keep the reference's published ids (128821 ``<td>``, 128822
``</td>``) so the no-repeat-n-gram whitelist (T3) matches.

Swap surface for a real deployment: replace ``StubTokenizer`` with the HF
tokenizer; everything downstream (token ids into NoRepeatNGramProcessor,
token counting, cost models) is id-agnostic.
"""

from __future__ import annotations

import hashlib
import re

from .text_stats import _BPE_RE

# reference special-token ids (ngram_norepeat whitelist, vllm config)
SPECIAL_TOKENS: dict[str, int] = {
    "<td>": 128821,
    "</td>": 128822,
    "<｜end▁of▁sentence｜>": 128820,
}
_SPECIAL_BY_ID = {v: k for k, v in SPECIAL_TOKENS.items()}
# ids reserved by the interface: BOS (0) and the specials
_RESERVED_IDS = frozenset({0}) | frozenset(_SPECIAL_BY_ID)


def token_id(token: str) -> int:
    """Stable id for a token: special table first, else a 63-bit md5 hash
    (collision probability ~n²/2^64 — negligible even for huge vocabs,
    unlike a 17-bit fold which collides after a few hundred tokens).
    Hash ids landing on a reserved id are deterministically nudged."""
    sid = SPECIAL_TOKENS.get(token)
    if sid is not None:
        return sid
    h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "little") >> 1
    while h in _RESERVED_IDS:
        h += 3
    return h


class StubTokenizer:
    """encode/decode with the call shape of the reference's wrappers.

    ``encode`` segments with the BPE-ish pattern (lossless: segments
    concatenate back to the input) and maps each segment to a stable id;
    the instance remembers id→token so ``decode`` reconstructs exactly.
    BOS/EOS flags mirror the reference's encode(bos=..., eos=...).
    """

    BOS_ID = 0
    EOS_ID = SPECIAL_TOKENS["<｜end▁of▁sentence｜>"]

    def __init__(self) -> None:
        self._id_to_token: dict[int, str] = dict(_SPECIAL_BY_ID)
        self._special_split = re.compile(
            "(" + "|".join(re.escape(t) for t in SPECIAL_TOKENS) + ")"
        )

    def tokenize(self, text: str) -> list[str]:
        """Special tokens are atomic; everything between them segments with
        the BPE-ish pattern (lossless either way)."""
        out: list[str] = []
        for part in self._special_split.split(text):
            if not part:
                continue
            if part in SPECIAL_TOKENS:
                out.append(part)
            else:
                out.extend(_BPE_RE.findall(part))
        return out

    def encode(self, text: str, bos: bool = False, eos: bool = False) -> list[int]:
        ids: list[int] = [self.BOS_ID] if bos else []
        for tok in self.tokenize(text):
            tid = token_id(tok)
            self._id_to_token[tid] = tok
            ids.append(tid)
        if eos:
            ids.append(self.EOS_ID)
        return ids

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:
        parts: list[str] = []
        for tid in ids:
            if tid == self.BOS_ID:
                continue
            if skip_special_tokens and tid in _SPECIAL_BY_ID:
                continue
            tok = self._id_to_token.get(tid)
            if tok is not None:
                parts.append(tok)
        return "".join(parts)


try:  # pragma: no cover - transformers not installed in this sandbox
    import transformers  # noqa: F401

    HAVE_TRANSFORMERS = True
except ImportError:
    HAVE_TRANSFORMERS = False


class HFTokenizer:
    """Real-tokenizer adapter with the StubTokenizer call shape.

    The reference builds its processor around a HuggingFace tokenizer
    (DSV/process/image_process.py:256-267, config.py:75-79); this wraps one
    behind the same ``encode(text, bos, eos)`` / ``decode(ids)`` /
    ``BOS_ID`` / ``EOS_ID`` surface the rest of the engine consumes, so the
    production swap is constructing ``HFTokenizer(path)`` instead of
    ``StubTokenizer()``.  Import-gated: raises ImportError without
    ``transformers``; exercised by ``pytest.importorskip`` tests.
    """

    def __init__(self, name_or_path: str, *, trust_remote_code: bool = True):
        if not HAVE_TRANSFORMERS:
            raise ImportError(
                "HFTokenizer requires the transformers package; use "
                "StubTokenizer in environments without it"
            )
        from transformers import AutoTokenizer  # pragma: no cover

        self._tok = AutoTokenizer.from_pretrained(  # pragma: no cover
            name_or_path, trust_remote_code=trust_remote_code
        )
        # some HF tokenizers define only one of bos/eos (GPT-2 family);
        # substitute the other so encode(bos=True)/EOS strip never emit a
        # None id that breaks int64 array assembly downstream
        bos = self._tok.bos_token_id  # pragma: no cover
        eos = self._tok.eos_token_id  # pragma: no cover
        if bos is None and eos is None:  # pragma: no cover
            raise ValueError(
                f"tokenizer {name_or_path!r} defines neither bos nor eos "
                "token ids; set them on the HF tokenizer first"
            )
        self.BOS_ID = bos if bos is not None else eos  # pragma: no cover
        self.EOS_ID = eos if eos is not None else bos  # pragma: no cover

    def tokenize(self, text: str) -> list[str]:  # pragma: no cover
        return self._tok.tokenize(text)

    def encode(self, text: str, bos: bool = False, eos: bool = False) -> list[int]:  # pragma: no cover
        # reference encode semantics (image_process.py:256-263): raw ids,
        # bos/eos appended by flag, never injected by the tokenizer itself
        ids = self._tok.encode(text, add_special_tokens=False)
        if bos:
            ids = [self.BOS_ID] + ids
        if eos:
            ids = ids + [self.EOS_ID]
        return ids

    def decode(self, ids: list[int], skip_special_tokens: bool = True) -> str:  # pragma: no cover
        return self._tok.decode(ids, skip_special_tokens=skip_special_tokens)
