"""No-repeat-n-gram decoding constraint (reference T3).

Reimplements the semantics of the reference's vLLM logits processor
(/root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/process/ngram_norepeat.py:7-40)
without torch: given the generated token ids, compute the set of token ids
that may NOT be emitted next because they would complete an n-gram already
present inside a trailing window.  Tokens in the whitelist — the reference
ships ``{128821, 128822}``, the ``<td>``/``</td>`` ids, because table cells
legitimately repeat — are never banned.

Per-entry-point parameters (SURVEY.md §2.3 T3):

    image pipeline  ngram_size=30  window_size=90
    pdf   pipeline  ngram_size=20  window_size=50
    batch eval      ngram_size=40  window_size=90

This is per-sequence decoding state and lives inside the model actor; it is
exposed as a pure class so the stub pipeline and a future real vLLM actor
share one implementation (vLLM adapter = apply ``banned_tokens`` as -inf
logits).
"""

from __future__ import annotations

DEFAULT_WHITELIST = frozenset({128821, 128822})  # <td>, </td>


class NoRepeatNGramProcessor:
    """Stateless policy object; call :meth:`banned_tokens` per decode step."""

    def __init__(
        self,
        ngram_size: int,
        window_size: int,
        whitelist_token_ids: frozenset[int] | set[int] = DEFAULT_WHITELIST,
    ):
        if ngram_size < 1:
            raise ValueError("ngram_size must be >= 1")
        if window_size < ngram_size:
            raise ValueError("window_size must be >= ngram_size")
        self.ngram_size = ngram_size
        self.window_size = window_size
        self.whitelist = frozenset(whitelist_token_ids)

    def banned_tokens(self, token_ids: list[int]) -> set[int]:
        """Token ids that would complete a repeated n-gram within the window.

        The trailing (n-1)-gram of ``token_ids`` is matched against every
        position in the last ``window_size`` tokens; the token that followed
        each earlier occurrence is banned (minus the whitelist) — the same
        scan the reference does over the window slice.
        """
        n = self.ngram_size
        if len(token_ids) < n - 1:
            return set()
        window = token_ids[-self.window_size:]
        prefix = tuple(token_ids[-(n - 1):]) if n > 1 else ()
        banned: set[int] = set()
        # scan occurrences of prefix inside the window (excluding the
        # trailing position currently being extended)
        limit = len(window) - (n - 1)
        for i in range(limit):
            if tuple(window[i : i + n - 1]) == prefix:
                nxt = window[i + n - 1]
                if nxt not in self.whitelist:
                    banned.add(nxt)
        return banned

    def would_loop(self, token_ids: list[int]) -> bool:
        """True when every continuation of the current tail is banned-free
        repetition — the stub model uses this to decide a sequence "ran to
        max_tokens" (no-EOS page, SKIP_REPEAT candidate)."""
        n = self.ngram_size
        if len(token_ids) < 2 * n:
            return False
        return token_ids[-n:] == token_ids[-2 * n : -n]


# per-entry-point presets (reference values)
IMAGE_PRESET = dict(ngram_size=30, window_size=90)
PDF_PRESET = dict(ngram_size=20, window_size=50)
BATCH_EVAL_PRESET = dict(ngram_size=40, window_size=90)
