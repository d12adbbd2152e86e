"""Text analysis kernels for large-scale training-data curation.

Beyond the reference's OCR/extraction scope (it has no corpus analytics at
all — SURVEY.md §2.9 lists only string plumbing), a 100 TB pipeline needs
per-document text statistics: token counts, quality signals (Gopher/C4-style
filters), language identification and content fingerprints.  Everything here
is a pure, vectorized function over a ``pyarrow`` batch — no Python loop over
rows in the hot path except where the kernel is inherently per-string
(fingerprint digest), and those use C-implemented primitives.

Semantics are deliberately chosen to be replicable in ANSI SQL (DuckDB) so
the driver's oracle harness can verify them exactly:

- ``n_chars``            = length(text)
- ``n_tokens``           = number of whitespace-separated tokens
- ``n_tokens_bpe``       = matches of a BPE-ish regex (no lookarounds, so the
                           same pattern runs under both Python ``re`` and
                           DuckDB's RE2)
- ``n_punct``            = count of ``[.,;:!?]`` characters
- ``n_stopwords``        = whitespace tokens (lowercased) in STOPWORDS
- ``fingerprint_md5``    = hex md5 of the raw text (= DuckDB ``md5(text)``)

``rolling_fingerprint`` (64-bit Rabin-Karp over the whole document) and
``lang_id`` (stopword-profile scoring) have no SQL equivalent and are
verified by unit tests instead.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish tokenizer pattern (GPT-2 style, simplified to avoid lookarounds so
# RE2/DuckDB and Python re agree exactly).  The trailing |' catches stray
# apostrophes so segmentation is LOSSLESS (segments concatenate back to the
# input — the stub tokenizer's decode guarantee).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s|'"
_BPE_RE = re.compile(BPE_PATTERN)

PUNCT_PATTERN = r"[.,;:!?]"

# Small fixed stopword list (must stay in sync with the oracle SQL emitted by
# ``stopword_sql_list`` below).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
)

# Per-language stopword profiles for the language-ID heuristic.  Ambiguous
# function words that appear in several of these languages are fine: scoring
# is additive and ties break by profile order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "are", "this", "have", "not"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "sich", "auf", "für", "ich"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "du", "dans", "que",
           "qui", "pas", "pour", "sur", "avec"),
    "es": ("el", "la", "los", "las", "y", "es", "una", "del", "en", "que",
           "no", "por", "con", "para", "se"),
    "it": ("il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "con", "del", "si", "più", "anche"),
    "pt": ("o", "a", "os", "as", "de", "que", "do", "da", "em", "um",
           "para", "não", "com", "uma", "por"),
    "nl": ("de", "het", "een", "van", "en", "is", "dat", "op", "te", "zijn",
           "voor", "met", "niet", "aan", "ook"),
}
_LANG_ORDER = tuple(LANG_PROFILES)


def stopword_sql_list() -> str:
    """DuckDB list literal matching STOPWORDS, for oracle SQL."""
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _token_membership_count(
    texts: pa.Array, wordset: tuple[str, ...]
) -> np.ndarray:
    """Per-row count of lowercase whitespace tokens that are in ``wordset``.

    Fully vectorized: split → flatten → is_in → segment-sum by parent index.
    Split by the RE2 ``\\s+`` pattern — the same expression the DuckDB
    oracle's ``string_split_regex`` uses, so edge-whitespace behavior agrees.
    """
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    hit = pc.is_in(flat, value_set=pa.array(wordset)).to_numpy(
        zero_copy_only=False
    )
    out = np.zeros(len(texts), dtype=np.int64)
    if len(parent):
        np.add.at(out, parent, hit.astype(np.int64))
    return out


def token_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count per row (0 for empty/blank text).

    Counted as ``\\S+`` runs so the semantics are EXACTLY the RE2 regex both
    Arrow and DuckDB use — a trim()-based split diverges on non-space
    whitespace (tabs/newlines at the edges).
    """
    return pc.count_substring_regex(_as_array(texts), r"\S+")


def bpe_token_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """BPE-ish token count via count_substring_regex (RE2, vectorized)."""
    return pc.count_substring_regex(_as_array(texts), BPE_PATTERN)


def punct_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pc.count_substring_regex(_as_array(texts), PUNCT_PATTERN)


def stopword_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pa.array(
        _token_membership_count(_as_array(texts), STOPWORDS), pa.int64()
    )


def md5_fingerprints(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hex md5 per row — the exact-dedup / lineage key (= DuckDB md5())."""
    return pa.array(
        [hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()
         for t in _as_array(texts).to_pylist()],
        pa.string(),
    )


# 64-bit Rabin-Karp polynomial fingerprint: base 1000003 mod 2^61-1, over the
# document's UTF-8 bytes.  Order-sensitive (unlike a bag-of-words hash) and
# computable incrementally over streamed chunks.
_RK_BASE = np.uint64(1000003)
_RK_MOD = np.uint64((1 << 61) - 1)


def rolling_fingerprint(text: str) -> int:
    """64-bit rolling-hash fingerprint of a document (vectorized over bytes)."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(data) == 0:
        return 0
    # Horner's rule in chunks; python ints avoid uint64 overflow in the fold
    h = 0
    base = int(_RK_BASE)
    mod = int(_RK_MOD)
    # chunked vectorized evaluation: h = (h * base^len + poly(chunk)) % mod
    chunk_size = 4096
    powers = pow(base, chunk_size, mod)
    for start in range(0, len(data), chunk_size):
        chunk = data[start : start + chunk_size].astype(np.object_)
        # vectorized Horner via numpy object dtype would be slow; use a
        # cumulative dot with precomputed power table instead
        n = len(chunk)
        pw = np.empty(n, dtype=np.object_)
        p = 1
        for i in range(n - 1, -1, -1):
            pw[i] = p
            p = (p * base) % mod
        val = int(np.dot(chunk, pw) % mod)
        h = (h * (powers if n == chunk_size else pow(base, n, mod)) + val) % mod
    return h


def rolling_fingerprints(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pa.array(
        [rolling_fingerprint(t) for t in _as_array(texts).to_pylist()],
        pa.uint64(),
    )


def lang_id(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Stopword-profile language ID over Latin-script languages, with a
    charset fast path for CJK / Cyrillic / Arabic / Greek.

    Vectorized: one token-membership pass per profile (7 passes total), then
    an argmax across the score matrix.  Returns ISO-639-1 codes, ``und`` when
    no profile scores a hit.
    """
    texts = _as_array(texts)
    n = len(texts)
    scores = np.zeros((len(_LANG_ORDER), n), dtype=np.int64)
    for li, code in enumerate(_LANG_ORDER):
        scores[li] = _token_membership_count(texts, LANG_PROFILES[code])
    best = np.argmax(scores, axis=0)  # ties → first profile in order
    hits = scores.max(axis=0)
    codes = np.array(_LANG_ORDER, dtype=object)[best]
    codes[hits == 0] = "und"

    # charset overrides (any hit of the script wins over Latin stopwords)
    for pat, code in (
        (r"[一-鿿]", "zh"),
        (r"[぀-ヿ]", "ja"),
        (r"[가-힯]", "ko"),
        (r"[Ѐ-ӿ]", "ru"),
        (r"[؀-ۿ]", "ar"),
        (r"[Ͱ-Ͽ]", "el"),
    ):
        m = pc.match_substring_regex(texts, pat).to_numpy(zero_copy_only=False)
        codes[m] = code
    return pa.array(codes, pa.string())


# --- Gopher/C4-style quality flags (integer outputs, SQL-replicable) -------


def quality_columns(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """All per-document quality/statistic columns in one vectorized pass.

    Returns int64/bool columns; ratios are derivable downstream.  Flag
    thresholds follow the Gopher rules (Rae et al. 2021, table A1) adapted to
    short synthetic docs: ``flag_*`` is 1 when the document PASSES the rule.
    """
    texts = _as_array(texts)
    n_chars = pc.utf8_length(texts)
    n_tokens = token_counts(texts)
    n_punct = punct_counts(texts)
    n_stop = stopword_counts(texts)
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.int64)
    np_ = n_punct.to_numpy(zero_copy_only=False).astype(np.int64)
    ns = n_stop

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(nt > 0, (nc - (nt - 1).clip(min=0)) / np.maximum(nt, 1), 0.0)

    flag_len = ((nt >= 5) & (nt <= 100_000)).astype(np.int64)
    flag_word_len = ((mean_word_len >= 2.0) & (mean_word_len <= 12.0)).astype(np.int64)
    flag_punct = np.where(nc > 0, np_ / np.maximum(nc, 1) <= 0.2, False).astype(np.int64)
    flag_stop = (ns.to_numpy(zero_copy_only=False) >= 1).astype(np.int64)
    quality_passes = flag_len + flag_word_len + flag_punct + flag_stop

    return {
        "n_chars": pa.array(nc, pa.int64()),
        "n_tokens": n_tokens.cast(pa.int64()),
        "n_tokens_bpe": bpe_token_counts(texts).cast(pa.int64()),
        "n_punct": pa.array(np_, pa.int64()),
        "n_stopwords": ns,
        "flag_len": pa.array(flag_len, pa.int64()),
        "flag_word_len": pa.array(flag_word_len, pa.int64()),
        "flag_punct": pa.array(flag_punct, pa.int64()),
        "flag_stop": pa.array(flag_stop, pa.int64()),
        "quality_passes": pa.array(quality_passes, pa.int64()),
    }


def doc_stats_batch(batch: pa.Table, *, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """map_batches UDF: (id, text) → full stats row (drops the text)."""
    cols = quality_columns(batch[text_col])
    out = {id_col: _as_array(batch[id_col])}
    out.update(cols)
    return pa.table(out)


def fingerprint_batch(batch: pa.Table, *, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    return pa.table(
        {
            id_col: _as_array(batch[id_col]),
            "fingerprint_md5": md5_fingerprints(batch[text_col]),
            "fingerprint_rk": rolling_fingerprints(batch[text_col]),
        }
    )


def lang_id_batch(batch: pa.Table, *, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    return pa.table(
        {
            id_col: _as_array(batch[id_col]),
            "lang_pred": lang_id(batch[text_col]),
        }
    )
