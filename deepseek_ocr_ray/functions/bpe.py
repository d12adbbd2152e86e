"""Character-level BPE merge training and greedy encoding kernels.

These are the PURE, driver-side halves of the tokenizer-training
pipelines in ``pipelines/curation.py``: the distributed part of BPE
training is exactly ONE corpus exchange (the word-frequency reduction —
``_corpus_word_counts``), after which the entire merge loop operates on
the vocabulary-bounded (word, count) table, the same decomposition real
BPE trainers use (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; GPT-2's bpe()).

Semantics pinned here (and replicated by the brute-force test oracle):

- pair counting is PER ADJACENT POSITION (``"aaa"`` contributes the pair
  ``(a, a)`` twice), weighted by the word's corpus frequency;
- the winning merge each round is ``(count DESC, left ASC, right ASC)``;
- merge application is greedy left-to-right and non-overlapping
  (``aaaa`` under merge ``(a, a)`` becomes ``(aa)(aa)``);
- encoding applies merges in rank order: repeatedly find the
  lowest-rank adjacent pair present in the word and merge ALL its
  occurrences left-to-right (the GPT-2 ``bpe()`` loop).

Scale note: the naive full recount per round below is O(vocab · word
length · n_merges) on the REDUCED table — fine at any corpus size whose
vocabulary fits one node (the standard assumption; the classic
incremental-update optimization slots in here without touching the
distributed shape if vocabularies ever exceed that).
"""

from __future__ import annotations

import numpy as np


def merge_word(
    seg: tuple[str, ...], left: str, right: str, merged: str
) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping application of one merge."""
    if left not in seg:
        return seg
    out: list[str] = []
    i, n = 0, len(seg)
    while i < n:
        if i + 1 < n and seg[i] == left and seg[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


def train_merges(
    words: list[str],
    counts: "np.ndarray",
    n_merges: int,
    *,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """The BPE merge loop over a word-frequency table: returns up to
    ``n_merges`` rows ``(left, right, weighted_pair_count)`` in rank
    order.  Stops early when no pair reaches ``min_count``."""
    segs = [tuple(w) for w in words]
    cnts = [int(c) for c in counts]
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for seg, c in zip(segs, cnts):
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                pair_n[p] = pair_n.get(p, 0) + c
        if not pair_n:
            break
        (left, right), n = min(
            pair_n.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < min_count:
            break
        out.append((left, right, n))
        merged = left + right
        segs = [merge_word(s, left, right, merged) for s in segs]
    return out


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy rank-order BPE encoding of one word (GPT-2 ``bpe()``)."""
    seg: list[str] = list(word)
    while len(seg) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for i in range(len(seg) - 1):
            r = ranks.get((seg[i], seg[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (seg[i], seg[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        seg = list(merge_word(tuple(seg), left, right, left + right))
    return tuple(seg)
