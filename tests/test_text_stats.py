"""Unit tests for the text-analysis kernels (functions/text_stats)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.functions import text_stats as ts


def test_token_counts_basic():
    arr = pa.array(["one two three", "  padded  ", "", "single", "a  b"])
    got = ts.token_counts(arr).to_pylist()
    assert got == [3, 1, 0, 1, 2]


def test_bpe_token_counts_match_python_re():
    texts = [
        "hello, world it's 42 degrees",
        "tab\tand\nnewline",
        "",
        "don't stop!!! 3.14 x",
    ]
    arr = pa.array(texts)
    got = ts.bpe_token_counts(arr).to_pylist()
    want = [len(ts._BPE_RE.findall(t)) for t in texts]
    assert got == want


def test_punct_and_stopword_counts():
    arr = pa.array(["The cat, the dog; and a bird!", "no stop words here?"])
    assert ts.punct_counts(arr).to_pylist() == [3, 1]
    # "the" ×2 (one capitalized), "and", "a" → 4; second: "no"/"here" aren't stopwords
    assert ts.stopword_counts(arr).to_pylist() == [4, 0]


def test_md5_fingerprints_match_hashlib():
    import hashlib

    texts = ["abc", "", "ünïcode"]
    got = ts.md5_fingerprints(pa.array(texts)).to_pylist()
    want = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    assert got == want


def test_rolling_fingerprint_properties():
    a = ts.rolling_fingerprint("hello world")
    assert a == ts.rolling_fingerprint("hello world")  # deterministic
    assert a != ts.rolling_fingerprint("hello worlD")  # content-sensitive
    assert a != ts.rolling_fingerprint("world hello")  # order-sensitive
    assert ts.rolling_fingerprint("") == 0
    # long text crosses the 4096-byte chunk boundary
    long = "x" * 10_000 + "tail"
    assert ts.rolling_fingerprint(long) == ts.rolling_fingerprint(long)
    assert ts.rolling_fingerprint(long) != ts.rolling_fingerprint(long + "!")


@pytest.mark.parametrize(
    "text,code",
    [
        ("the cat sat on the mat and it was happy", "en"),
        ("der Hund ist nicht mit der Katze zu sehen", "de"),
        ("le chat est dans la maison avec les enfants", "fr"),
        ("el perro es una mascota en la casa", "es"),
        ("这是一个中文句子", "zh"),
        ("Это русский текст и он длинный", "ru"),
        ("zzz qqq xxx", "und"),
    ],
)
def test_lang_id(text, code):
    assert ts.lang_id(pa.array([text])).to_pylist() == [code]


def test_quality_columns_flags():
    texts = pa.array(
        [
            "the quick brown fox jumps over the lazy dog today",  # passes all
            "a b",  # too short
            "!!!???...,,,;;;:::!!!",  # punct-heavy, no stopwords
            "",
        ]
    )
    q = ts.quality_columns(texts)
    assert q["flag_len"].to_pylist() == [1, 0, 0, 0]
    assert q["flag_stop"].to_pylist() == [1, 1, 0, 0]
    assert q["flag_punct"].to_pylist() == [1, 1, 0, 0]
    assert q["quality_passes"].to_pylist()[0] == 4
    assert q["n_chars"].to_pylist() == [49, 3, 21, 0]


def test_doc_stats_batch_shape():
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["the cat", ""])})
    out = ts.doc_stats_batch(batch)
    assert out.num_rows == 2
    assert "text" not in out.column_names
    assert out["n_tokens"].to_pylist() == [2, 0]


def test_stub_tokenizer_roundtrip():
    from deepseek_ocr_ray.functions.tokenizer import SPECIAL_TOKENS, StubTokenizer

    tok = StubTokenizer()
    for text in (
        "hello, world it's 42 degrees",
        "tabs\tand\nnewlines  double",
        "don't ' stray 'apostrophe",
        "",
        "<td>cell</td>",
    ):
        ids = tok.encode(text)
        assert tok.decode(ids, skip_special_tokens=False) == text, text
    # ids deterministic across instances
    assert StubTokenizer().encode("abc def") == StubTokenizer().encode("abc def")
    # reference special ids preserved (ngram whitelist compatibility)
    assert SPECIAL_TOKENS["<td>"] == 128821
    assert SPECIAL_TOKENS["</td>"] == 128822


def test_stub_tokenizer_bos_eos():
    from deepseek_ocr_ray.functions.tokenizer import StubTokenizer

    tok = StubTokenizer()
    ids = tok.encode("hi", bos=True, eos=True)
    assert ids[0] == tok.BOS_ID and ids[-1] == tok.EOS_ID
    assert tok.decode(ids) == "hi"  # specials skipped by default


def test_tokenizer_feeds_ngram_processor():
    """Integration: tokenized text drives the T3 constraint; <td> ids from
    table markup are never banned."""
    from deepseek_ocr_ray.functions.ngram_norepeat import NoRepeatNGramProcessor
    from deepseek_ocr_ray.functions.tokenizer import StubTokenizer

    tok = StubTokenizer()
    ids = tok.encode("<td>a</td><td>a</td><td>a</td>")
    assert ids.count(128821) == 3 and ids.count(128822) == 3  # specials atomic
    p = NoRepeatNGramProcessor(ngram_size=2, window_size=50)
    assert not (p.banned_tokens(ids) & {128821, 128822})
    # with the tail ending at <td>, the repeated CELL CONTENT is banned
    # (only the td markup itself is exempt)
    assert p.banned_tokens(ids[:-2]) == {ids[1]}
