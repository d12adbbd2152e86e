"""Edit-distance similarity join (``stages/fuzzy.py``).

Layers: (1) the vectorized cross-pair Levenshtein DP vs an independent
per-pair reference, (2) the O(1) deletion-variant hashes vs hashes of
materialized variants, (3) an engineered end-to-end fixture pinning the
edit-kind edges, (4) random differential vs an all-pairs brute force
with layout invariance, (5) argument / long-value validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.fuzzy import (
    _POLY_P,
    _deletion_variant_hashes,
    _fold,
    edit_distance_join,
    levenshtein_pairs,
)


def _lev_ref(a: str, b: str) -> int:
    """Independent scalar byte-level Levenshtein (UTF-8 bytes — the
    DuckDB ``levenshtein`` convention the module matches)."""
    ab, bb = a.encode(), b.encode()
    la, lb = len(ab), len(bb)
    row = list(range(la + 1))
    for j in range(1, lb + 1):
        prev = row[:]
        row[0] = j
        for i in range(1, la + 1):
            row[i] = min(
                prev[i] + 1,
                row[i - 1] + 1,
                prev[i - 1] + (ab[i - 1] != bb[j - 1]),
            )
    return row[la]


def _brute_pairs(vals: list[str], d: int) -> set[tuple]:
    from collections import Counter

    c = Counter(vals)
    ks = sorted(c)
    out = set()
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            dd = _lev_ref(ks[i], ks[j])
            if dd <= d:
                out.add((ks[i], ks[j], dd, c[ks[i]], c[ks[j]]))
    return out


def _run(vals: list[str], d: int, nblocks: int = 3) -> set[tuple]:
    import ray

    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(nblocks)
    rows = edit_distance_join(ds, "v", max_dist=d).take_all()
    got = set(
        (r["name_a"], r["name_b"], r["dist"], r["count_a"], r["count_b"])
        for r in rows
    )
    assert len(got) == len(rows), "duplicate pair rows"
    return got


# ---------------------------------------------------------------- kernels


def test_levenshtein_pairs_vs_reference():
    rng = np.random.default_rng(11)
    alpha = list("abcd")
    a = ["".join(rng.choice(alpha, rng.integers(0, 9))) for _ in range(200)]
    b = ["".join(rng.choice(alpha, rng.integers(0, 9))) for _ in range(200)]
    # unicode is BYTE-level (DuckDB convention), plus empty edges
    a += ["", "é", "日本", "kitten", "flaw"]
    b += ["ab", "e", "日木", "sitting", "lawn"]
    got = levenshtein_pairs(pa.array(a), pa.array(b))
    want = np.array([_lev_ref(x, y) for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)
    assert got[-5:].tolist() == [2, 2, 1, 3, 2]


def test_deletion_variant_hashes_match_materialized():
    def ref_hash(s: bytes) -> int:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in s:
                h = h * _POLY_P + np.uint64(c + 1)
        return int(_fold(np.array([h]), len(s))[0])

    def ref_variants(s: bytes, d: int) -> set[int]:
        out = {ref_hash(s)}
        if d >= 1:
            for i in range(len(s)):
                out.add(ref_hash(s[:i] + s[i + 1 :]))
        if d >= 2:
            for i in range(len(s)):
                for j in range(i + 1, len(s)):
                    out.add(ref_hash(s[:i] + s[i + 1 : j] + s[j + 1 :]))
        return out

    rng = np.random.default_rng(5)
    strs = [
        bytes(rng.integers(97, 101, rng.integers(0, 8)).astype(np.uint8))
        for _ in range(60)
    ] + [b"", b"a", b"aab", "日本語".encode()]
    for d in (1, 2):
        for L in sorted(set(len(s) for s in strs)):
            grp = [s for s in strs if len(s) == L]
            mat = (
                np.frombuffer(b"".join(grp), np.uint8).reshape(len(grp), L)
                if L
                else np.empty((len(grp), 0), np.uint8)
            )
            hs, idx = _deletion_variant_hashes(mat, d)
            for r, s in enumerate(grp):
                assert set(hs[idx == r].tolist()) == ref_variants(s, d)


# ------------------------------------------------------------ end-to-end


def test_fixture_edit_kinds(ray_session):
    # substitution, deletion, insertion, distance-2 combos, a
    # distance-3 NON-pair, duplicates feeding counts, empty string
    vals = [
        "cold plate",
        "cold plate",  # dup → count 2
        "bold plate",  # substitution, dist 1
        "cold late",  # deletion, dist 1
        "colds plate",  # insertion, dist 1
        "bold late",  # dist 2 from "cold plate"
        "kitten",
        "sitting",  # dist 3 → must NOT pair
        "a",
        "",  # dist 1 via deletion to empty
    ]
    got = _run(vals, 2)
    assert ("bold plate", "cold plate", 1, 1, 2) in got
    assert ("cold late", "cold plate", 1, 1, 2) in got
    assert ("cold plate", "colds plate", 1, 2, 1) in got
    assert ("bold late", "cold plate", 2, 1, 2) in got
    assert ("", "a", 1, 1, 1) in got
    assert not any("kitten" in (a, b) and "sitting" in (a, b) for a, b, *_ in got)
    assert got == _brute_pairs(vals, 2)
    # no self-pairs, ordering canonical
    for a, b, dd, *_ in got:
        assert a < b and 1 <= dd <= 2


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("d", [1, 2])
def test_differential_random(ray_session, seed, d):
    rng = np.random.default_rng(seed)
    alpha = list("abc")
    vals = [
        "".join(rng.choice(alpha, rng.integers(0, 6))) for _ in range(300)
    ] + ["é", "e", "日本", "日木", ""]
    assert _run(vals, d) == _brute_pairs(vals, d)


def test_layout_invariance(ray_session):
    rng = np.random.default_rng(9)
    alpha = list("ab")
    vals = ["".join(rng.choice(alpha, rng.integers(0, 5))) for _ in range(150)]
    assert _run(vals, 2, nblocks=1) == _run(vals, 2, nblocks=7)


def test_validation(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"v": ["ab"]}))
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(ds, "v", max_dist=3)
    with pytest.raises(ValueError, match="max_len"):
        edit_distance_join(ds, "v", max_len=0)
    long = ray.data.from_arrow(pa.table({"v": ["x" * 100, "ab"]}))
    with pytest.raises(Exception, match="max_len"):
        edit_distance_join(long, "v", max_len=64).take_all()


def test_null_values_never_pair(ray_session):
    """NULLs drop at the scan — SQL parity (levenshtein(NULL,x) is NULL
    and a NULL key fails a < b), no null-name output rows."""
    vals = ["a", None, "ab", None, "", "b"]
    import ray

    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    rows = edit_distance_join(ds, "v", max_dist=2).take_all()
    got = set((r["name_a"], r["name_b"], r["dist"], r["count_a"], r["count_b"]) for r in rows)
    assert not any(a is None or b is None for a, b, *_ in got)
    assert got == _brute_pairs([v for v in vals if v is not None], 2)


def test_large_string_column(ray_session):
    """large_string inputs keep a consistent block schema (typed empties
    derive from the input column type, not hard-coded string)."""
    import ray

    vals = ["aa", "ab", "zz"]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.large_string())}))
    out = edit_distance_join(ds, "v", max_dist=1)
    assert out.schema().base_schema.field("name_a").type == pa.large_string()
    rows = out.take_all()
    assert set((r["name_a"], r["name_b"]) for r in rows) == {("aa", "ab")}


# ---------------------------------------------------------------------------
# Jaro-Winkler


def _jw_ref(s1: str, s2: str) -> float:
    """Independent scalar byte-level Jaro-Winkler — the DuckDB
    ``jaro_winkler_similarity`` algorithm (greedy window matching,
    (m/l1 + m/l2 + (m−t)/m)/3, 0.7-gated ℓ·0.1 prefix boost), written
    per-character so the vectorized kernel is tested against a separate
    derivation."""
    a, b = s1.encode(), s2.encode()
    l1, l2 = len(a), len(b)
    if l1 == 0 or l2 == 0:
        return 0.0
    if a == b:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(a):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and b[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    sim = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if sim > 0.7:
        pl = 0
        for x, y in zip(a[:4], b[:4]):
            if x == y:
                pl += 1
            else:
                break
        sim = sim + pl * 0.1 * (1.0 - sim)
    return sim


def test_jaro_winkler_pairs_vs_reference():
    from deepseek_ocr_ray.stages.fuzzy import jaro_winkler_pairs

    import random

    rng = random.Random(17)
    pairs = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("", ""),
        ("a", ""),
        ("", "a"),
        ("a", "a"),
        ("ab", "ab"),
        ("abc", "abc"),
        ("ab", "ba"),
        ("abcd", "abdc"),
        ("cold widget", "small widget"),
    ]
    for alpha in ("ab", "abcdef"):
        for _ in range(800):
            s1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            s2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
            r = rng.random()
            if r < 0.25:
                s2 = s1
            elif r < 0.5 and s1:
                i = rng.randrange(len(s1))
                s2 = s1[:i] + rng.choice(alpha) + s1[i + 1 :]
            pairs.append((s1, s2))
    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    got = jaro_winkler_pairs(a, b)
    for k, (s1, s2) in enumerate(pairs):
        want = _jw_ref(s1, s2)
        assert got[k] == want, (s1, s2, got[k], want)


def test_jaro_winkler_duckdb_bit_parity():
    """The kernel must be BIT-equal to DuckDB's jaro_winkler_similarity
    (the oracle emits the raw double) — fuzz across alphabets."""
    import struct

    import duckdb

    from deepseek_ocr_ray.stages.fuzzy import jaro_winkler_pairs

    import random

    rng = random.Random(99)
    pairs = []
    for alpha in ("ab", "abcdefghijklmnop"):
        for _ in range(1500):
            s1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
            s2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
            r = rng.random()
            if r < 0.2:
                s2 = s1
            elif r < 0.4 and s1:
                i = rng.randrange(len(s1))
                s2 = s1[:i] + rng.choice(alpha) + s1[i + 1 :]
            elif r < 0.5 and s1:
                i = rng.randrange(len(s1))
                s2 = s1[:i] + s1[i + 1 :]
            pairs.append((s1, s2))
    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    mine = jaro_winkler_pairs(a, b)
    con = duckdb.connect()
    con.register("t", pa.table({"a": a, "b": b}))
    want = con.sql("SELECT jaro_winkler_similarity(a, b) AS s FROM t").arrow()[
        "s"
    ].to_numpy(zero_copy_only=False)
    for k in range(len(pairs)):
        assert struct.pack("d", mine[k]) == struct.pack("d", want[k]), (
            pairs[k],
            mine[k],
            want[k],
        )


def test_jaro_winkler_join_fixture(ray_session):
    """End-to-end: candidates from the lev band, scored and filtered;
    equal strings never pair (distinct values), threshold drops the
    low-prefix pair."""
    import ray

    from deepseek_ocr_ray.stages.fuzzy import jaro_winkler_join

    vals = ["martha", "marhta", "martha", "bartha", "xyz", "zyx"]
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(2)
    rows = jaro_winkler_join(ds, "v", min_jw=0.0).take_all()
    got = {(r["name_a"], r["name_b"]): (r["dist"], r["jw"], r["count_a"], r["count_b"]) for r in rows}
    assert ("marhta", "martha") in got
    d, jw, ca, cb = got[("marhta", "martha")]
    assert d == 2 and jw == _jw_ref("marhta", "martha") and (ca, cb) == (1, 2)
    # threshold pass drops pairs below min_jw but keeps schema
    hi = jaro_winkler_join(ds, "v", min_jw=0.95).take_all()
    assert all(r["jw"] >= 0.95 for r in hi)
    assert rows and all(
        set(r) == {"name_a", "name_b", "dist", "count_a", "count_b", "jw"}
        for r in rows
    )


def test_entity_clusters_fixture(ray_session):
    """Chain a—b—c clusters to the lexicographic min even though a and c
    never pair directly; unmatched values are singletons."""
    import ray

    from deepseek_ocr_ray.stages.fuzzy import entity_clusters

    # bart—cart—dart chain (each adjacent pair lev 1), "zzz" singleton,
    # duplicates carry counts
    vals = ["bart", "cart", "dart", "zzz", "cart"]
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(2)
    rows = entity_clusters(ds, "v", min_jw=0.0).take_all()
    got = {r["name"]: (r["cluster"], r["cnt"]) for r in rows}
    assert got == {
        "bart": ("bart", 1),
        "cart": ("bart", 2),
        "dart": ("bart", 1),
        "zzz": ("zzz", 1),
    }
    # a high threshold breaks the chain into singletons
    rows_hi = entity_clusters(ds, "v", min_jw=0.999).take_all()
    assert all(r["name"] == r["cluster"] for r in rows_hi)
