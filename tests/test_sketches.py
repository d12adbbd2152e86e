"""HyperLogLog sketch + exact-distinct companion."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages import sketches


def _ds(values, blocks=4):
    import ray.data

    tbl = pa.table({"v": pa.array([str(v) for v in values], pa.string())})
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_hll_estimate_error_bound():
    """p=12 → standard error 1.04/sqrt(4096) ≈ 1.6%; assert within 5%."""
    values = [f"item-{i}" for i in range(10_000)]
    regs = sketches.hll_partial(values, p=12)
    est = sketches.hll_estimate(regs)
    assert abs(est - 10_000) / 10_000 < 0.05


def test_hll_small_range_linear_counting():
    values = [f"x{i}" for i in range(50)]
    est = sketches.hll_estimate(sketches.hll_partial(values, p=12))
    assert abs(est - 50) <= 2  # linear-counting regime is near-exact


def test_hll_merge_equals_union():
    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(3000)] + a[:1000]  # overlap
    merged = sketches.hll_merge(
        sketches.hll_partial(a, p=12), sketches.hll_partial(b, p=12)
    )
    assert np.array_equal(
        merged, sketches.hll_partial(a + b, p=12)
    )  # merge == sketch of union, exactly


def test_hll_distinct_dataset_parallelism_invariant(ray_session):
    values = [f"doc-{i % 700}" for i in range(5000)]  # 700 distinct
    ests = [
        sketches.hll_distinct(_ds(values, blocks=b), "v").take_all()[0][
            "approx_distinct"
        ]
        for b in (1, 4, 11)
    ]
    assert ests[0] == ests[1] == ests[2]  # register merges are exact
    assert abs(ests[0] - 700) / 700 < 0.05


def test_exact_distinct(ray_session):
    values = [f"doc-{i % 700}" for i in range(5000)]
    out = sketches.exact_distinct(_ds(values), "v").take_all()
    assert out[0]["n_distinct"] == 700


def test_hll_estimate_no_large_range_distortion():
    # Registers saturated high enough that the raw estimate sits in the
    # regime where the (removed) 32-bit large-range correction used to fire:
    # est ≈ alpha*m*2^24 ≈ 5e10 > 2^32 — the old branch took log of a
    # negative number (NaN → int() raised).  With 64-bit hashes the raw
    # estimator is correct here and must come back finite and positive.
    regs = np.full(1 << 12, 24, dtype=np.uint8)
    est = sketches.hll_estimate(regs)
    m = float(1 << 12)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    expected = alpha * m * m / (m * 2.0 ** -24.0)
    assert est > (1 << 32)  # genuinely in the old broken regime
    assert abs(est - expected) / expected < 1e-9


def test_hll_estimate_mid_range_monotone():
    # across the old correction boundary (~2^32/30) estimates must be
    # monotone in register mass — the removed branch bent them upward
    ests = [
        sketches.hll_estimate(np.full(1 << 12, r, dtype=np.uint8))
        for r in (14, 16, 18, 20, 22)
    ]
    assert all(b > a for a, b in zip(ests, ests[1:]))


# ---------------------------------------------------------------------------
# DDSketch quantiles
# ---------------------------------------------------------------------------


def test_dd_relative_error_bound():
    """Estimates must be within the α/(1-α) relative bound of the exact
    rank values for lognormal data across a wide dynamic range."""
    rng = np.random.default_rng(42)
    x = np.exp(rng.normal(5.0, 2.0, 20_000))  # ~6 decades
    alpha = 0.01
    bins = sketches.dd_partial(x, alpha)
    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    out = sketches.dd_quantiles(bins, qs, alpha)
    xs = np.sort(x)
    bound = alpha / (1 - alpha) + 1e-12
    for q, est in zip(out["q"].to_pylist(), out["est"].to_pylist()):
        exact = xs[int(np.floor(q * (len(xs) - 1)))]
        assert abs(est - exact) / exact <= bound, (q, est, exact)


def test_dd_handles_negatives_and_zeros():
    x = np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0])
    bins = sketches.dd_partial(x, 0.01)
    out = sketches.dd_quantiles(bins, (0.0, 0.5, 1.0), 0.01)
    ests = dict(zip(out["q"].to_pylist(), out["est"].to_pylist()))
    assert ests[0.0] < -99  # min ≈ -100
    assert ests[0.5] == 0.0  # median is the zero bucket
    assert ests[1.0] > 99  # max ≈ +100


def test_dd_merge_invariant_to_split():
    """partial(full) and sum of partial(halves) give identical counters —
    the property that makes the sketch parallelism-invariant."""
    import pandas as pd

    rng = np.random.default_rng(7)
    x = np.exp(rng.normal(0, 3, 5_000))

    def counters(parts):
        dfs = [sketches.dd_partial(p, 0.01).to_pandas() for p in parts]
        return (
            pd.concat(dfs)
            .groupby(["sign", "bin"], as_index=False)["n"]
            .sum()
            .sort_values(["sign", "bin"])
            .reset_index(drop=True)
        )

    whole = counters([x])
    split = counters(np.array_split(x, 7))
    assert whole.equals(split)
    q1 = sketches.dd_quantiles(
        pa.Table.from_pandas(whole), (0.5, 0.9), 0.01
    )["est"].to_pylist()
    q2 = sketches.dd_quantiles(
        pa.Table.from_pandas(split), (0.5, 0.9), 0.01
    )["est"].to_pylist()
    assert q1 == q2


def test_ddsketch_dataset_matches_local(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    x = np.exp(rng.normal(2, 1, 4_000))
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(x, pa.float64())})
    ).repartition(5)
    got = sketches.ddsketch_quantiles(ds, "v", (0.5, 0.9)).take_all()
    local = sketches.dd_quantiles(
        sketches.dd_partial(x, 0.01), (0.5, 0.9), 0.01
    ).to_pylist()
    assert [(r["q"], r["est"]) for r in got] == [
        (r["q"], r["est"]) for r in local
    ]


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_bounded():
    rng = np.random.default_rng(11)
    # zipf-ish token stream over 500 types
    types = [f"tok{i}" for i in range(500)]
    weights = 1.0 / np.arange(1, 501)
    weights /= weights.sum()
    stream = rng.choice(types, 50_000, p=weights)
    tokens = pa.array(stream, pa.string())
    m = sketches.cms_partial(tokens, d=4, w=4096)
    import collections

    exact = collections.Counter(stream)
    probes = pa.array(types[:50], pa.string())
    est = sketches.cms_estimate(m, probes)
    for t, e in zip(types[:50], est):
        assert e >= exact[t], (t, e, exact[t])
        # collision overshoot: ≤ ~2·total/w with this seed (loose, deterministic)
        assert e - exact[t] <= 2 * len(stream) / 4096, (t, e, exact[t])


def test_cms_merge_is_addition():
    a = pa.array(["x", "y", "x"], pa.string())
    b = pa.array(["y", "z"], pa.string())
    both = pa.array(["x", "y", "x", "y", "z"], pa.string())
    m = sketches.cms_partial(a) + sketches.cms_partial(b)
    assert (m == sketches.cms_partial(both)).all()


def test_cms_dataset_matches_local(ray_session):
    import ray.data

    words = ["alpha", "beta", "gamma"] * 400 + ["rare"]
    ds = ray.data.from_arrow(
        pa.table({"token": pa.array(words, pa.string())})
    ).repartition(6)
    got = sketches.cms_token_freq(ds, "token", ["alpha", "rare", "absent"])
    rows = {r["token"]: r["est_n"] for r in got.take_all()}
    local = sketches.cms_estimate(
        sketches.cms_partial(pa.array(words, pa.string())),
        pa.array(sorted(["alpha", "rare", "absent"]), pa.string()),
    )
    want = dict(zip(sorted(["alpha", "rare", "absent"]), local))
    assert rows == {k: int(v) for k, v in want.items()}
    assert rows["alpha"] >= 400 and rows["rare"] >= 1


# ---------------------------------------------------------------------------
# per-group HLL
# ---------------------------------------------------------------------------


def test_group_hll_close_to_exact_per_group(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    n = 30000
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, n)]
    # distinct domains of very different sizes per group
    vals = np.where(
        groups == "a",
        rng.randint(0, 200, n),
        np.where(groups == "b", rng.randint(0, 5000, n), rng.randint(0, 40, n)),
    )
    tab = pa.table(
        {
            "g": pa.array(groups.tolist(), pa.string()),
            "v": pa.array(vals.tolist(), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tab).repartition(6)
    est = {
        r["g"]: r["approx_distinct"]
        for r in sketches.group_hll_distinct(ds, "g", "v").take_all()
    }
    exact = {
        r["g"]: r["n_distinct"]
        for r in sketches.group_distinct_exact(ds, "g", "v").take_all()
    }
    assert set(est) == set(exact) == {"a", "b", "c"}
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])


def test_group_hll_parallelism_invariant(ray_session):
    import ray.data

    rng = np.random.RandomState(5)
    tab = pa.table(
        {
            "g": pa.array(rng.choice(["x", "y"], 5000).tolist(), pa.string()),
            "v": pa.array(rng.randint(0, 1000, 5000).tolist(), pa.int64()),
        }
    )
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tab).repartition(parts)
        outs.append(
            sorted(
                (r["g"], r["approx_distinct"])
                for r in sketches.group_hll_distinct(ds, "g", "v").take_all()
            )
        )
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# Misra-Gries two-pass exact top-k
# ---------------------------------------------------------------------------


def _zipf_table(n=20000, vocab=2000, seed=11):
    rng = np.random.RandomState(seed)
    ids = np.minimum((rng.zipf(1.3, n) - 1), vocab - 1)
    toks = np.array([f"w{i:05d}" for i in range(vocab)])[ids]
    return pa.table({"tok": pa.array(toks.tolist(), pa.string())})


def _make_tokens_fn():
    # defined per-call so cloudpickle ships it by VALUE (the test module
    # is not importable inside Ray workers)
    def tokens_fn(batch):
        col = batch["tok"]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    return tokens_fn


def test_mg_topk_equals_exact_topk(ray_session):
    import collections

    import ray.data

    tab = _zipf_table()
    got = sketches.mg_topk(
        ray.data.from_arrow(tab).repartition(5), _make_tokens_fn(),
        k=10, capacity=256,
    ).take_all()
    counts = collections.Counter(tab["tok"].to_pylist())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["n"]) for r in got] == want


def test_mg_topk_guarantee_check_raises_on_tiny_capacity(ray_session):
    import ray.data

    # near-uniform data: the k-th count is far below total/capacity, so the
    # proof obligation fails loudly instead of returning a maybe-wrong top-k
    rng = np.random.RandomState(2)
    toks = [f"u{i}" for i in rng.randint(0, 5000, 20000)]
    tab = pa.table({"tok": pa.array(toks, pa.string())})
    with pytest.raises(ValueError, match="guarantee check|candidate"):
        sketches.mg_topk(
            ray.data.from_arrow(tab).repartition(4), _make_tokens_fn(),
            k=10, capacity=8,
        )


def test_mg_topk_parallelism_invariant(ray_session):
    import ray.data

    tab = _zipf_table(seed=13)
    outs = []
    for parts in (1, 6):
        got = sketches.mg_topk(
            ray.data.from_arrow(tab).repartition(parts), _make_tokens_fn(),
            k=8, capacity=512,
        ).take_all()
        outs.append([(r["token"], r["n"]) for r in got])
    assert outs[0] == outs[1]


def test_group_ddsketch_matches_per_group_global_sketch(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.sketches import (
        ddsketch_quantiles,
        group_ddsketch_quantiles,
    )

    rng = np.random.RandomState(13)
    n = 6000
    g = rng.choice(["a", "b", "c"], n)
    v = np.where(g == "a", rng.lognormal(3, 1, n), rng.normal(0, 50, n))
    tab = pa.table(
        {"g": pa.array(g, pa.string()), "v": pa.array(v, pa.float64())}
    )
    qs = (0.25, 0.5, 0.9)
    got = group_ddsketch_quantiles(
        ray.data.from_arrow(tab).repartition(7), ["g"], "v", qs
    ).take_all()
    assert len(got) == 3 * len(qs)
    for key in ("a", "b", "c"):
        sub = tab.filter(pa.compute.equal(tab["g"], key))
        want = {
            r["q"]: r["est"]
            for r in ddsketch_quantiles(
                ray.data.from_arrow(sub), "v", qs
            ).take_all()
        }
        for r in got:
            if r["g"] == key:
                assert r["est"] == want[r["q"]], (key, r)
        # relative-error bound vs exact (positive-valued group only)
        if key == "a":
            vals = np.sort(sub["v"].to_numpy(zero_copy_only=False))
            for r in got:
                if r["g"] != key:
                    continue
                exact = vals[int(np.floor(r["q"] * (len(vals) - 1)))]
                assert abs(r["est"] - exact) / abs(exact) < 0.025


def test_group_ddsketch_parallelism_invariant(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.sketches import group_ddsketch_quantiles

    rng = np.random.RandomState(2)
    tab = pa.table(
        {
            "g": pa.array(rng.choice(["x", "y"], 3000), pa.string()),
            "v": pa.array(rng.normal(10, 5, 3000), pa.float64()),
        }
    )
    outs = []
    for parts in (1, 9):
        rows = group_ddsketch_quantiles(
            ray.data.from_arrow(tab).repartition(parts), ["g"], "v"
        ).take_all()
        outs.append(sorted((r["g"], r["q"], r["est"]) for r in rows))
    assert outs[0] == outs[1]
