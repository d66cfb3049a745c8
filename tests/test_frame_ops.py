"""Frame-substrate operations: vectorized join (inner/left), GroupBy.agg
with segment-reduced aggregations and group-constant expressions (the
polars-engine role the reference leans on — SURVEY layer L3)."""

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col


def test_join_inner_matches_bruteforce():
    rng = np.random.default_rng(0)
    lk = rng.integers(8, size=200).astype(float)
    rk = rng.integers(8, size=50).astype(float)
    left = pot.DataFrame({"k": lk, "a": rng.normal(size=200)})
    right = pot.DataFrame({"k": rk, "b": rng.normal(size=50)})
    out = left.join(right, on="k", how="inner")
    # brute-force pair enumeration
    pairs = [
        (i, j) for i in range(200) for j in range(50) if lk[i] == rk[j]
    ]
    assert out.height == len(pairs)
    a = out["a"].to_numpy()
    b = out["b"].to_numpy()
    exp_a = left["a"].to_numpy()[[i for i, _ in pairs]]
    exp_b = right["b"].to_numpy()[[j for _, j in pairs]]
    # join emits left-row-major order like the brute force
    np.testing.assert_allclose(a, exp_a)
    np.testing.assert_allclose(b, exp_b)


def test_join_left_nulls_unmatched():
    left = pot.DataFrame({"k": [1.0, 2.0, 3.0], "a": [10.0, 20.0, 30.0]})
    right = pot.DataFrame({"k": [1.0, 3.0], "b": [-1.0, -3.0]})
    out = left.join(right, on="k", how="left")
    assert out.height == 3
    assert out["b"].to_list() == [-1.0, None, -3.0]
    np.testing.assert_allclose(out["a"].to_numpy(), [10.0, 20.0, 30.0])


def test_join_left_struct_unmatched_and_empty_right():
    """Left-join null semantics for non-Series right columns: unmatched keys
    take null struct rows (not right row 0's values), and joining against an
    empty right frame yields all-null right columns instead of raising."""
    rng = np.random.default_rng(5)
    n = 200
    train = pot.DataFrame(
        {
            "g": np.repeat([1.0, 3.0], n // 2),
            "x": rng.normal(size=n),
            "y": rng.normal(size=n),
        }
    )
    coefs = train.select(
        "g",
        pot.col("y").least_squares.ols(pot.col("x"), mode="coefficients").over("g"),
    ).unique()
    test = pot.DataFrame({"g": [1.0, 2.0, 3.0]})
    out = test.join(coefs, on="g", how="left")
    vals = out["coefficients"].to_numpy()
    assert np.isfinite(vals[0]).all() and np.isfinite(vals[2]).all()
    assert np.isnan(vals[1]).all()  # unmatched key -> null struct row

    empty = coefs.filter(pot.col("g") > 99.0)
    out2 = test.join(empty, on="g", how="left")
    assert out2.height == 3
    assert np.isnan(out2["coefficients"].to_numpy()).all()


def test_expr_comparisons_and_boolean_algebra():
    """polars-style filter predicates: comparisons yield null on null
    operands; & | ~ compose; filter drops null-predicate rows."""
    df = pot.DataFrame(
        {
            "a": pot.Series("a", [1.0, 2.0, 0.0, 4.0], [True, True, False, True]),
            "b": [3.0, 1.0, 5.0, 4.0],
        }
    )
    c = pot.col
    out = df.filter(c("a") > c("b"))
    np.testing.assert_allclose(out["a"].to_numpy(), [2.0])
    out = df.filter((c("a") >= 1.0) & (c("b") <= 3.0))
    np.testing.assert_allclose(out["b"].to_numpy(), [3.0, 1.0])
    out = df.filter(~(c("b") < 4.0))  # null 'a' row kept: predicate on b only
    np.testing.assert_allclose(out["b"].to_numpy(), [5.0, 4.0])
    out = df.filter((c("a") == 4.0) | (c("b") == 3.0))
    np.testing.assert_allclose(out["b"].to_numpy(), [3.0, 4.0])
    assert df.filter(c("a") != c("a")).height == 0


def test_group_by_agg_reductions():
    rng = np.random.default_rng(1)
    n = 1_000
    g = rng.integers(6, size=n).astype(float)
    x = rng.normal(size=n)
    df = pot.DataFrame({"g": g, "x": x})
    out = df.group_by("g").agg(
        col("x").mean().alias("mean"),
        col("x").sum().alias("sum"),
        col("x").min().alias("min"),
        col("x").max().alias("max"),
        col("x").count().alias("count"),
        col("x").std().alias("std"),
        col("x").first().alias("first"),
        col("x").last().alias("last"),
    )
    keys = out["g"].to_numpy()
    for i, gid in enumerate(keys):
        m = g == gid
        np.testing.assert_allclose(out["mean"].to_numpy()[i], x[m].mean(), rtol=1e-12)
        np.testing.assert_allclose(out["sum"].to_numpy()[i], x[m].sum(), rtol=1e-12)
        np.testing.assert_allclose(out["min"].to_numpy()[i], x[m].min())
        np.testing.assert_allclose(out["max"].to_numpy()[i], x[m].max())
        assert out["count"].to_numpy()[i] == m.sum()
        np.testing.assert_allclose(
            out["std"].to_numpy()[i], x[m].std(ddof=1), rtol=1e-12
        )
        idx = np.flatnonzero(m)
        assert out["first"].to_numpy()[i] == x[idx[0]]
        assert out["last"].to_numpy()[i] == x[idx[-1]]


def test_group_by_agg_with_nulls():
    df = pot.DataFrame(
        {
            "g": [0.0, 0.0, 1.0, 1.0],
            "x": pot.Series("x", np.array([1.0, 0.0, 3.0, 4.0]),
                            np.array([True, False, True, True])),
        }
    )
    out = df.group_by("g").agg(col("x").mean().alias("m"), col("x").count().alias("c"))
    np.testing.assert_allclose(out["m"].to_numpy(), [1.0, 3.5])
    np.testing.assert_allclose(out["c"].to_numpy(), [1.0, 2.0])


def test_group_by_agg_least_squares_coefficients():
    """The polars_ols usage pattern df.group_by(k).agg(ols(...)): one
    coefficient struct row per group, identical to .over() + unique."""
    rng = np.random.default_rng(2)
    n = 3_000
    g = rng.integers(12, size=n).astype(float)
    x1, x2 = rng.normal(size=(2, n))
    y = 2.0 * x1 - x2 + rng.normal(size=n) * 0.1
    df = pot.DataFrame({"g": g, "y": y, "x1": x1, "x2": x2})
    out = df.group_by("g").agg(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients")
    )
    assert out.height == 12
    betas = np.asarray(out["coefficients"].values)
    x = np.stack([x1, x2], axis=1)
    keys = out["g"].to_numpy()
    for i, gid in enumerate(keys):
        m = g == gid
        exp = np.linalg.lstsq(x[m], y[m], rcond=None)[0]
        np.testing.assert_allclose(betas[i], exp, rtol=1e-8, atol=1e-10)


def test_lazyframe_defers_execution():
    """LazyFrame records a plan and executes nothing until collect()."""
    import polars_ols_tpu.engine.fit as fit_mod

    rng = np.random.default_rng(9)
    n = 500
    df = pot.DataFrame(
        {
            "y": rng.normal(size=n),
            "x1": rng.normal(size=n),
            "g": rng.integers(5, size=n).astype(float),
        }
    )
    calls = {"n": 0}
    orig = fit_mod.evaluate_least_squares

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    fit_mod.evaluate_least_squares = counting
    try:
        lf = df.lazy().with_columns(
            col("y").least_squares.ols(col("x1")).over("g").alias("p")
        )
        assert calls["n"] == 0, "plan construction must not evaluate"
        assert "with_columns" in lf.explain()
        out = lf.collect()
        assert calls["n"] == 1
        assert "p" in out.columns
    finally:
        fit_mod.evaluate_least_squares = orig


def test_select_scalar_aggregations():
    df = pot.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]})
    out = df.select(col("x").mean().alias("m"), col("x").sum().alias("s"))
    assert out["m"].item() == pytest.approx(2.5)
    assert out["s"].item() == pytest.approx(10.0)


def test_shape_bucketing_bounds_compiled_programs():
    """Padded layout widths are rounded to shape buckets (<=12.5% waste) so
    one compiled program serves a family of max-group-sizes instead of one
    program per exact size (cold-start control, engine/groups.py)."""
    from polars_ols_tpu.engine.groups import build_layout, bucket_size, padded_indices

    assert bucket_size(1) == 1 and bucket_size(8) == 8
    for lo, hi in ((129, 144), (1001, 1024), (517, 576)):
        assert bucket_size(lo) == bucket_size(hi)
    for n in (9, 100, 1000, 12345):
        b = bucket_size(n)
        assert b >= n and (b - n) / n <= 0.125
    # end-to-end: two key columns whose max group size differs land on the
    # same padded width => identical jit program shapes
    rng = np.random.default_rng(0)
    widths = set()
    for max_count in (130, 140):
        gids = np.concatenate(
            [np.zeros(max_count, np.int64), rng.integers(1, 50, 1000)]
        )
        layout = build_layout(gids, len(gids))
        widths.add(padded_indices(layout)[2])
    assert len(widths) == 1


def test_expression_math_ops():
    """log/exp/pow/clip/shift expression nodes (polars parity for the
    feature-engineering ops regression pipelines lean on)."""
    vals = np.asarray([1.0, 2.0, np.nan, 4.0, 8.0])
    df = pot.DataFrame({"x": vals})
    out = df.select(
        col("x").log().alias("lg"),
        col("x").exp().alias("ex"),
        (col("x") ** 2).alias("sq"),
        col("x").clip(1.5, 4.0).alias("cl"),
        col("x").shift(1).alias("sh"),
        col("x").shift(-2).alias("shn"),
    )
    np.testing.assert_allclose(out["lg"].to_numpy(), np.log(vals))
    np.testing.assert_allclose(out["ex"].to_numpy(), np.exp(vals))
    np.testing.assert_allclose(out["sq"].to_numpy(), vals**2)
    np.testing.assert_allclose(out["cl"].to_numpy(), np.clip(vals, 1.5, 4.0))
    sh = out["sh"].to_numpy()
    assert np.isnan(sh[0]) and np.allclose(sh[1:], vals[:-1], equal_nan=True)
    shn = out["shn"].to_numpy()
    assert np.isnan(shn[-2:]).all() and np.allclose(shn[:-2], vals[2:], equal_nan=True)


def test_head_tail_slice():
    df = pot.DataFrame({"a": np.arange(10.0), "b": np.arange(10.0) * 2})
    np.testing.assert_array_equal(df.head(3)["a"].to_numpy(), [0, 1, 2])
    np.testing.assert_array_equal(df.tail(2)["b"].to_numpy(), [16, 18])
    np.testing.assert_array_equal(df.slice(2, 3)["a"].to_numpy(), [2, 3, 4])
    np.testing.assert_array_equal(df.slice(-3)["a"].to_numpy(), [7, 8, 9])
    assert df.head(0).shape == (0, 2) and df.head(99).shape == (10, 2)
    # struct and statistics columns slice too
    rng = np.random.default_rng(0)
    n = 100
    df2 = pot.DataFrame(
        {"y": rng.normal(size=n), "x": rng.normal(size=n),
         "g": rng.integers(4, size=n).astype(float)}
    )
    out = df2.select(
        "g",
        col("y").least_squares.ols(col("x"), mode="coefficients").over("g").alias("c"),
        col("y").least_squares.ols(col("x"), mode="statistics").over("g").alias("s"),
    )
    t = out.tail(3)
    assert t.shape == (3, 3) and len(t["s"]) == 3


def test_join_hash_fast_path_matches_sort_merge(monkeypatch):
    """The native hash-code join must produce exactly the sort-merge
    fallback's output (inner and left, single and multi key, duplicate and
    unmatched keys)."""
    rng = np.random.default_rng(8)
    left = pot.DataFrame(
        {
            "k": rng.integers(0, 12, 200).astype(float),
            "k2": rng.integers(0, 3, 200).astype(float),
            "a": rng.normal(size=200),
        }
    )
    right = pot.DataFrame(
        {
            "k": rng.integers(5, 20, 60).astype(float),
            "k2": rng.integers(0, 3, 60).astype(float),
            "b": rng.normal(size=60),
        }
    )

    def run_all():
        outs = []
        for how in ("inner", "left"):
            for on in ("k", ["k", "k2"]):
                out = left.join(right, on=on, how=how)
                outs.append({c: out[c].to_numpy() for c in out.columns})
        return outs

    fast = run_all()
    monkeypatch.setattr(pot.DataFrame, "_join_codes", lambda *a, **k: None)
    slow = run_all()
    for f, s in zip(fast, slow):
        assert set(f) == set(s)
        for c in f:
            np.testing.assert_array_equal(f[c], s[c], err_msg=c)


def test_series_scalar_reductions():
    s = pot.Series("s", np.asarray([1.0, 2.0, 0.0, 4.0]),
                   np.asarray([True, True, False, True]))  # 0.0 is null
    assert s.sum() == 7.0 and s.mean() == pytest.approx(7 / 3)
    assert s.min() == 1.0 and s.max() == 4.0 and s.median() == 2.0
    assert s.std() == pytest.approx(np.std([1, 2, 4], ddof=1))
    empty = pot.Series("e", np.asarray([np.nan]), np.asarray([False]))
    assert empty.sum() == 0.0 and empty.mean() is None and empty.max() is None


def test_sort_descending_single_and_multi():
    df = pot.DataFrame(
        {
            "g": [1.0, 2.0, 1.0, 2.0, 1.0],
            "v": [3.0, 1.0, 2.0, 5.0, 4.0],
        }
    )
    out = df.sort("v", descending=True)
    np.testing.assert_allclose(out["v"].to_numpy(), [5.0, 4.0, 3.0, 2.0, 1.0])
    # per-key directions: g ascending, v descending within g
    out2 = df.sort(["g", "v"], descending=[False, True])
    np.testing.assert_allclose(out2["g"].to_numpy(), [1, 1, 1, 2, 2])
    np.testing.assert_allclose(out2["v"].to_numpy(), [4.0, 3.0, 2.0, 5.0, 1.0])
    # string keys sort by rank in either direction
    df3 = pot.DataFrame({"s": ["b", "a", "c"], "v": [1.0, 2.0, 3.0]})
    assert df3.sort("s", descending=True)["s"].to_list() == ["c", "b", "a"]


def test_sort_descending_nans_last_and_stable():
    df = pot.DataFrame({"v": [np.nan, 1.0, 3.0, 2.0], "i": [0.0, 1.0, 2.0, 3.0]})
    out = df.sort("v", descending=True)
    np.testing.assert_allclose(out["v"].to_numpy()[:3], [3.0, 2.0, 1.0])
    assert np.isnan(out["v"].to_numpy()[3])
    # stability: ties keep input order
    df2 = pot.DataFrame({"k": [1.0, 1.0, 0.0, 1.0], "i": [0.0, 1.0, 2.0, 3.0]})
    np.testing.assert_allclose(
        df2.sort("k", descending=True)["i"].to_numpy(), [0.0, 1.0, 3.0, 2.0]
    )


def test_join_semi_anti():
    left = pot.DataFrame({"k": [1.0, 2.0, 3.0, 2.0], "a": [10.0, 20.0, 30.0, 40.0]})
    right = pot.DataFrame({"k": [2.0, 2.0, 9.0], "b": [-1.0, -2.0, -9.0]})
    semi = left.join(right, on="k", how="semi")
    assert semi.columns == ["k", "a"]  # left columns only
    np.testing.assert_allclose(semi["a"].to_numpy(), [20.0, 40.0])
    anti = left.join(right, on="k", how="anti")
    np.testing.assert_allclose(anti["a"].to_numpy(), [10.0, 30.0])


def test_join_full_coalesced():
    left = pot.DataFrame({"k": [1.0, 2.0, 3.0], "a": [10.0, 20.0, 30.0]})
    right = pot.DataFrame({"k": [2.0, 4.0], "b": [-2.0, -4.0]})
    out = left.join(right, on="k", how="full").sort("k")
    np.testing.assert_allclose(out["k"].to_numpy(), [1.0, 2.0, 3.0, 4.0])
    assert out["a"].to_list() == [10.0, 20.0, 30.0, None]
    assert out["b"].to_list() == [None, -2.0, None, -4.0]
    # "outer" is an alias
    out2 = left.join(right, on="k", how="outer")
    assert out2.height == 4


def test_join_full_no_unmatched_right_equals_left():
    left = pot.DataFrame({"k": [1.0, 2.0], "a": [1.0, 2.0]})
    right = pot.DataFrame({"k": [1.0, 2.0], "b": [9.0, 8.0]})
    out = left.join(right, on="k", how="full")
    lj = left.join(right, on="k", how="left")
    assert out.height == lj.height
    np.testing.assert_allclose(out["b"].to_numpy(), lj["b"].to_numpy())


def test_join_cross():
    left = pot.DataFrame({"a": [1.0, 2.0]})
    right = pot.DataFrame({"b": [10.0, 20.0, 30.0]})
    out = left.join(right, how="cross")
    assert out.height == 6
    np.testing.assert_allclose(out["a"].to_numpy(), [1, 1, 1, 2, 2, 2])
    np.testing.assert_allclose(out["b"].to_numpy(), [10, 20, 30, 10, 20, 30])


def test_concat_horizontal():
    a = pot.DataFrame({"x": [1.0, 2.0]})
    b = pot.DataFrame({"y": [3.0, 4.0], "z": [5.0, 6.0]})
    out = pot.concat([a, b], how="horizontal")
    assert out.columns == ["x", "y", "z"] and out.height == 2
    with pytest.raises(AssertionError, match="duplicate column"):
        pot.concat([a, a], how="horizontal")
    with pytest.raises(AssertionError, match="equal heights"):
        pot.concat([a, pot.DataFrame({"w": [1.0]})], how="horizontal")


def test_concat_vertical_statistics_column():
    rng = np.random.default_rng(11)
    n = 120
    df = pot.DataFrame(
        {
            "g": np.repeat([0.0, 1.0, 2.0], n // 3),
            "x": rng.normal(size=n),
            "y": rng.normal(size=n),
        }
    )
    stats = df.select(
        "g",
        pot.col("y").least_squares.ols(pot.col("x"), mode="statistics").over("g"),
    ).unique()
    both = pot.concat([stats, stats])
    assert both.height == 2 * stats.height
    for field in ("r2", "coefficients"):
        top = np.asarray(stats["statistics"].arrays[field])
        cat = np.asarray(both["statistics"].arrays[field])
        np.testing.assert_allclose(cat[: stats.height], top)
        np.testing.assert_allclose(cat[stats.height:], top)
