"""Engine-level multi-chip coverage: every model family through the full
expression API with CONFIG.auto_shard forced on (8-device CPU mesh), compared
against the single-device engine output (which is oracle-tested elsewhere).

This is the VERDICT r1 gate: "all 8 model families pass engine-level tests
with auto_shard on"."""

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col
from polars_ols_tpu.config import CONFIG


def _frame(n=4_000, n_groups=64, nulls=False, seed=31):
    rng = np.random.default_rng(seed)
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = 1.5 * x1 - 0.5 * x2 + rng.normal(size=n) * 0.1
    cols = {"x1": x1, "x2": x2, "w": rng.uniform(0.5, 2.0, size=n)}
    if nulls:
        mask = rng.random(n) < 0.1
        cols["y"] = pot.Series("y", np.where(mask, 0.0, y), ~mask)
    else:
        cols["y"] = y
    cols["g"] = rng.integers(n_groups, size=n).astype(float)
    return pot.DataFrame(cols)


def _both(df, expr, out="y"):
    outs = []
    for shard in (False, True):
        CONFIG.auto_shard = shard
        try:
            res = df.select(expr)
            outs.append(
                res[out].to_numpy()
                if out in res.columns
                else res[res.columns[0]].to_numpy()
            )
        finally:
            CONFIG.auto_shard = False
    return outs


ls = col("y").least_squares


@pytest.mark.parametrize(
    "name,expr,nulls",
    [
        ("ols", ls.ols(col("x1"), col("x2")).over("g"), False),
        ("ols_lu", ls.ols(col("x1"), col("x2"), solve_method="lu").over("g"), False),
        ("ols_nulls_drop", ls.ols(col("x1"), col("x2"), null_policy="drop").over("g"), True),
        ("ridge", ls.ridge(col("x1"), col("x2"), alpha=0.05).over("g"), False),
        ("wls", ls.wls(col("x1"), col("x2"), sample_weights=col("w")).over("g"), False),
        ("lasso", ls.lasso(col("x1"), col("x2"), alpha=0.001).over("g"), False),
        ("elastic_net", ls.elastic_net(col("x1"), col("x2"), alpha=0.001, l1_ratio=0.5).over("g"), False),
        ("rls", ls.rls(col("x1"), col("x2"), half_life=30.0).over("g"), False),
        ("rolling", ls.rolling_ols(col("x1"), col("x2"), window_size=40).over("g"), False),
        ("expanding", ls.expanding_ols(col("x1"), col("x2")).over("g"), False),
    ],
)
def test_family_sharded_matches_single_device(name, expr, nulls):
    df = _frame(nulls=nulls)
    single, sharded = _both(df, expr)
    np.testing.assert_allclose(
        sharded, single, rtol=1e-8, atol=1e-10, equal_nan=True
    )


def test_sharded_multi_target():
    """Multi-target fits (struct target, shared factorization) shard the
    group batch axis — parity with the single-device engine output."""
    rng = np.random.default_rng(7)
    n, G = 4_000, 64
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y1 = x1 - x2 + rng.normal(size=n) * 0.1
    y2 = 2.0 * x1 + x2 + rng.normal(size=n) * 0.1
    df = pot.DataFrame(
        {
            "x1": x1, "x2": x2, "y1": y1, "y2": y2,
            "g": rng.integers(G, size=n).astype(float),
        }
    )
    expr = (
        pot.struct(col("y1"), col("y2"))
        .least_squares.multi_target_ols(col("x1"), col("x2"))
        .over("g")
        .alias("preds")
    )
    outs = []
    for shard in (False, True):
        CONFIG.auto_shard = shard
        try:
            outs.append(df.select(expr)["preds"].to_numpy())
        finally:
            CONFIG.auto_shard = False
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-10, atol=1e-12)


def test_sharded_coefficients_and_statistics():
    df = _frame()
    CONFIG.auto_shard = True
    try:
        coefs = (
            df.select(ls.ols(col("x1"), col("x2"), mode="coefficients").over("g"))
            .unnest("coefficients")
            .to_numpy()
        )
        stats = df.select(
            ls.ols(col("x1"), col("x2"), mode="statistics").over("g")
        )["statistics"].to_list()
    finally:
        CONFIG.auto_shard = False
    coefs_1 = (
        df.select(ls.ols(col("x1"), col("x2"), mode="coefficients").over("g"))
        .unnest("coefficients")
        .to_numpy()
    )
    np.testing.assert_allclose(coefs, coefs_1, rtol=1e-9, atol=1e-12)
    stats_1 = df.select(
        ls.ols(col("x1"), col("x2"), mode="statistics").over("g")
    )["statistics"].to_list()
    for s, s1 in zip(stats, stats_1):
        for key in ("r2", "mse", "mae"):
            assert s[key] == pytest.approx(s1[key], rel=1e-8)
        np.testing.assert_allclose(
            s["standard_errors"], s1["standard_errors"], rtol=1e-7
        )
        np.testing.assert_allclose(s["p_values"], s1["p_values"], rtol=1e-6, atol=1e-12)


def test_sharded_cd_statistics():
    """mode='statistics' with a coordinate-descent solver (lasso) shards:
    CD coefficients + residual metrics, normal-equation se/t/p — matching
    the single-device kernel (previously a logged fallback)."""
    df = _frame()
    expr = ls.lasso(col("x1"), col("x2"), alpha=0.001, mode="statistics").over("g")
    CONFIG.auto_shard = True
    try:
        stats = df.select(expr)["statistics"].to_list()
    finally:
        CONFIG.auto_shard = False
    stats_1 = df.select(expr)["statistics"].to_list()
    for s, s1 in zip(stats, stats_1):
        for key in ("r2", "mse", "mae"):
            assert s[key] == pytest.approx(s1[key], rel=1e-7)
        np.testing.assert_allclose(s["coefficients"], s1["coefficients"], rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(s["standard_errors"], s1["standard_errors"], rtol=1e-7)
        np.testing.assert_allclose(s["p_values"], s1["p_values"], rtol=1e-6, atol=1e-12)


def test_sharded_near_collinear_refinement():
    """The distributed normal-equation solve must run the same CSNE
    refinement as the single-device engine on ill-conditioned groups."""
    rng = np.random.default_rng(32)
    n = 5_000
    x1 = rng.normal(size=n)
    x2 = x1 + 1e-7 * rng.normal(size=n)
    y = 1.5 * x1 - 0.5 * x2 + rng.normal(size=n) * 0.1
    g = rng.integers(20, size=n).astype(float)
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "g": g})
    expr = ls.ols(col("x1"), col("x2")).over("g")
    CONFIG.auto_shard = True
    try:
        sharded = df.select(expr)["y"].to_numpy()
    finally:
        CONFIG.auto_shard = False
    x = np.stack([x1, x2], axis=1)
    expected = np.empty_like(y)
    for gid in np.unique(g):
        m = g == gid
        beta = np.linalg.lstsq(x[m], y[m], rcond=None)[0]
        expected[m] = x[m] @ beta
    np.testing.assert_allclose(sharded, expected, rtol=1e-5, atol=2e-6)
