"""Lane-major moving-window kernels (ops/moving.py) vs exact f64 oracles.

Covers all four kernel paths: lane-chol (K<=8, G>=64, exact f64) and
refined-SM (f32 preconditioner + f64 moments + refinement) for both RLS and
rolling, both window semantics, with and without nulls/forgetting.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polars_ols_tpu.ops.moving import (
    solve_recursive_lanes,
    solve_rolling_lanes,
)


def _kalman_oracle(X, y, v, ff, c, mean0=None):
    K = X.shape[1]
    P = np.eye(K) * c
    coef = np.zeros(K) if mean0 is None else np.full(K, float(mean0))
    out = np.zeros_like(X)
    for t in range(len(y)):
        if v[t]:
            Px = P @ X[t]
            r = 1.0 + X[t] @ Px / ff
            k = Px / (r * ff)
            coef = coef + k * (y[t] - X[t] @ coef)
            P = P / ff - np.outer(k, k) * r
        out[t] = coef
    return out


def _make_groups(G, R, K, null_frac=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(G, R, K))
    beta = rng.normal(size=(G, K))
    y = np.einsum("grk,gk->gr", X, beta) + rng.normal(size=(G, R)) * 0.1
    v = rng.random((G, R)) > null_frac if null_frac else np.ones((G, R), bool)
    X = X * v[..., None]
    y = y * v
    return X, y, v


# --------------------------------------------------------------------------- #
# RLS
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("half_life", [None, 20.0])
def test_rls_lane_chol_grouped(half_life):
    G, R, K = 80, 90, 3  # K<=8, G>=64 -> lane-chol path, exact f64
    X, y, v = _make_groups(G, R, K, null_frac=0.15, seed=1)
    out = np.asarray(
        solve_recursive_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            half_life=half_life, initial_state_covariance=10.0,
            initial_state_mean=None,
        )
    )
    ff = np.exp(np.log(0.5) / half_life) if half_life else 1.0
    for g in (0, 37, G - 1):
        expected = _kalman_oracle(X[g], y[g], v[g], ff, 10.0)
        np.testing.assert_allclose(out[g], expected, rtol=1e-7, atol=1e-9)


def test_rls_lane_chol_initial_state_mean():
    G, R, K = 70, 40, 2
    X, y, v = _make_groups(G, R, K, seed=2)
    v[:, :5] = False  # leading invalid rows must yield exactly mean0
    X, y = X * v[..., None], y * v
    out = np.asarray(
        solve_recursive_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            half_life=None, initial_state_covariance=5.0,
            initial_state_mean=(2.5,),
        )
    )
    np.testing.assert_allclose(out[:, :5], 2.5, rtol=0, atol=1e-12)
    expected = _kalman_oracle(X[3], y[3], v[3], 1.0, 5.0, mean0=2.5)
    np.testing.assert_allclose(out[3], expected, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("half_life", [None, 30.0])
@pytest.mark.parametrize("G,K", [(1, 5), (1, 40), (4, 12)])
def test_rls_refined_sm(G, K, half_life):
    R = 700  # multiple chunks -> exercises the re-anchored seeds
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=3)
    out = np.asarray(
        solve_recursive_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            half_life=half_life, initial_state_covariance=10.0,
            initial_state_mean=None,
        )
    )
    ff = np.exp(np.log(0.5) / half_life) if half_life else 1.0
    for g in range(G):
        expected = _kalman_oracle(X[g], y[g], v[g], ff, 10.0)
        np.testing.assert_allclose(out[g], expected, rtol=5e-7, atol=1e-7)


# --------------------------------------------------------------------------- #
# rolling
# --------------------------------------------------------------------------- #
def _window_oracle(X, y, v, window, min_periods, alpha, positional):
    """Direct per-row window solve (positional or valid-rank semantics),
    without the positional forward-fill (applied separately)."""
    R, K = X.shape
    out = np.full((R, K), np.nan)
    valid_idx = np.flatnonzero(v)
    for t in range(R):
        if positional:
            lo = max(0, t - window + 1)
            rows = [i for i in range(lo, t + 1) if v[i]]
            if len(rows) < min_periods:
                continue
        else:
            upto = valid_idx[valid_idx <= t]
            if len(upto) < min_periods:
                continue
            rows = upto[-window:]
        Xw, yw = X[rows], y[rows]
        A = Xw.T @ Xw
        if alpha > 0:
            A = A + alpha * np.eye(K)
        else:
            A = A + 1e-10 * np.mean((X * v[:, None]) ** 2) * min(window, R) * np.eye(K)
        out[t] = np.linalg.solve(A, Xw.T @ yw)
    return out


def _ffill(out):
    R, K = out.shape
    defined = ~np.isnan(out).any(axis=1)
    idx = np.where(defined, np.arange(R), -1)
    np.maximum.accumulate(idx, out=idx)
    filled = np.where((idx >= 0)[:, None], out[np.maximum(idx, 0)], np.nan)
    return filled


@pytest.mark.parametrize("alpha", [0.0, 0.5])
@pytest.mark.parametrize("positional", [True, False])
def test_rolling_lane_chol_grouped(positional, alpha):
    G, R, K = 80, 120, 3
    W, MP = 40, 5
    X, y, v = _make_groups(G, R, K, null_frac=0.15, seed=4)
    out = np.asarray(
        solve_rolling_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            window=W, min_periods=MP, alpha=alpha, positional=positional,
        )
    )
    tol = 1e-7 if alpha > 0 else 1e-5
    for g in (0, 41, G - 1):
        expected = _window_oracle(X[g], y[g], v[g], W, MP, alpha, positional)
        if positional:
            expected = _ffill(expected)
        np.testing.assert_allclose(out[g], expected, rtol=tol, atol=tol, equal_nan=True)


def test_rls_lane_chol_grouped_midk():
    """K in 9..16 grouped moving models now take the exact unrolled
    lane-chol (round-3 gate raise: LANE_CHOL_MAX_K 8 -> 16); previously
    this shape fell back to the slow classic kernels."""
    G, R, K = 70, 60, 12
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=6)
    out = np.asarray(
        solve_recursive_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            half_life=25.0, initial_state_covariance=10.0,
            initial_state_mean=None,
        )
    )
    ff = np.exp(np.log(0.5) / 25.0)
    for g in (0, G - 1):
        expected = _kalman_oracle(X[g], y[g], v[g], ff, 10.0)
        np.testing.assert_allclose(out[g], expected, rtol=1e-6, atol=1e-8)


def test_rls_lane_chol_grouped_colpass():
    """K in 17..32 grouped moving models take the column-pass lane-chol
    tier (exact f64 per-row solves on shrinking submatrix slices)."""
    G, R, K = 40, 70, 24
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=8)
    out = np.asarray(
        solve_recursive_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            half_life=30.0, initial_state_covariance=10.0,
            initial_state_mean=None,
        )
    )
    ff = np.exp(np.log(0.5) / 30.0)
    for g in (0, G - 1):
        expected = _kalman_oracle(X[g], y[g], v[g], ff, 10.0)
        np.testing.assert_allclose(out[g], expected, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("positional", [True, False])
def test_rolling_lane_chol_grouped_colpass(positional):
    G, R, K = 40, 90, 20
    W, MP = 50, 22
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=9)
    out = np.asarray(
        solve_rolling_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            window=W, min_periods=MP, alpha=0.0, positional=positional,
        )
    )
    for g in (0, G - 1):
        expected = _window_oracle(X[g], y[g], v[g], W, MP, 0.0, positional)
        if positional:
            expected = _ffill(expected)
        np.testing.assert_allclose(
            out[g], expected, rtol=2e-5, atol=2e-5, equal_nan=True
        )


@pytest.mark.parametrize("positional", [True, False])
def test_rolling_lane_chol_grouped_midk(positional):
    G, R, K = 70, 80, 12
    W, MP = 40, 14
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=7)
    out = np.asarray(
        solve_rolling_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            window=W, min_periods=MP, alpha=0.0, positional=positional,
        )
    )
    for g in (0, G - 1):
        expected = _window_oracle(X[g], y[g], v[g], W, MP, 0.0, positional)
        if positional:
            expected = _ffill(expected)
        np.testing.assert_allclose(
            out[g], expected, rtol=2e-5, atol=2e-5, equal_nan=True
        )


# --------------------------------------------------------------------------- #
# engine parity: lane kernels vs the classic kernels through the full API
# --------------------------------------------------------------------------- #
def _engine_both_ways(build_expr, df):
    import polars_ols_tpu  # noqa: F401
    from polars_ols_tpu.config import CONFIG

    outs = []
    for lanes in (False, True):
        CONFIG.moving_lanes = lanes
        try:
            outs.append(df.select(build_expr()).unnest("coefficients").to_numpy())
        finally:
            CONFIG.moving_lanes = False
    return outs


def _null_frame(n=800, n_groups=None, seed=11):
    import polars_ols_tpu as pot

    rng = np.random.default_rng(seed)
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = 1.0 * x1 - 2.0 * x2 + rng.normal(size=n) * 0.1
    mask = rng.random(n) < 0.12
    cols = {
        "y": pot.Series("y", np.where(mask, 0.0, y), ~mask),
        "x1": x1,
        "x2": x2,
    }
    if n_groups:
        cols["g"] = rng.integers(n_groups, size=n).astype(float)
    return pot.DataFrame(cols)


def test_engine_rls_lanes_parity():
    from polars_ols_tpu import col

    df = _null_frame()
    ref, lanes = _engine_both_ways(
        lambda: col("y").least_squares.rls(
            col("x1"), col("x2"), mode="coefficients",
            half_life=40.0, initial_state_mean=0.5,
        ),
        df,
    )
    np.testing.assert_allclose(lanes, ref, rtol=1e-7, atol=1e-9, equal_nan=True)


@pytest.mark.parametrize("policy", ["drop_window", "drop"])
def test_engine_rolling_lanes_parity(policy):
    from polars_ols_tpu import col

    df = _null_frame(seed=12)
    ref, lanes = _engine_both_ways(
        lambda: col("y").least_squares.rolling_ols(
            col("x1"), col("x2"), mode="coefficients",
            window_size=120, min_periods=4, null_policy=policy,
        ),
        df,
    )
    np.testing.assert_allclose(lanes, ref, rtol=1e-6, atol=1e-8, equal_nan=True)


def test_engine_grouped_rolling_lanes_parity():
    import polars_ols_tpu as pot
    from polars_ols_tpu import col
    from polars_ols_tpu.config import CONFIG

    df = _null_frame(n=4_000, n_groups=100, seed=13)
    expr = col("y").least_squares.rolling_ols(
        col("x1"), col("x2"), window_size=25, min_periods=3,
        null_policy="drop_window",
    ).over("g")
    outs = []
    for lanes_flag in (False, True):
        CONFIG.moving_lanes = lanes_flag
        try:
            outs.append(df.select(expr)["y"].to_numpy())
        finally:
            CONFIG.moving_lanes = False
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-6, atol=1e-8, equal_nan=True)


def test_engine_nullfree_drop_equals_positional():
    """With a fully valid frame, 'drop' (valid-rank) windows coincide with
    positional windows; the engine exploits that to skip the rank gathers.
    Both policies must give identical results on null-free data."""
    import polars_ols_tpu as pot
    from polars_ols_tpu import col

    rng = np.random.default_rng(17)
    n = 1_500
    x1, x2 = rng.normal(size=(2, n))
    y = 2.0 * x1 - x2 + rng.normal(size=n) * 0.1
    g = rng.integers(30, size=n).astype(float)
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "g": g})
    outs = {}
    from polars_ols_tpu.config import CONFIG

    CONFIG.moving_lanes = True
    try:
        for pol in ("drop", "drop_window"):
            outs[pol] = df.select(
                col("y").least_squares.rolling_ols(
                    col("x1"), col("x2"), window_size=25, min_periods=3,
                    null_policy=pol,
                ).over("g")
            )["y"].to_numpy()
    finally:
        CONFIG.moving_lanes = False
    np.testing.assert_allclose(
        outs["drop"], outs["drop_window"], rtol=1e-10, atol=1e-12, equal_nan=True
    )


@pytest.mark.parametrize("positional", [True, False])
@pytest.mark.parametrize("G,K", [(1, 5), (1, 40)])
def test_rolling_refined_sm(G, K, positional):
    R, W, MP = 700, 150, K
    X, y, v = _make_groups(G, R, K, null_frac=0.1, seed=5)
    out = np.asarray(
        solve_rolling_lanes(
            jnp.asarray(X), jnp.asarray(y), jnp.asarray(v),
            window=W, min_periods=MP, alpha=0.3, positional=positional,
        )
    )
    for g in range(G):
        expected = _window_oracle(X[g], y[g], v[g], W, MP, 0.3, positional)
        if positional:
            expected = _ffill(expected)
        np.testing.assert_allclose(
            out[g], expected, rtol=5e-7, atol=5e-7, equal_nan=True
        )
