"""Explicit solve_method paths: the CholeskyQR2-equivalent 'qr' route and
the lane-major Householder + Jacobi 'svd' route must match numpy oracles
(including rcond cutoffs and rank deficiency)."""

import numpy as np
import jax.numpy as jnp
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col
from polars_ols_tpu.ops.linalg import (
    householder_lanes,
    jacobi_svd_lanes,
    svd_lstsq,
    svd_lstsq_lanes,
)


def test_householder_lanes_reproduces_gram():
    rng = np.random.default_rng(0)
    G, R, K = 80, 50, 5
    X = rng.normal(size=(R, K, G))
    Y = rng.normal(size=(R, 1, G))
    Rf, QtY = householder_lanes(jnp.asarray(X), jnp.asarray(Y))
    for g in (0, 17, G - 1):
        Xm = X[:, :, g]
        Rm = np.asarray(Rf[:, :, g])
        np.testing.assert_allclose(Rm.T @ Rm, Xm.T @ Xm, rtol=1e-11, atol=1e-11)
        np.testing.assert_allclose(
            np.abs(np.asarray(QtY[:, 0, g]) @ Rm),
            np.abs(Xm.T @ Y[:, 0, g] @ np.linalg.inv(Rm) @ Rm),
            rtol=1e-8, atol=1e-8,
        )


def test_jacobi_svd_lanes_matches_lapack():
    rng = np.random.default_rng(1)
    K, G = 6, 100
    W = rng.normal(size=(K, K, G))
    # make a few lanes rank-deficient and a few with duplicate columns
    W[:, 3, 7] = W[:, 2, 7]
    W[:, 5, 11] = 0.0
    U, s, V = jacobi_svd_lanes(jnp.asarray(W))
    for g in (0, 7, 11, 50):
        s_ref = np.linalg.svd(W[:, :, g], compute_uv=False)
        s_got = np.sort(np.asarray(s[:, g]))[::-1]
        np.testing.assert_allclose(s_got, s_ref, rtol=1e-10, atol=1e-10)
        # reconstruction
        rec = np.asarray(U[:, :, g]) @ np.diag(np.asarray(s[:, g])) @ np.asarray(V[:, :, g]).T
        np.testing.assert_allclose(rec, W[:, :, g], rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("alpha", [0.0, 0.3])
def test_svd_lstsq_lanes_matches_rowspace(alpha):
    rng = np.random.default_rng(2)
    G, R, K = 70, 40, 4
    X = rng.normal(size=(G, R, K))
    X[:, 30:] = 0.0  # padded/masked rows
    y = np.einsum("grk,k->gr", X, np.arange(1.0, K + 1))
    y += rng.normal(size=(G, R)) * np.where(np.arange(R) < 30, 0.1, 0.0)
    ref = np.asarray(svd_lstsq(jnp.asarray(X), jnp.asarray(y), alpha=alpha))
    got = np.asarray(svd_lstsq_lanes(jnp.asarray(X), jnp.asarray(y), alpha=alpha))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)


def test_svd_lstsq_lanes_rank_deficient_minimum_norm():
    rng = np.random.default_rng(3)
    G, R, K = 64, 30, 4
    X = rng.normal(size=(G, R, K))
    X[..., 3] = X[..., 2]  # exact duplicate column in every group
    y = np.einsum("grk,k->gr", X[..., :3], np.ones(3))
    got = np.asarray(svd_lstsq_lanes(jnp.asarray(X), jnp.asarray(y)))
    for g in (0, 32):
        exp = np.linalg.lstsq(X[g], y[g], rcond=None)[0]
        np.testing.assert_allclose(got[g], exp, rtol=1e-8, atol=1e-9)


def test_lu_solve_general_matches_numpy():
    """Partial-pivot LU on general (nonsymmetric, indefinite) batches."""
    from polars_ols_tpu.ops.linalg import solve_lu

    rng = np.random.default_rng(6)
    G, K = 50, 7
    A = rng.normal(size=(G, K, K))
    b = rng.normal(size=(G, K))
    got = np.asarray(solve_lu(jnp.asarray(A), jnp.asarray(b)))
    exp = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-11)
    # matrix rhs
    B = rng.normal(size=(G, K, 3))
    gotm = np.asarray(solve_lu(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(gotm, np.linalg.solve(A, B), rtol=1e-10, atol=1e-11)


def test_lu_solve_requires_pivoting():
    """Zero leading pivots: pivotless elimination would divide by zero."""
    from polars_ols_tpu.ops.linalg import solve_lu

    A = np.array(
        [
            [[0.0, 2.0, 1.0], [1.0, 0.0, 3.0], [4.0, 1.0, 0.0]],
            [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 5.0]],
        ]
    )
    b = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    got = np.asarray(solve_lu(jnp.asarray(A), jnp.asarray(b)))
    exp = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_lu_solve_singular_lane_falls_back_to_pinv():
    """A singular lane degrades to the eigh pseudo-solve (reference
    solve_normal_equations fallback chain) without disturbing good lanes."""
    from polars_ols_tpu.ops.linalg import solve_lu

    rng = np.random.default_rng(7)
    K = 5
    good = rng.normal(size=(K, K))
    good = good @ good.T + K * np.eye(K)
    sing = np.ones((K, K))  # rank 1 symmetric
    A = np.stack([good, sing])
    b = rng.normal(size=(2, K))
    got = np.asarray(solve_lu(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(got[0], np.linalg.solve(good, b[0]), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(got[1], np.linalg.pinv(sing) @ b[1], rtol=1e-8, atol=1e-9)


def test_engine_explicit_lu_grouped_matches_lstsq():
    """Grouped explicit solve_method='lu' rides the genuine LU kernel."""
    rng = np.random.default_rng(8)
    n, G = 4_000, 40
    x1, x2 = rng.normal(size=(2, n))
    y = -1.5 * x1 + 0.7 * x2 + rng.normal(size=n) * 0.1
    g = rng.integers(G, size=n).astype(float)
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "g": g})
    preds = df.select(
        col("y").least_squares.ols(
            col("x1"), col("x2"), solve_method="lu"
        ).over("g")
    )["y"].to_numpy()
    x = np.stack([x1, x2], axis=1)
    expected = np.empty_like(y)
    for gid in np.unique(g):
        m = g == gid
        expected[m] = x[m] @ np.linalg.lstsq(x[m], y[m], rcond=None)[0]
    np.testing.assert_allclose(preds, expected, rtol=1e-9, atol=1e-10)


def test_engine_explicit_qr_grouped_matches_lstsq():
    """Grouped explicit solve_method='qr' (CholeskyQR2-equivalent route)."""
    rng = np.random.default_rng(4)
    n, G = 6_000, 80
    x1, x2, x3 = rng.normal(size=(3, n))
    y = 1.0 * x1 - 2.0 * x2 + 0.5 * x3 + rng.normal(size=n) * 0.1
    g = rng.integers(G, size=n).astype(float)
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "x3": x3, "g": g})
    preds = df.select(
        col("y").least_squares.ols(
            col("x1"), col("x2"), col("x3"), solve_method="qr"
        ).over("g")
    )["y"].to_numpy()
    x = np.stack([x1, x2, x3], axis=1)
    expected = np.empty_like(y)
    for gid in np.unique(g):
        m = g == gid
        expected[m] = x[m] @ np.linalg.lstsq(x[m], y[m], rcond=None)[0]
    np.testing.assert_allclose(preds, expected, rtol=1e-9, atol=1e-10)


def test_engine_explicit_svd_grouped_matches_lstsq():
    rng = np.random.default_rng(5)
    n, G = 6_000, 80
    x1, x2 = rng.normal(size=(2, n))
    y = 2.0 * x1 - 1.0 * x2 + rng.normal(size=n) * 0.1
    g = rng.integers(G, size=n).astype(float)
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "g": g})
    preds = df.select(
        col("y").least_squares.ols(
            col("x1"), col("x2"), solve_method="svd"
        ).over("g")
    )["y"].to_numpy()
    x = np.stack([x1, x2], axis=1)
    expected = np.empty_like(y)
    for gid in np.unique(g):
        m = g == gid
        expected[m] = x[m] @ np.linalg.lstsq(x[m], y[m], rcond=None)[0]
    np.testing.assert_allclose(preds, expected, rtol=1e-9, atol=1e-10)
