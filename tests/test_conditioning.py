"""Conditioning and numerical-robustness regressions.

The auto solve path uses fused normal equations (squaring cond(X)); the
conditioning-gated CSNE refinement must restore lstsq-grade coefficients on
near-collinear features (the reference's default here is column-pivoted QR,
src/least_squares.rs:193-231). Statistics must come from per-row residuals,
not moment identities that cancel for good fits.
"""

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col


def _collinear_frame(n=4_000, eps=1e-7, n_groups=None, seed=0):
    """Features with cond(X) ~ 1/eps: x2 = x1 + eps * noise."""
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=n)
    x2 = x1 + eps * rng.normal(size=n)
    x3 = rng.normal(size=n)
    y = 1.5 * x1 - 0.5 * x2 + 2.0 * x3 + rng.normal(size=n) * 0.1
    data = {"y": y, "x1": x1, "x2": x2, "x3": x3}
    if n_groups:
        data["group"] = rng.integers(n_groups, size=n).astype(float)
    return pot.DataFrame(data)


def test_near_collinear_auto_matches_lstsq():
    df = _collinear_frame()
    out = (
        df.select(
            col("y").least_squares.ols(
                col("x1"), col("x2"), col("x3"), mode="coefficients"
            )
        )
        .unnest("coefficients")
        .to_numpy()
        .flatten()
    )
    x = np.stack([df[c].to_numpy() for c in ("x1", "x2", "x3")], axis=1)
    expected = np.linalg.lstsq(x, df["y"].to_numpy(), rcond=None)[0]
    cond = np.linalg.cond(x)
    assert cond > 1e6  # the scenario actually stresses the normal equations
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-8)


def test_near_collinear_predictions_grouped():
    df = _collinear_frame(n=6_000, n_groups=25)
    out = df.select(
        col("y").least_squares.ols(col("x1"), col("x2"), col("x3")).over("group")
    )
    preds = out["y"].to_numpy()
    x = np.stack([df[c].to_numpy() for c in ("x1", "x2", "x3")], axis=1)
    y = df["y"].to_numpy()
    g = df["group"].to_numpy()
    expected = np.empty_like(y)
    for gid in np.unique(g):
        m = g == gid
        beta = np.linalg.lstsq(x[m], y[m], rcond=None)[0]
        expected[m] = x[m] @ beta
    # limiting accuracy of refinement at cond(X'X) ~ 4e14 is ~1e-6 absolute
    np.testing.assert_allclose(preds, expected, rtol=1e-5, atol=2e-6)


def test_near_collinear_with_nulls():
    """Null-bearing frames take the fused masking kernel; refinement must
    gate there too."""
    rng = np.random.default_rng(3)
    df = _collinear_frame(n=3_000)
    vals = df["y"].to_numpy().astype(float)
    mask = rng.random(3_000) < 0.05
    cols = {c: df[c] for c in df.columns}
    cols["y"] = pot.Series("y", np.where(mask, 0.0, vals), ~mask)
    df = pot.DataFrame(cols)
    out = (
        df.select(
            col("y").least_squares.ols(
                col("x1"), col("x2"), col("x3"),
                mode="coefficients", null_policy="drop",
            )
        )
        .unnest("coefficients")
        .to_numpy()
        .flatten()
    )
    x = np.stack([df[c].to_numpy() for c in ("x1", "x2", "x3")], axis=1)[~mask]
    expected = np.linalg.lstsq(x, vals[~mask], rcond=None)[0]
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-8)


def test_well_conditioned_unchanged():
    """Sanity: the gate must not perturb well-conditioned solves."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2_000, 4))
    y = x @ np.array([1.0, -2.0, 0.5, 3.0]) + rng.normal(size=2_000) * 0.1
    df = pot.DataFrame({"y": y, **{f"x{i+1}": x[:, i] for i in range(4)}})
    out = (
        df.select(
            col("y").least_squares.ols(
                *[col(f"x{i+1}") for i in range(4)], mode="coefficients"
            )
        )
        .unnest("coefficients")
        .to_numpy()
        .flatten()
    )
    expected = np.linalg.lstsq(x, y, rcond=None)[0]
    np.testing.assert_allclose(out, expected, rtol=1e-10, atol=1e-12)


def test_statistics_good_fit_no_cancellation():
    """A near-perfect fit on a large-mean target: the moment-identity RSS
    reports mse == 0.0 / r2 == 1.0 exactly (catastrophic cancellation); the
    per-row computation must report the true tiny-but-nonzero mse."""
    rng = np.random.default_rng(2)
    n = 2_000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    noise = rng.normal(size=n) * 1e-6
    y = 2000.0 + 3.0 * x1 + 1.0 * x2 + noise
    df = pot.DataFrame({"y": y, "x1": x1, "x2": x2, "const": np.ones(n)})
    stats = df.select(
        col("y").least_squares.ols(
            col("x1"), col("x2"), col("const"), mode="statistics"
        )
    )["statistics"].to_list()[0]
    x = np.stack([x1, x2, np.ones(n)], axis=1)
    beta = np.linalg.lstsq(x, y, rcond=None)[0]
    resid = y - x @ beta
    mse_expected = float(np.mean(resid**2))
    assert stats["mse"] > 0.0
    np.testing.assert_allclose(stats["mse"], mse_expected, rtol=1e-3)
    assert 0.0 < stats["r2"] < 1.0
    assert np.isfinite(stats["standard_errors"]).all()


def test_blocks_cache_lru():
    """Two alternating queries against the same group layout must each build
    their partition exactly once (LRU of 2, not clear-all-on-insert)."""
    from polars_ols_tpu.engine import fit as fit_mod

    rng = np.random.default_rng(4)
    n = 1_000
    base = {
        "g": rng.integers(20, size=n).astype(float),
        "x1": rng.normal(size=n),
        "x2": rng.normal(size=n),
        "ya": rng.normal(size=n),
        "yb": rng.normal(size=n),
    }
    df = pot.DataFrame(base)
    builds = {"n": 0}
    orig = fit_mod._build_blocks

    def counting(*args, **kw):
        builds["n"] += 1
        return orig(*args, **kw)

    fit_mod._build_blocks = counting
    try:
        qa = col("ya").least_squares.ols(col("x1"), col("x2")).over("g")
        qb = col("yb").least_squares.ols(col("x1"), col("x2")).over("g")
        for _ in range(3):
            df.select(qa)
            df.select(qb)
    finally:
        fit_mod._build_blocks = orig
    assert builds["n"] == 2, f"expected 2 partition builds, saw {builds['n']}"
