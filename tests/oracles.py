"""Host-side numpy oracle implementations used across the test suite.

The reference tests oracle against numpy/statsmodels/sklearn
(tests/test_ols.py). statsmodels is not available in this image, so the
statsmodels behaviours the reference relies on (WLS, RollingOLS with
expanding=True / missing='drop', OLS summary statistics) are reimplemented
here as small, literal numpy programs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def lstsq(x: np.ndarray, y: np.ndarray, rcond=None) -> np.ndarray:
    return np.linalg.lstsq(x, y, rcond=rcond)[0]


def wls_coef(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    sw = np.sqrt(w)
    return lstsq(x * sw[:, None], y * sw)


def ols_statistics(x: np.ndarray, y: np.ndarray):
    """OLS se/t/p/r2 identical to statsmodels' summary for alpha=0."""
    from scipy import stats

    n, p = x.shape
    beta = lstsq(x, y)
    resid = y - x @ beta
    rss = float(resid @ resid)
    df = n - p
    sigma2 = rss / df
    xtx_inv = np.linalg.inv(x.T @ x)
    se = np.sqrt(sigma2 * np.diag(xtx_inv))
    t = beta / se
    pvals = 2.0 * (1.0 - stats.t.cdf(np.abs(t), df))
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - rss / sst
    return {
        "coef": beta,
        "se": se,
        "t": t,
        "p": pvals,
        "r2": r2,
        "mse": rss / n,
    }


def ridge_statistics(x: np.ndarray, y: np.ndarray, alpha: float):
    """Ridge-aware se/t/p with the reference's df = n - trace((X'X+aI)^-1)
    convention (src/statistics.rs:124-128)."""
    from scipy import stats

    n, p = x.shape
    A = x.T @ x + alpha * np.eye(p)
    A_inv = np.linalg.inv(A)
    beta = A_inv @ (x.T @ y)
    resid = y - x @ beta
    rss = float(resid @ resid)
    df = n - float(np.trace(A_inv))
    sigma2 = rss / df
    se = np.sqrt(sigma2 * np.abs(np.diag(A_inv)))
    t = beta / se
    pvals = 2.0 * (1.0 - stats.t.cdf(np.abs(t), df))
    return {"coef": beta, "se": se, "t": t, "p": pvals, "mse": rss / n}


def rolling_ols_drop_window(
    x: np.ndarray,
    y: np.ndarray,
    window: int,
    min_periods: Optional[int] = None,
    alpha: float = 0.0,
) -> np.ndarray:
    """statsmodels RollingOLS(expanding=True, missing='drop') semantics:
    positional window, only valid rows inside it, estimates defined when the
    window holds >= min_periods valid rows, otherwise NaN."""
    n, k = x.shape
    if min_periods is None:
        min_periods = min(k, window)
    valid = ~(np.isnan(y) | np.isnan(x).any(axis=1))
    out = np.full((n, k), np.nan)
    for t in range(n):
        lo = max(0, t - window + 1)
        idx = np.arange(lo, t + 1)
        idx = idx[valid[idx]]
        if len(idx) >= min_periods:
            xt, yt = x[idx], y[idx]
            a = xt.T @ xt + alpha * np.eye(k)
            try:
                out[t] = np.linalg.solve(a, xt.T @ yt)
            except np.linalg.LinAlgError:
                pass
    return out


def rolling_ols_valid_window(
    x: np.ndarray,
    y: np.ndarray,
    window: int,
    min_periods: Optional[int] = None,
    alpha: float = 0.0,
) -> np.ndarray:
    """Reference 'drop' semantics: window spans the last `window` *valid*
    observations; coefficients forward-fill across invalid rows; NaN before
    the min_periods-th valid observation (src/least_squares.rs:947-986)."""
    n, k = x.shape
    if min_periods is None:
        min_periods = min(k, window)
    valid = ~(np.isnan(y) | np.isnan(x).any(axis=1))
    valid_idx = np.nonzero(valid)[0]
    out = np.full((n, k), np.nan)
    last = None
    vpos = 0
    for t in range(n):
        if valid[t]:
            vpos += 1
            if vpos >= min_periods:
                take = valid_idx[max(0, vpos - window) : vpos]
                xt, yt = x[take], y[take]
                a = xt.T @ xt + alpha * np.eye(k)
                last = np.linalg.solve(a, xt.T @ yt)
        if last is not None:
            out[t] = last
    return out


def recursive_least_squares(
    x: np.ndarray,
    y: np.ndarray,
    valid: np.ndarray,
    half_life: Optional[float] = None,
    initial_state_covariance: float = 10.0,
    initial_state_mean=None,
) -> np.ndarray:
    """Literal reimplementation of the reference's sequential Kalman-style
    RLS recursion (src/least_squares.rs:494-598) as a ground-truth oracle."""
    n, k = x.shape
    ff = np.exp(np.log(0.5) / half_life) if half_life else 1.0
    coef = np.zeros(k) if initial_state_mean is None else np.full(k, np.nan)
    if initial_state_mean is not None:
        coef = np.broadcast_to(np.asarray(initial_state_mean, dtype=float), (k,)).copy()
    p = np.eye(k) * initial_state_covariance
    out = np.zeros((n, k))
    for t in range(n):
        if valid[t]:
            xt = x[t]
            r = 1.0 + xt @ p @ xt / ff
            kal = p @ xt / (r * ff)
            coef = coef + kal * (y[t] - xt @ coef)
            p = p / ff - np.outer(kal, kal) * r
        out[t] = coef
    return out


def elastic_net_cd(
    x: np.ndarray,
    y: np.ndarray,
    alpha: float,
    l1_ratio: float = 0.5,
    max_iter: int = 1000,
    tol: float = 1e-5,
    positive: bool = False,
) -> np.ndarray:
    """Literal reimplementation of the reference's cyclic coordinate descent
    (src/least_squares.rs:386-492)."""
    n, k = x.shape
    a = alpha * n
    w = np.zeros(k)
    r = y.copy()
    col_sq = (x * x).sum(axis=0)
    for _ in range(max_iter):
        w_old = w.copy()
        for j in range(k):
            if w[j] != 0.0:
                r += x[:, j] * w[j]
            rho = x[:, j] @ r
            z = np.sign(rho) * max(abs(rho) - a * l1_ratio, 0.0)
            if positive:
                z = max(z, 0.0)
            denom = col_sq[j] + a * (1.0 - l1_ratio)
            w[j] = z / denom if denom > 0 else 0.0
            if w[j] != 0.0:
                r -= x[:, j] * w[j]
        if np.linalg.norm(w - w_old) < tol:
            break
    return w
