"""Least-squares evaluation engine — the TPU equivalent of the reference's
plugin entry points (src/expressions.rs:390-741).

Every model is evaluated as ONE batched JAX program over all groups at once:
host-side layout planning (group factorization, padded/split-padded gather
indices) feeds jitted kernels that accumulate moments with MXU matmuls and
solve per group (or per row, for moving-window models) with batched
factorizations.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..config import CONFIG
import jax
import jax.numpy as jnp

from ..series import ObjectSeries, Series, StructSeries
from ..ops import masking
from ..ops.cd import solve_elastic_net
from ..ops.direct import (
    grouped_moments,
    resolve_solve_method,
    solve_from_moments,
    solve_from_rows,
)
from ..ops.recursive import solve_recursive_least_squares
from ..ops.rolling import solve_rolling_ols
from ..ops.statistics import feature_metrics, residual_metrics
from .groups import build_layout, padded_indices, split_padded_indices

F64 = jnp.float64


# --------------------------------------------------------------------------- #
# layout helpers
# --------------------------------------------------------------------------- #
def _pad_rows(layout, arrays, mask):
    """Gather [N, ...] arrays into fully padded [G, R, ...] layouts.

    Returns (padded_arrays, combined_mask) where the mask ANDs padding
    validity with the supplied row mask.
    """
    if layout.num_groups == 1:
        return [a[None] for a in arrays], mask[None]
    gather, pmask, R = padded_indices(layout)
    g = jnp.asarray(gather.reshape(-1))
    padded = [
        jnp.take(a, g, axis=0).reshape((layout.num_groups, R) + a.shape[1:])
        for a in arrays
    ]
    pm = jnp.asarray(pmask) & jnp.take(mask, g).reshape(layout.num_groups, R)
    return padded, pm


def _unpad_rows(layout, padded: jnp.ndarray) -> jnp.ndarray:
    """Scatter a padded [G, R, ...] per-row result back to row order [N, ...]."""
    if layout.num_groups == 1:
        return padded[0]
    G, R = padded.shape[:2]
    flat = padded.reshape((G * R,) + padded.shape[2:])
    idx = jnp.asarray(layout.gids * R + layout.rank_in_group)
    return jnp.take(flat, idx, axis=0)


def _moments(layout, X, y, w):
    """Per-group XtX/Xty/counts via the split-padded MXU layout: heavy groups
    are split into row blocks whose partial moments are segment-summed."""
    r_cap = min(CONFIG.moment_chunk_rows, max(8, int(layout.counts.max())))
    gather, pmask, block_group, S = split_padded_indices(layout, r_cap)
    g = jnp.asarray(gather.reshape(-1))
    Xp = jnp.take(X, g, axis=0).reshape((S, r_cap, X.shape[1]))
    yp = jnp.take(y, g, axis=0).reshape((S, r_cap) + y.shape[1:])
    wp = jnp.asarray(pmask) & jnp.take(w, g).reshape(S, r_cap)
    return grouped_moments(Xp, yp, wp, jnp.asarray(block_group), layout.num_groups)


def _gather_per_row(layout, per_group: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(per_group, jnp.asarray(layout.gids), axis=0)


def _pick_chunk(G: int, k: int) -> int:
    """Bound scan-chunk memory: G * chunk * K^2 * 8 bytes <= ~512 MB."""
    budget = 512 * 1024 * 1024
    c = budget // max(1, G * k * k * 8)
    return int(max(8, min(CONFIG.moment_chunk_rows, c)))


# --------------------------------------------------------------------------- #
# target/feature extraction
# --------------------------------------------------------------------------- #
def _extract(target, feat_series):
    names = [s.name for s in feat_series]
    X = jnp.stack([jnp.asarray(s.values, dtype=F64) for s in feat_series], axis=1)
    xv = jnp.stack([s.valid_mask() for s in feat_series], axis=1)
    if isinstance(target, StructSeries):
        y = target.values
        yv = target.validity if target.validity is not None else jnp.ones_like(y, dtype=bool)
        return y, yv, X, xv, names, target.field_names
    y = jnp.asarray(target.values, dtype=F64)
    yv = target.valid_mask()
    return y, yv, X, xv, names, None


# --------------------------------------------------------------------------- #
# static fits
# --------------------------------------------------------------------------- #
def _fit_static(problem, layout, kwargs, k: int):
    """Dispatch + solve; returns beta [G, K] or [G, K, M] for multi-target."""
    alpha = kwargs.alpha or 0.0
    l1 = kwargs.l1_ratio
    positive = bool(kwargs.positive)
    method = resolve_solve_method(
        kwargs.solve_method, alpha, l1, positive, int(layout.counts.max()), k
    )
    if method in ("chol", "lu"):
        XtX, Xty, _ = _moments(layout, problem.X, problem.y, problem.fit_mask)
        return solve_from_moments(XtX, Xty, float(alpha), method)
    (Xp, yp), wp = _pad_rows(layout, [problem.X, problem.y], problem.fit_mask)
    Xp = Xp * wp[..., None]
    yp = yp * (wp if yp.ndim == 2 else wp[..., None])
    if method == "cd":
        n_valid = wp.sum(axis=1)
        return solve_elastic_net(
            Xp,
            yp,
            n_valid,
            alpha=float(alpha),
            l1_ratio=float(0.5 if l1 is None else l1),
            max_iter=int(kwargs.max_iter or 1000),
            tol=float(kwargs.tol if kwargs.tol is not None else 1e-5),
            positive=positive,
        )
    return solve_from_rows(Xp, yp, float(alpha), method, kwargs.rcond)


def _coef_struct(beta: jnp.ndarray, names: List[str], name: str = "coefficients"):
    """Coefficient matrix -> struct column; NaN entries become nulls
    (src/expressions.rs:114-143)."""
    return StructSeries(name, names, beta, jnp.isfinite(beta))


def _predictions(problem, coef_rows: jnp.ndarray, name: str) -> Series:
    """Row-wise dot of (possibly per-row) coefficients with predict features,
    with the policy's null re-masking (src/expressions.rs:145-195)."""
    preds = jnp.einsum("nk,nk->n", problem.X_predict, coef_rows)
    return Series(name, preds, problem.predict_valid)


# --------------------------------------------------------------------------- #
# entry point
# --------------------------------------------------------------------------- #
def evaluate_least_squares(
    function_name: str,
    target,
    feat_series: List[Series],
    kwargs,
    mode: str,
    gids: Optional[np.ndarray],
    multi_target: bool = False,
):
    y, yv, X, xv, names, target_names = _extract(target, feat_series)
    n, k = X.shape
    moving = function_name in ("recursive_least_squares", "rolling_least_squares")
    policy = kwargs.null_policy
    problem = masking.prepare_problem(policy, y, yv, X, xv, moving=moving)
    layout = build_layout(gids, n)
    G = layout.num_groups
    out_name = target.name

    if function_name == "least_squares":
        if mode == "statistics":
            return _statistics(problem, layout, kwargs, names, gids, k)
        beta = _fit_static(problem, layout, kwargs, k)
        if beta.ndim == 3:  # multi-target [G, K, M]
            return _multi_target_output(problem, beta, layout, target_names)
        if mode == "coefficients":
            if gids is None:
                return _coef_struct(beta, names)
            return _coef_struct(_gather_per_row(layout, beta), names)
        coef_rows = (
            jnp.broadcast_to(beta[0], (n, k)) if G == 1 else _gather_per_row(layout, beta)
        )
        return _predictions(problem, coef_rows, out_name)

    if moving:
        (Xp, yp), vp = _pad_rows(layout, [problem.X, problem.y], problem.fit_mask)
        chunk = _pick_chunk(G, k)
        if function_name == "recursive_least_squares":
            # quirk parity: the reference's predictions entry point ignores
            # initial_state_mean (src/expressions.rs:624-646 passes None)
            mean0 = kwargs.initial_state_mean if mode == "coefficients" else None
            if isinstance(mean0, (list, tuple)):
                mean0 = tuple(float(v) for v in mean0)
            elif mean0 is not None:
                mean0 = float(mean0)
            coefs_p = solve_recursive_least_squares(
                Xp,
                yp,
                vp,
                half_life=kwargs.half_life,
                initial_state_covariance=float(
                    10.0
                    if kwargs.initial_state_covariance is None
                    else kwargs.initial_state_covariance
                ),
                initial_state_mean=mean0,
                chunk=chunk,
            )
        else:
            coefs_p = solve_rolling_ols(
                Xp,
                yp,
                vp,
                window=int(kwargs.window_size),
                min_periods=kwargs.min_periods,
                alpha=float(kwargs.alpha or 0.0),
                positional=(policy == "drop_window"),
                chunk=chunk,
            )
        coef_rows = _unpad_rows(layout, coefs_p)  # [N, K]
        if mode == "coefficients":
            return _coef_struct(coef_rows, names)
        return _predictions(problem, coef_rows, out_name)

    raise ValueError(f"unknown least-squares function {function_name!r}")


def _multi_target_output(problem, beta, layout, target_names):
    """Predictions struct for multi-target fits (src/expressions.rs:521-591):
    Drop policy masks whole output rows with nulls."""
    if layout.num_groups == 1:
        preds = jnp.einsum("nk,km->nm", problem.X_predict, beta[0])
    else:
        coef_g = _gather_per_row(layout, beta)  # [N, K, M]
        preds = jnp.einsum("nk,nkm->nm", problem.X_predict, coef_g)
    validity = None
    if problem.predict_valid is not None:
        validity = problem.predict_valid[:, None] & jnp.ones_like(preds, dtype=bool)
    return StructSeries("predictions", target_names, preds, validity)


def _statistics(problem, layout, kwargs, names, gids, k):
    """mode='statistics': single-row struct per group with residual metrics,
    dispatch-solver coefficients and normal-equation se/t/p
    (src/expressions.rs:468-509, src/statistics.rs)."""
    alpha = float(kwargs.alpha or 0.0)
    XtX, Xty, counts = _moments(layout, problem.X, problem.y, problem.fit_mask)
    w = problem.fit_mask.astype(F64)
    yty_g = jax.ops.segment_sum(
        problem.y * problem.y * w, jnp.asarray(layout.gids), num_segments=layout.num_groups
    )
    fm = feature_metrics(XtX, Xty, yty_g, counts, alpha)

    # the 'coefficients' field reports the dispatch solver's estimate
    # (src/expressions.rs:475); se/t/p use the normal-equation recompute
    beta = _fit_static(problem, layout, kwargs, k)
    coef_rows = _gather_per_row(layout, beta)
    preds = jnp.einsum("nk,nk->n", problem.X, coef_rows)
    (yp, pp), wp = _pad_rows(layout, [problem.y, preds], problem.fit_mask)
    rm = residual_metrics(yp, pp, wp)

    rows = []
    beta_np = np.asarray(beta)
    fm_np = {kk: np.asarray(vv) for kk, vv in fm.items()}
    rm_np = {kk: np.asarray(vv) for kk, vv in rm.items()}
    for g in range(layout.num_groups):
        rows.append(
            {
                "r2": float(rm_np["r2"][g]),
                "mae": float(rm_np["mae"][g]),
                "mse": float(rm_np["mse"][g]),
                "feature_names": list(names),
                "coefficients": beta_np[g].tolist(),
                "standard_errors": fm_np["standard_errors"][g].tolist(),
                "t_values": fm_np["t_values"][g].tolist(),
                "p_values": fm_np["p_values"][g].tolist(),
            }
        )
    out = ObjectSeries("statistics", rows)
    if gids is not None:
        out = out.gather(layout.gids)
    return out


# --------------------------------------------------------------------------- #
# predict (out-of-sample, row-aligned coefficient struct)
# --------------------------------------------------------------------------- #
def evaluate_predict(coef, feat_series: List[Series], null_policy: str, name: str):
    assert isinstance(coef, StructSeries), (
        "the first input to predict must be a coefficients struct"
    )
    assert len(coef.field_names) == len(feat_series), (
        "number of coefficients must match number of features!"
    )
    X = jnp.stack([jnp.asarray(s.values, dtype=F64) for s in feat_series], axis=1)
    xv = jnp.stack([s.valid_mask() for s in feat_series], axis=1)
    Xp = jnp.where(xv, X, jnp.nan if null_policy == "ignore" else 0.0)
    preds = jnp.einsum("nk,nk->n", Xp, coef.values)
    validity = None
    if null_policy == "drop":
        validity = xv.all(axis=1) & coef.valid_mask()
    return Series(name, preds, validity)
