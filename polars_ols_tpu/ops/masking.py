"""Null-policy engine: the six policies as pure mask/fill transforms.

Mirrors the semantics of the reference's `compute_is_valid_mask` /
`handle_nulls` (src/expressions.rs:201-296) and the per-entry-point
prediction broadcast rules (src/expressions.rs:390-427), but *never filters
rows*: filtering would create dynamic shapes under jit. Instead excluded
rows are zeroed so they contribute nothing to moment accumulation or the
minimum-norm SVD objective — numerically identical to dropping them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

VALID_NULL_POLICIES = {"zero", "drop", "ignore", "drop_zero", "drop_y_zero_x", "drop_window"}
DROP_FAMILY = {"drop", "drop_zero", "drop_y_zero_x", "drop_window"}


@dataclass
class MaskedProblem:
    """Device-ready fitting/prediction arrays for one least-squares call.

    Attributes:
        y: [N] or [N, M] target values prepared for fitting (rows excluded
           from the fit are zeroed; 'ignore' materialises nulls as NaN).
        X: [N, K] features prepared for fitting.
        fit_mask: [N] bool — rows participating in the fit.
        X_predict: [N, K] full-length features used to broadcast predictions
           (zero-filled, reference src/expressions.rs:408).
        predict_valid: optional [N] bool — when present, predictions are
           null-masked by it (policy 'drop' and all drop-family moving
           models, src/expressions.rs:398-427, 624-701).
    """

    y: jnp.ndarray
    X: jnp.ndarray
    fit_mask: jnp.ndarray
    X_predict: jnp.ndarray
    predict_valid: Optional[jnp.ndarray]


def is_valid_mask(policy: str, y_valid: jnp.ndarray, x_valid: jnp.ndarray) -> jnp.ndarray:
    """Row validity per policy (src/expressions.rs:201-228). ``y_valid`` may
    be [N] or [N, M] (multi-target: AND across target struct fields)."""
    yv = y_valid if y_valid.ndim == 1 else y_valid.all(axis=1)
    if policy == "drop_y_zero_x":
        return yv
    return yv & x_valid.all(axis=1)


def prepare_problem(
    policy: str,
    y_values: jnp.ndarray,
    y_valid: jnp.ndarray,
    x_values: jnp.ndarray,
    x_valid: jnp.ndarray,
    moving: bool = False,
) -> MaskedProblem:
    """Apply a null policy to raw values+validity, producing fit/predict arrays.

    Args:
        policy: one of VALID_NULL_POLICIES.
        y_values: [N] or [N, M]; values at invalid slots are arbitrary.
        y_valid: validity of y ([N] or [N, M]).
        x_values/x_valid: [N, K].
        moving: recursive/rolling models always fit on zero-filled data with
            validity carried separately (src/expressions.rs:656,683) and mask
            predictions for every drop-family policy.
    """
    assert policy in VALID_NULL_POLICIES, f"invalid null policy {policy!r}"
    n = x_values.shape[0]
    yv2 = y_valid if y_values.ndim == 1 else y_valid
    x_zero = jnp.where(x_valid, x_values, 0.0)
    y_zero = jnp.where(yv2, y_values, 0.0)
    mask = is_valid_mask(policy, y_valid, x_valid)

    if moving:
        fit_mask = mask if policy in DROP_FAMILY else jnp.ones(n, dtype=bool)
        predict_valid = mask if policy in DROP_FAMILY else None
        return MaskedProblem(y_zero, x_zero, fit_mask, x_zero, predict_valid)

    if policy == "ignore":
        y_nan = jnp.where(yv2, y_values, jnp.nan)
        x_nan = jnp.where(x_valid, x_values, jnp.nan)
        ones = jnp.ones(n, dtype=bool)
        return MaskedProblem(y_nan, x_nan, ones, x_nan, None)

    if policy == "zero":
        ones = jnp.ones(n, dtype=bool)
        return MaskedProblem(y_zero, x_zero, ones, x_zero, None)

    # drop family: zero excluded rows entirely so they drop out of the fit
    row = mask if y_values.ndim == 1 else mask[:, None]
    y_fit = jnp.where(row, y_zero, 0.0)
    x_fit = jnp.where(mask[:, None], x_zero, 0.0)
    predict_valid = mask if policy in ("drop", "drop_window") else None
    return MaskedProblem(y_fit, x_fit, mask, x_zero, predict_valid)
