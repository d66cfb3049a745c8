"""Oracle-parity integration tests, mirroring the reference suite
(/root/reference/tests/test_ols.py) with numpy/sklearn/scipy oracles
(statsmodels behaviours are reimplemented in tests/oracles.py)."""

from typing import Optional, Tuple

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import (
    OLSKwargs,
    col,
    compute_least_squares,
    compute_least_squares_from_formula,
    compute_multi_target_least_squares,
)
from polars_ols_tpu import selectors as cs

import oracles


def _make_data(
    n_samples: int = 2_000,
    n_features: int = 2,
    n_groups: Optional[int] = None,
    scale: float = 0.1,
    sparsity: float = 0.0,
    add_missing: bool = False,
    missing_columns: Optional[Tuple[str, ...]] = None,
) -> pot.DataFrame:
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_samples, n_features))
    eps = rng.normal(size=n_samples, scale=scale)
    data = {f"x{i + 1}": x[:, i] for i in range(n_features)}
    data["y"] = x[:, : int(n_features * (1.0 - sparsity))].sum(1) + eps
    df = pot.DataFrame(data)
    if n_groups is not None:
        df = df.with_columns(group=pot.lit(rng.integers(n_groups, size=n_samples).astype(float)))
    if add_missing:
        columns = missing_columns or [c for c in df.columns if c != "group"]
        cols = {c: df[c] for c in df.columns}
        for c in columns:
            vals = df[c].to_numpy().astype(float)
            mask = rng.random(n_samples) < 0.1
            cols[c] = pot.Series(c, np.where(mask, 0.0, vals), ~mask)
        df = pot.DataFrame(cols)
    return df


def _xy(df, features=("x1", "x2")):
    x = np.stack([df[f].to_numpy() for f in features], axis=1)
    y = df["y"].to_numpy()
    return x, y


# --------------------------------------------------------------------------- #
# static OLS / ridge / WLS
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("solve_method", ("qr", "svd", "chol", "lu", None))
def test_ols(solve_method):
    df = _make_data(n_samples=1_000)
    expr = compute_least_squares(
        col("y"), col("x1"), col("x2"), ols_kwargs=OLSKwargs(solve_method=solve_method)
    ).alias("predictions")
    out = df.lazy().with_columns(expr).collect()
    x, y = _xy(df)
    coef = np.linalg.lstsq(x, y, rcond=None)[0]
    assert np.allclose(out["predictions"].to_numpy(), x @ coef, atol=1e-4, rtol=1e-4)


def test_ols_coefficients_exact_parity():
    """BASELINE gate: exact fp64 coefficient parity vs numpy.linalg.lstsq."""
    df = _make_data(n_samples=5_000, n_features=10)
    feats = [f"x{i+1}" for i in range(10)]
    coef = (
        df.select(col("y").least_squares.ols(col("^x.*$"), mode="coefficients", solve_method="svd"))
        .unnest("coefficients")
        .to_numpy()
        .flatten()
    )
    x, y = _xy(df, feats)
    expected = np.linalg.lstsq(x, y, rcond=None)[0]
    np.testing.assert_allclose(coef, expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("solve_method", ("svd", "chol"))
def test_ridge(solve_method):
    df = _make_data()
    alpha = 0.01
    x, y = _xy(df)
    coef_expected = np.linalg.solve((x.T @ x) + np.eye(2) * alpha, x.T @ y)
    expr = compute_least_squares(
        col("y"), col("x1"), col("x2"),
        ols_kwargs=OLSKwargs(alpha=alpha, solve_method=solve_method),
    ).alias("predictions")
    out = df.lazy().with_columns(expr).collect()
    assert np.allclose(out["predictions"].to_numpy(), x @ coef_expected, rtol=1e-4, atol=1e-4)


def test_wls():
    rng = np.random.default_rng(1)
    array = rng.normal(size=(10_000, 2))
    noise = np.hstack([rng.normal(size=8_000, scale=10.0), rng.normal(size=2_000, scale=0.1)])
    weights = np.hstack([np.ones(8_000) / 10**2, np.ones(2_000) / 0.1**2])
    weights /= weights.mean()
    df = pot.DataFrame(
        {"y": array.sum(1) + noise, "x1": array[:, 0], "x2": array[:, 1], "sample_weight": weights}
    )
    out = df.lazy().with_columns(
        compute_least_squares(
            col("y"), col("x1"), col("x2"), sample_weights=col("sample_weight")
        ).alias("predictions_wls"),
        compute_least_squares(col("y"), col("x1"), col("x2")).alias("predictions_ols"),
    ).collect()
    x, y = _xy(df)
    coef_wls = oracles.wls_coef(x, y, weights)
    coef_ols = oracles.lstsq(x, y)
    assert np.allclose(out["predictions_wls"].to_numpy(), x @ coef_wls, rtol=1e-4, atol=1e-4)
    assert np.allclose(out["predictions_ols"].to_numpy(), x @ coef_ols, rtol=1e-4, atol=1e-4)


def test_ols_intercept():
    df = _make_data()
    expr = compute_least_squares(col("y"), col("x1"), col("x2"), add_intercept=True).alias("p")
    y_hat = df.select(expr).to_numpy().flatten()
    x, y = _xy(df)
    xi = np.hstack([x, np.ones((len(x), 1))])
    expected = xi @ oracles.lstsq(xi, y)
    assert np.allclose(y_hat, expected, atol=1e-4, rtol=1e-4)


def test_ols_residuals():
    df = _make_data()
    residuals = df.select(
        col("y").least_squares.from_formula("x1 + x2 -1", mode="residuals")
    ).to_numpy()
    x, y = _xy(df)
    coef = oracles.lstsq(x, y)
    assert np.allclose(residuals.flatten(), y - x @ coef, rtol=1e-4, atol=1e-4)


def test_least_squares_namespace():
    df = _make_data().with_columns(sample_weight=pot.lit(1.0))
    ols = col("y").least_squares.ols(col("x1"), col("x2")).alias("ols")
    ridge = col("y").least_squares.ridge(col("x1"), col("x2"), alpha=0.0).alias("ridge")
    wls = (
        col("y")
        .least_squares.wls(col("x1"), col("x2"), sample_weights=col("sample_weight"))
        .alias("wls")
    )
    formula = col("y").least_squares.from_formula("x1 + x2 - 1").alias("formula")
    out = df.lazy().select(ols, ridge, wls, formula).collect()
    arr = out.to_numpy().astype(float)
    assert np.allclose(np.corrcoef(arr.T), 1.0)


# --------------------------------------------------------------------------- #
# null policies
# --------------------------------------------------------------------------- #
def test_fit_missing_data_coefficients():
    df = _make_data(add_missing=True)

    def coefs(frame, policy):
        return (
            frame.select(
                col("y").least_squares.ols(
                    col("^x.*$"), null_policy=policy, mode="coefficients"
                )
            )
            .unnest("coefficients")
            .to_numpy()
        )

    assert np.allclose(coefs(df, "zero"), coefs(df.fill_null(0.0), "ignore"))
    assert np.allclose(coefs(df, "drop"), coefs(df.drop_nulls(), "ignore"))
    assert np.allclose(
        coefs(df, "drop_y_zero_x"),
        coefs(df.drop_nulls(subset=["y"]).fill_null(0.0), "ignore"),
    )


@pytest.mark.parametrize("null_policy", ["drop", "drop_zero", "drop_y_zero_x", "zero"])
def test_fit_missing_data_predictions_and_residuals(null_policy):
    df = _make_data(add_missing=True)
    x, y = _xy(df)
    if null_policy == "zero":
        # zero policy: every null (target included) becomes 0, all rows fit
        is_valid = np.ones(len(y), dtype=bool)
        x_fit, y_fit = np.nan_to_num(x), np.nan_to_num(y)
    elif null_policy == "drop_y_zero_x":
        is_valid = ~np.isnan(y)
        x_fit, y_fit = np.nan_to_num(x[is_valid, :]), y[is_valid]
    else:
        is_valid = ~np.isnan(x).any(axis=1) & ~np.isnan(y)
        x_fit, y_fit = x[is_valid, :], y[is_valid]
    coef = oracles.lstsq(x_fit, y_fit)
    x_predict = np.nan_to_num(x)
    predictions_expected = x_predict @ coef
    if null_policy == "drop":
        predictions_expected[~is_valid] = np.nan
    # residuals stay target - predictions with the RAW target: null targets
    # yield null residuals under every policy (reference least_squares.py:236)

    predictions = df.select(
        predictions=col("y").least_squares.ols(
            col("x1"), col("x2"), null_policy=null_policy, mode="predictions"
        )
    )
    assert np.allclose(
        predictions.to_numpy().flatten().astype(float),
        predictions_expected,
        rtol=1e-4,
        atol=1e-4,
        equal_nan=True,
    )

    residuals = df.select(
        residuals=col("y").least_squares.ols(
            col("x1"), col("x2"), null_policy=null_policy, mode="residuals"
        )
    )
    assert np.allclose(
        residuals.to_numpy().flatten().astype(float),
        y - predictions_expected,
        rtol=1e-4,
        atol=1e-4,
        equal_nan=True,
    )


def test_all_empty_data():
    df = pot.DataFrame({"A": [None, 2, None, 4], "B": [1, None, 3, None]})
    out = df.with_columns(
        col("A")
        .least_squares.ols(col("B"), mode="residuals", null_policy="drop", solve_method="svd")
        .alias("residuals")
    )
    assert all(v is None for v in out["residuals"].to_list())


# --------------------------------------------------------------------------- #
# wide / collinear problems
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("n_features", (2, 10, 100, 1_000))
def test_fit_wide(n_features):
    df = _make_data(n_samples=10, n_features=n_features, scale=1e-4)
    features = [col(f) for f in df.columns if f.startswith("x")]
    df = df.with_columns(
        col("y").least_squares.ols(*features, mode="coefficients").alias("coef_ols"),
        col("y")
        .least_squares.ridge(*features, mode="coefficients", alpha=1e-5)
        .alias("coef_ridge"),
        col("y")
        .least_squares.lasso(*features, mode="coefficients", alpha=1e-6, tol=1e-8, max_iter=3_000)
        .alias("coef_lasso"),
    )
    y = df["y"].to_numpy()
    for cname in ("coef_ols", "coef_ridge", "coef_lasso"):
        preds = (
            df.with_columns(coefficients=df[cname])
            .select(col("coefficients").least_squares.predict(*features))
            .to_numpy()
            .flatten()
        )
        corr = np.corrcoef(preds, y)[0, 1]
        assert corr == pytest.approx(1.0, rel=1e-5, abs=1e-5), cname


@pytest.mark.parametrize(
    "n_features, solve_method",
    [(10, "svd"), (99, "svd"), (300, "svd"), (90, "qr")],
)
def test_fit_multi_collinear(n_features, solve_method):
    n_samples = 100
    df = _make_data(n_samples=n_samples, n_features=n_features, scale=1e-4)
    last = f"x{n_features}"
    dup = f"x{n_features + 1}"
    df = df.with_columns((col(last) + 1.0e-12).alias(dup))
    features = [col(f) for f in df.columns if f.startswith("x")]

    coef = (
        df.select(
            col("y").least_squares.ols(
                *features, mode="coefficients", solve_method=solve_method, rcond=1e-16
            )
        )
        .unnest("coefficients")
        .to_numpy()
        .flatten()
    )
    feats = [f for f in df.columns if f.startswith("x")]
    x, y = _xy(df, feats)
    coef_expected = np.linalg.lstsq(x, y, rcond=1e-16)[0]
    if solve_method == "svd":
        assert np.allclose(coef, coef_expected, rtol=1e-2, atol=1e-2)
        assert np.allclose(x @ coef, x @ coef_expected, rtol=1e-4, atol=1e-4)
    else:
        assert not np.isnan(coef).any()
        assert np.allclose(x @ coef, x @ coef_expected, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# grouped (over) semantics
# --------------------------------------------------------------------------- #
def test_coefficients_ols_groups():
    df = _make_data(n_groups=10)
    coef_group = (
        df.select(
            "group",
            col("y").least_squares.ols(col("^x.*$"), mode="coefficients").over("group"),
        )
        .unique()
        .unnest("coefficients")
    )
    assert len(coef_group) == 10

    sub = df.filter(df["group"].to_numpy() == 1.0)
    coef_group_1 = (
        sub.select(col("y").least_squares.ols(col("^x.*$"), mode="coefficients"))
        .unnest("coefficients")
        .to_numpy()
    )
    got = coef_group.filter(coef_group["group"].to_numpy() == 1.0).select("x1", "x2").to_numpy()
    assert np.allclose(got, coef_group_1)


def test_coefficients_shape_broadcast():
    df = _make_data(n_samples=5_000, n_groups=10)
    assert df.select(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients")
    ).shape == (1, 1)
    assert df.with_columns(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients")
    ).shape == (5_000, 5)
    df_group = df.select(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients").over("group"),
        "group",
    )
    assert df_group.shape == (5_000, 2)
    assert df_group.unique().shape == (10, 2)


# --------------------------------------------------------------------------- #
# elastic net / lasso / NNLS
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "n_features,sparsity,alpha,solve_method",
    [
        (2, 0.0, 0.1, "cd"),
        (20, 0.5, 0.3, "cd"),
        # K >= _FISTA_MIN_K: plain 'cd' dispatches to the FISTA + CD-polish
        # path (ops/cd.py) — keep it oracle-covered, not just active-set
        (50, 0.5, 0.3, "cd"),
        (100, 0.9, 0.3, "cd"),
        (100, 0.9, 0.3, "cd_active_set"),
    ],
)
def test_elastic_net(n_features, sparsity, alpha, solve_method):
    from sklearn.linear_model import ElasticNet

    df = _make_data(n_features=n_features, sparsity=sparsity)
    features = [c for c in df.columns if c != "y"]
    x, y = _xy(df, features)
    mdl = ElasticNet(fit_intercept=False, alpha=alpha, l1_ratio=0.5, max_iter=1000, tol=1e-4)
    mdl.fit(x, y)
    predictions_1 = mdl.predict(x).flatten()
    predictions_2 = (
        df.lazy()
        .select(
            col("y").least_squares.elastic_net(
                *[col(f) for f in features],
                mode="predictions",
                l1_ratio=0.5,
                alpha=alpha,
                max_iter=1000,
                tol=1e-4,
                solve_method=solve_method,
            )
        )
        .collect()
        .to_numpy()
        .flatten()
    )
    assert np.allclose(predictions_1, predictions_2, rtol=1e-4, atol=1e-4)


def test_elastic_net_positive_large_k():
    """NNLS (positive=True) through the large-K FISTA + active-set-polish
    path (K >= _FISTA_MIN_K): the polish solves on the nonnegative support
    and must keep every coefficient >= 0 while matching sklearn."""
    from sklearn.linear_model import ElasticNet

    alpha = 0.3
    df = _make_data(n_features=50, sparsity=0.5)
    features = [c for c in df.columns if c != "y"]
    x, y = _xy(df, features)
    mdl = ElasticNet(
        fit_intercept=False, alpha=alpha, l1_ratio=0.5, positive=True,
        max_iter=1000, tol=1e-4,
    )
    mdl.fit(x, y)
    coefs = df.select(
        col("y").least_squares.elastic_net(
            *[col(f) for f in features],
            mode="coefficients",
            l1_ratio=0.5,
            alpha=alpha,
            positive=True,
            max_iter=1000,
            tol=1e-4,
        )
    )["coefficients"].to_numpy()[0]
    coefs = np.nan_to_num(coefs)  # null struct fields encode exact zeros
    assert (coefs >= 0.0).all()
    np.testing.assert_allclose(coefs, mdl.coef_, rtol=1e-3, atol=1e-4)


def test_elastic_net_active_set_iterates():
    """solve_method='cd_active_set' reproduces the reference's active-set
    iterate sequence (src/least_squares.rs:447-488): a coordinate whose
    update lands below tol is permanently frozen at that value — distinct
    from plain cyclic CD, which keeps re-updating it. Oracle: a direct
    numpy re-implementation of the reference loop."""
    alpha, l1_ratio, tol, max_iter = 0.3, 0.9, 1e-3, 200
    df = _make_data(n_features=12, sparsity=0.6)
    features = [c for c in df.columns if c != "y"]
    x, y = _xy(df, features)

    n, K = x.shape
    a = alpha * n
    al1, al2 = a * l1_ratio, a * (1.0 - l1_ratio)
    xtx, xty = x.T @ x, x.T @ y
    w = np.zeros(K)
    active = set(range(K))
    for _ in range(max_iter):
        w_old = w.copy()
        for j in range(K):
            if j not in active:
                continue
            rho = xty[j] - xtx[j] @ w + xtx[j, j] * w[j]
            wj = np.sign(rho) * max(abs(rho) - al1, 0.0) / (xtx[j, j] + al2)
            w[j] = wj
            if abs(wj) < tol:
                active.discard(j)
        if np.linalg.norm(w - w_old) < tol:
            break

    got = (
        df.select(
            col("y").least_squares.elastic_net(
                *[col(f) for f in features],
                mode="coefficients",
                l1_ratio=l1_ratio,
                alpha=alpha,
                max_iter=max_iter,
                tol=tol,
                solve_method="cd_active_set",
            )
        )["coefficients"]
        .to_numpy()[0]
    )
    # nulls in the struct encode exact zeros as NaN -> treat as 0
    got = np.nan_to_num(got)
    np.testing.assert_allclose(got, w, rtol=1e-8, atol=1e-10)


def test_elastic_net_non_negative():
    from sklearn.linear_model import ElasticNet

    df = _make_data()
    x, y = _xy(df)
    x2 = np.stack([x[:, 0], -x[:, 1]], axis=1)
    mdl = ElasticNet(
        fit_intercept=False, alpha=0.1, l1_ratio=0.5, max_iter=1000, tol=1e-4, positive=True
    )
    mdl.fit(x2, y)
    coef = (
        df.lazy()
        .select(
            col("y").least_squares.elastic_net(
                col("x1"),
                -col("x2"),
                mode="coefficients",
                l1_ratio=0.5,
                alpha=0.1,
                max_iter=1000,
                tol=1e-4,
                positive=True,
            )
        )
        .unnest("coefficients")
        .collect()
        .to_numpy()
        .flatten()
    )
    assert np.allclose(mdl.coef_, coef, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# recursive least squares
# --------------------------------------------------------------------------- #
def test_recursive_least_squares():
    df = _make_data(add_missing=True)
    coef_rls = (
        df.lazy()
        .select(
            col("y")
            .least_squares.rls(
                col("x1"),
                col("x2"),
                mode="coefficients",
                half_life=None,
                initial_state_covariance=1_000_000.0,
                null_policy="drop",
            )
        )
        .unnest("coefficients")
        .collect()
        .to_numpy()
    )
    coef_ols = (
        df.lazy()
        .select(
            col("y").least_squares.ols(
                col("x1"), col("x2"), mode="coefficients", null_policy="drop"
            )
        )
        .unnest("coefficients")
        .collect()
        .to_numpy()
        .flatten()
    )
    assert np.allclose(coef_rls[-1], coef_ols, rtol=1e-4, atol=1e-4)


def test_recursive_least_squares_vs_kalman_oracle():
    df = _make_data(n_samples=500, add_missing=True)
    x, y = _xy(df)
    valid = ~(np.isnan(y) | np.isnan(x).any(axis=1))
    expected = oracles.recursive_least_squares(
        np.nan_to_num(x), np.nan_to_num(y), valid, half_life=20.0, initial_state_covariance=5.0
    )
    got = (
        df.select(
            col("y").least_squares.rls(
                col("x1"),
                col("x2"),
                mode="coefficients",
                half_life=20.0,
                initial_state_covariance=5.0,
                null_policy="drop",
            )
        )
        .unnest("coefficients")
        .to_numpy()
    )
    assert np.allclose(got, expected, rtol=1e-6, atol=1e-8)


def test_recursive_least_squares_prior():
    df = _make_data()
    coef_rls_prior = (
        df.lazy()
        .select(
            col("y").least_squares.rls(
                col("x1"),
                col("x2"),
                mode="coefficients",
                half_life=None,
                initial_state_covariance=1.0e-6,
                initial_state_mean=[0.25, 0.25],
            )
        )
        .unnest("coefficients")
        .collect()
        .to_numpy()
    )
    assert np.allclose(coef_rls_prior[0], [0.25, 0.25], rtol=1e-3, atol=1e-3)
    assert np.allclose(coef_rls_prior[10], [0.25, 0.25], rtol=1e-3, atol=1e-3)
    assert not np.allclose(coef_rls_prior[-1], [0.5, 0.5], rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# rolling window
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "window_size,min_periods,use_woodbury",
    [(2, 2, False), (10, 2, False), (10, 2, True), (63, 5, False), (252, 5, True)],
)
def test_rolling_least_squares(window_size, min_periods, use_woodbury):
    df = _make_data(n_samples=1_000, add_missing=True, missing_columns=("y",))
    coef_rolling = (
        df.lazy()
        .select(
            col("y").least_squares.rolling_ols(
                col("x1"),
                col("x2"),
                mode="coefficients",
                window_size=window_size,
                min_periods=min_periods,
                use_woodbury=use_woodbury,
                null_policy="drop_window",
            )
        )
        .unnest("coefficients")
        .collect()
        .to_numpy()
    )
    x, y = _xy(df)
    expected = oracles.rolling_ols_drop_window(x, y, window_size, min_periods)
    # statsmodels parity includes forward-fill of undefined estimates
    for j in range(2):
        col_e = expected[:, j]
        idx = np.where(~np.isnan(col_e), np.arange(len(col_e)), -1)
        np.maximum.accumulate(idx, out=idx)
        expected[:, j] = np.where(idx >= 0, col_e[np.maximum(idx, 0)], np.nan)
    assert np.allclose(coef_rolling, expected, rtol=1e-3, atol=1e-3, equal_nan=True)


@pytest.mark.parametrize("min_periods,expected", [(999, 2), (1_000, 1), (1_001, 0)])
def test_rolling_ols_insufficient_data(min_periods, expected):
    df = _make_data(n_samples=1_000)
    coef_rolling = (
        df.lazy()
        .select(
            col("y").least_squares.rolling_ols(
                col("x1"),
                col("x2"),
                mode="coefficients",
                window_size=2_000,
                min_periods=min_periods,
                use_woodbury=False,
                null_policy="drop_window",
            )
        )
        .unnest("coefficients")
        .collect()
    )
    assert int(coef_rolling.count().max_horizontal().item()) == expected


@pytest.mark.parametrize("window_size", (21, 252))
def test_rolling_window_drop(window_size):
    """'drop' semantics == drop nulls, roll positionally, realign forward."""
    df = _make_data(n_samples=1_000, add_missing=True, missing_columns=("y",))
    x, y = _xy(df)
    expected = oracles.rolling_ols_valid_window(x, y, window_size, min_periods=2)
    got = (
        df.select(
            col("y").least_squares.rolling_ols(
                col("x1"),
                col("x2"),
                window_size=window_size,
                min_periods=2,
                mode="coefficients",
                null_policy="drop",
            )
        )
        .unnest("coefficients")
        .to_numpy()
    )
    assert np.allclose(got, expected, rtol=1e-6, atol=1e-8, equal_nan=True)


def test_moving_window_regressions_over():
    df = _make_data(n_samples=2_000, n_groups=10)
    out = (
        df.lazy()
        .select(
            "group",
            col("y")
            .least_squares.rolling_ols(
                col("x1"),
                col("x2"),
                mode="coefficients",
                window_size=1_000_000,
                min_periods=2,
                null_policy="drop",
            )
            .over("group")
            .alias("coef_rolling_ols_group"),
            col("y")
            .least_squares.rls(
                col("x1"),
                col("x2"),
                half_life=None,
                initial_state_covariance=1.0e6,
                mode="coefficients",
            )
            .over("group")
            .alias("coef_rls_group"),
            col("y")
            .least_squares.ols(col("x1"), col("x2"), mode="coefficients")
            .over("group")
            .alias("coef_ols_group"),
        )
        .collect()
    )
    df_last = out.group_by("group").last()
    a = df_last.unnest("coef_ols_group").select("x1", "x2").to_numpy()
    b = df_last.unnest("coef_rolling_ols_group").select("x1", "x2").to_numpy()
    c = df_last.unnest("coef_rls_group").select("x1", "x2").to_numpy()
    assert np.allclose(a, b)
    assert np.allclose(a, c, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# multi-target
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "alpha,mode,null_policy",
    [
        (0.0, "residuals", "ignore"),
        (0.0, "residuals", "drop"),
        (0.0001, "residuals", "drop_y_zero_x"),
        (0.01, "residuals", "drop_zero"),
    ],
)
def test_multi_target_regression(alpha, mode, null_policy):
    df = _make_data(
        n_samples=2_000,
        n_features=3,
        add_missing=null_policy not in {"zero", "ignore"},
        missing_columns=("x1",),
        n_groups=3,
    )
    df = df.with_columns(
        pot.struct(
            y1=col("x1") + col("x2") + col("x3"),
            y2=col("x1") - col("x2") + col("x3"),
            y3=-col("x1") + col("x2") - col("x3"),
        ).alias("y")
    )
    ols_kwargs = OLSKwargs(null_policy=null_policy, solve_method="svd", alpha=alpha)
    multi_target = df.select(
        compute_multi_target_least_squares(
            "y", col("^x.*$"), mode=mode, ols_kwargs=ols_kwargs
        )
        .over("group")
        .alias(mode)
    )
    expected = df.unnest("y").select(
        *[
            compute_least_squares(target, col("^x.*$"), mode=mode, ols_kwargs=ols_kwargs)
            .over("group")
            .alias(target)
            for target in ("y1", "y2", "y3")
        ]
    )
    got = multi_target.unnest(mode).to_numpy().astype(float)
    exp = expected.to_numpy().astype(float)
    assert np.allclose(got, exp, equal_nan=True, atol=1e-8)


def test_multi_target_weighted_grouped():
    """Weighted multi-target fits match per-target WLS (exercises the fused
    kernel's sqrt-weight scaling + 1/sqrt(w) prediction unscaling)."""
    rng = np.random.default_rng(7)
    df = _make_data(n_samples=2_000, n_features=3, n_groups=5)
    w = rng.uniform(0.1, 2.0, size=2_000)
    df = df.with_columns(pot.lit(w).alias("w")).with_columns(
        pot.struct(
            y1=col("x1") + 2.0 * col("x2"),
            y2=col("x2") - col("x3"),
        ).alias("t")
    )
    got = df.select(
        compute_multi_target_least_squares(
            "t", col("^x.*$"), sample_weights=col("w")
        )
        .over("group")
        .alias("p")
    ).unnest("p").to_numpy().astype(float)
    exp = df.unnest("t").select(
        *[
            compute_least_squares(
                target, col("^x.*$"), sample_weights=col("w")
            )
            .over("group")
            .alias(target)
            for target in ("y1", "y2")
        ]
    ).to_numpy().astype(float)
    assert np.allclose(got, exp, equal_nan=True, atol=1e-8)


# --------------------------------------------------------------------------- #
# formula / predict / statistics
# --------------------------------------------------------------------------- #
def test_coefficients_ols_formula():
    df = _make_data()
    coef = (
        df.select(col("y").least_squares.from_formula("x1 + x2 -1", mode="coefficients"))
        .unnest("coefficients")
        .to_numpy()[0]
    )
    assert np.allclose(coef.astype(float), [1.0, 1.0], atol=1e-2, rtol=1e-2)


def test_least_squares_from_formula_wls():
    rng = np.random.default_rng(2)
    weights = rng.uniform(0, 1, size=2_000)
    weights /= weights.mean()
    df = _make_data().with_columns(sample_weights=pot.lit(weights))
    expr = compute_least_squares_from_formula(
        "y ~ x1 + x2", sample_weights=col("sample_weights")
    ).alias("predictions")
    x, y = _xy(df)
    xi = np.hstack([x, np.ones((len(x), 1))])
    coef = oracles.wls_coef(xi, y, weights)
    assert np.allclose(
        df.select(expr).to_numpy().flatten(), xi @ coef, rtol=1e-4, atol=1e-4
    )


def test_formula_interactions():
    from polars_ols_tpu.utils import build_expressions_from_patsy_formula

    df = _make_data(n_features=4)
    exprs, add_intercept = build_expressions_from_patsy_formula(
        "y ~ x1 + x2:x3 - 1", include_dependent_variable=True
    )
    assert [e.meta.output_name for e in exprs] == ["y", "x1", "x2:x3"]
    assert not add_intercept
    out = df.select(col("y").least_squares.from_formula("x1 + x2:x3 - 1", mode="coefficients"))
    x = np.stack([df["x1"].to_numpy(), df["x2"].to_numpy() * df["x3"].to_numpy()], axis=1)
    expected = oracles.lstsq(x, df["y"].to_numpy())
    got = out.unnest("coefficients").to_numpy().flatten()
    assert np.allclose(got, expected, atol=1e-10)


def test_formula_term_removal():
    # patsy (which the reference parses through, polars_ols/utils.py:86-108)
    # treats "- term" as set difference applied left to right
    from polars_ols_tpu.utils import build_expressions_from_patsy_formula

    exprs, add_intercept = build_expressions_from_patsy_formula(
        "y ~ x1 + x2 + x3 - x2", include_dependent_variable=True
    )
    assert [e.meta.output_name for e in exprs] == ["y", "x1", "x3"]
    assert add_intercept

    # removal of an absent term is a no-op; dedup matches patsy; "- 1" still
    # drops the intercept alongside term removal
    exprs, add_intercept = build_expressions_from_patsy_formula(
        "y ~ x1 + x1 + x2 - x9 - 1", include_dependent_variable=True
    )
    assert [e.meta.output_name for e in exprs] == ["y", "x1", "x2"]
    assert not add_intercept

    # interaction terms are removable by their full name
    exprs, _ = build_expressions_from_patsy_formula(
        "x1 + x2:x3 - x2:x3 + x4", include_dependent_variable=False
    )
    assert [e.meta.output_name for e in exprs] == ["x1", "x4"]

    df = _make_data(n_features=3, n_groups=1)
    out = df.select(
        col("y").least_squares.from_formula("x1 + x2 - x2 - 1", mode="coefficients")
    )
    x = df["x1"].to_numpy()[:, None]
    expected = oracles.lstsq(x, df["y"].to_numpy())
    got = out.unnest("coefficients").to_numpy().flatten()
    assert np.allclose(got, expected, atol=1e-10)


def test_predict():
    df = _make_data(n_groups=1)
    df_test = _make_data(n_samples=20, n_groups=1).drop("y")
    df_coefficients = (
        df.lazy()
        .select(
            "group",
            col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients").over("group"),
        )
        .unique()
        .collect()
    )
    predictions = (
        df_test.lazy()
        .join(df_coefficients, on="group")
        .select(
            col("coefficients").least_squares.predict(
                col("x1"), col("x2"), name="predictions", null_policy="zero"
            )
        )
        .collect()
        .to_numpy()
        .flatten()
    )
    xt = np.stack([df_test["x1"].to_numpy(), df_test["x2"].to_numpy()], axis=1)
    coefs = df_coefficients.unnest("coefficients").select("x1", "x2").to_numpy()
    expected = (xt @ coefs.T).flatten()
    assert np.allclose(predictions, expected)


def test_predict_null_coefficients_left_join():
    """Unmatched left-join rows carry null coefficient structs; predict
    yields NaN for them (the reference's unnest -> to_ndarray turns null
    fields into NaN, src/expressions.rs:726-729) and masks them to null
    under null_policy='drop'."""
    df = _make_data(n_groups=4)
    coefs = (
        df.filter(col("group") != 3.0)
        .select(
            "group",
            col("y").least_squares.ols(col("x1"), col("x2"), mode="coefficients").over("group"),
        )
        .unique()
    )
    joined = df.join(coefs, on="group", how="left")
    g = joined["group"].to_numpy()
    preds = joined.select(
        col("coefficients").least_squares.predict(col("x1"), col("x2"), name="p")
    )["p"]
    vals = preds.to_numpy()
    assert np.isnan(vals[g == 3.0]).all()
    assert np.isfinite(vals[g != 3.0]).all()

    dropped = joined.select(
        col("coefficients").least_squares.predict(
            col("x1"), col("x2"), name="p", null_policy="drop"
        )
    )["p"]
    assert dropped.validity is not None
    keep = np.asarray(dropped.validity)
    assert (~keep[g == 3.0]).all() and keep[g != 3.0].all()


def test_predict_intercept():
    df = pot.DataFrame(
        {"y": [1.0, 2, 3, 4], "x1": [3.0, 4, 5, 6], "x2": [4.0, 5, 6, 7], "x3": [5.0, 6, 7, 8]}
    )
    df = df.with_columns(
        col("y").least_squares.ols(cs.starts_with("x"), add_intercept=True, mode="coefficients")
    )
    df = df.with_columns(
        col("coefficients")
        .least_squares.predict(cs.starts_with("x"), add_intercept=True)
        .alias("y_pred")
    )
    assert np.allclose(df["y"].to_numpy(), df["y_pred"].to_numpy())


def test_predict_formula():
    df = _make_data()
    df = (
        df.lazy()
        .with_columns(
            coefficients=col("y").least_squares.from_formula("x1 + x2", mode="coefficients"),
            predictions_1=col("y").least_squares.from_formula("x1 + x2", mode="predictions"),
        )
        .with_columns(
            predictions_2=col("coefficients").least_squares.predict_from_formula("x1 + x2")
        )
        .collect()
    )
    assert np.allclose(df["predictions_1"].to_numpy(), df["predictions_2"].to_numpy())


def test_predict_complex():
    df = _make_data(n_groups=10)
    df = (
        df.lazy()
        .with_columns(
            predictions_1=col("y")
            .least_squares.rls(col("x1"), col("x2"), mode="predictions")
            .over("group"),
            coefficients=col("y")
            .least_squares.rls(col("x1"), col("x2"), mode="coefficients")
            .over("group"),
        )
        .with_columns(
            predictions_2=col("coefficients").least_squares.predict(col("x1"), col("x2"))
        )
        .collect()
    )
    assert np.allclose(df["predictions_1"].to_numpy(), df["predictions_2"].to_numpy())


def test_least_squares_statistics():
    df = _make_data()
    statistics = df.select(
        col("y").least_squares.ols(cs.starts_with("x"), mode="statistics", add_intercept=True)
    ).unnest("statistics")
    residuals = df.select(
        col("y").least_squares.ols(cs.starts_with("x"), mode="residuals", add_intercept=True)
    )
    x, y = _xy(df)
    xi = np.hstack([x, np.ones((len(x), 1))])
    res = oracles.ols_statistics(xi, y)
    expected_mse = (residuals.to_numpy().flatten() ** 2).mean()
    assert statistics["r2"].item() == pytest.approx(res["r2"])
    assert statistics["mse"].item() == pytest.approx(expected_mse)
    exploded = statistics.explode(
        ["feature_names", "coefficients", "standard_errors", "t_values", "p_values"]
    )
    assert exploded["feature_names"].to_list() == ["x1", "x2", "const"]
    assert np.allclose(exploded["coefficients"].to_numpy(), res["coef"])
    assert np.allclose(exploded["standard_errors"].to_numpy(), res["se"])
    assert np.allclose(exploded["t_values"].to_numpy(), res["t"])
    assert np.allclose(exploded["p_values"].to_numpy(), res["p"])


def test_ridge_statistics():
    """Ridge statistics: df = n - trace((X'X+aI)^-1) branch
    (src/statistics.rs:124-128) against a hand-computed oracle."""
    df = _make_data(n_samples=500)
    alpha = 2.5
    statistics = df.select(
        col("y").least_squares.ridge(
            col("x1"), col("x2"), alpha=alpha, mode="statistics"
        )
    ).unnest("statistics")
    x, y = _xy(df)
    res = oracles.ridge_statistics(x, y, alpha)
    exploded = statistics.explode(
        ["feature_names", "coefficients", "standard_errors", "t_values", "p_values"]
    )
    np.testing.assert_allclose(
        exploded["coefficients"].to_numpy(), res["coef"], rtol=1e-8
    )
    np.testing.assert_allclose(
        exploded["standard_errors"].to_numpy(), res["se"], rtol=1e-8
    )
    np.testing.assert_allclose(exploded["t_values"].to_numpy(), res["t"], rtol=1e-8)
    np.testing.assert_allclose(
        exploded["p_values"].to_numpy(), res["p"], rtol=1e-6, atol=1e-12
    )
    assert statistics["mse"].item() == pytest.approx(res["mse"], rel=1e-8)


def test_weighted_recursive_least_squares():
    """sample_weights with rls: the reference sqrt-scales y and X before the
    recursion (least_squares.py:190-196); oracle = Kalman recursion on the
    scaled data."""
    rng = np.random.default_rng(7)
    df = _make_data(n_samples=500)
    w = rng.uniform(0.25, 4.0, size=500)
    df = df.with_columns(w=pot.lit(w))
    out = (
        df.select(
            col("y").least_squares.rls(
                col("x1"), col("x2"),
                mode="coefficients", half_life=30.0, sample_weights=col("w"),
            )
        )
        .unnest("coefficients")
        .to_numpy()
    )
    x, y = _xy(df)
    sw = np.sqrt(w)
    expected = oracles.recursive_least_squares(
        x * sw[:, None], y * sw, np.ones(500, dtype=bool), half_life=30.0
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-8)


def test_weighted_rolling_least_squares():
    """sample_weights with rolling_ols: sqrt-scaled data through the
    positional-window oracle; predictions unscale by 1/sqrt(w)."""
    rng = np.random.default_rng(8)
    n = 600
    df = _make_data(n_samples=n)
    w = rng.uniform(0.25, 4.0, size=n)
    df = df.with_columns(w=pot.lit(w))
    coef = (
        df.select(
            col("y").least_squares.rolling_ols(
                col("x1"), col("x2"),
                mode="coefficients", window_size=100, min_periods=5,
                sample_weights=col("w"), null_policy="drop_window",
            )
        )
        .unnest("coefficients")
        .to_numpy()
    )
    x, y = _xy(df)
    sw = np.sqrt(w)
    xs, ys = x * sw[:, None], y * sw
    expected = oracles.rolling_ols_drop_window(xs, ys, 100, min_periods=5)
    defined = ~np.isnan(expected).any(axis=1)
    np.testing.assert_allclose(
        coef[defined], expected[defined], rtol=1e-6, atol=1e-8
    )
    # predictions mode un-scales by 1/sqrt(w) (reference least_squares.py:234)
    preds = df.select(
        col("y").least_squares.rolling_ols(
            col("x1"), col("x2"),
            mode="predictions", window_size=100, min_periods=5,
            sample_weights=col("w"), null_policy="drop_window",
        )
    )["y"].to_numpy()
    expected_preds = np.einsum("nk,nk->n", xs, expected) / sw
    np.testing.assert_allclose(
        preds[defined], expected_preds[defined], rtol=1e-6, atol=1e-8
    )


def test_statistics_grouped_skewed():
    """Statistics over skewed group sizes (BASELINE config 5): each group's
    struct row matches the host oracle computed on that group alone."""
    rng = np.random.default_rng(7)
    n = 3_000
    x = rng.normal(size=(n, 2))
    y = x @ np.asarray([1.5, -0.5]) + rng.normal(size=n, scale=0.3)
    # skew: one giant group, a few mid, many tiny
    g = np.zeros(n, dtype=np.int64)
    g[2000:2600] = np.arange(600) % 3 + 1
    g[2600:] = np.arange(400) % 50 + 4
    df = pot.DataFrame({"y": y, "x1": x[:, 0], "x2": x[:, 1], "g": g.astype(float)})
    stats = df.select(
        col("y").least_squares.ols("x1", "x2", mode="statistics").over("g"),
        pot.col("g"),
    )
    rows = stats["statistics"].values
    for gi in np.unique(g):
        m = g == gi
        row = rows[int(np.nonzero(m)[0][0])]
        res = oracles.ols_statistics(x[m], y[m])
        np.testing.assert_allclose(row["coefficients"], res["coef"], rtol=1e-8)
        np.testing.assert_allclose(row["standard_errors"], res["se"], rtol=1e-7)
        np.testing.assert_allclose(row["t_values"], res["t"], rtol=1e-7)
        np.testing.assert_allclose(row["p_values"], res["p"], rtol=1e-6, atol=1e-12)
        assert row["r2"] == pytest.approx(res["r2"], rel=1e-8)


def test_clear_caches_preserves_results():
    """clear_caches() drops device-resident memoization; results rebuild
    identically afterwards."""
    df = _make_data(n_samples=500, n_groups=7)
    expr = col("y").least_squares.ols("x1", "x2").over("group")
    before = df.select(expr)["y"].to_numpy()
    pot.clear_caches()
    after = df.select(expr)["y"].to_numpy()
    np.testing.assert_array_equal(before, after)


def test_reference_readme_example():
    """The reference README's 10-row worked example (README.md:47-66)
    reproduces to its printed 2-decimal outputs."""
    df = pot.DataFrame(
        {
            "y": [1.16, -2.16, -1.57, 0.21, 0.22, 1.6, -2.11, -2.92, -0.86, 0.47],
            "x1": [0.72, -2.43, -0.63, 0.05, -0.07, 0.65, -0.02, -1.64, -0.92, -0.27],
            "x2": [0.24, 0.18, -0.95, 0.23, 0.44, 1.01, -2.08, -1.36, 0.01, 0.75],
            "group": [1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0],
            "weights": [0.34, 0.97, 0.39, 0.8, 0.57, 0.41, 0.19, 0.87, 0.06, 0.34],
        }
    )
    lasso = df.select(
        col("y").least_squares.lasso("x1", "x2", alpha=0.0001, add_intercept=True)
        .over("group")
    )["y"].to_numpy()
    wls = df.select(
        pot.compute_least_squares_from_formula(
            "y ~ x1 + x2 -1", sample_weights=col("weights")
        )
    )["y"].to_numpy()
    np.testing.assert_allclose(
        np.round(lasso[:5], 2), [0.97, -2.23, -1.54, 0.29, 0.37]
    )
    np.testing.assert_allclose(
        np.round(wls[:5], 2), [0.93, -2.18, -1.54, 0.27, 0.36]
    )
    # formula-API coefficient broadcast (README.md:85-106)
    coefs = df.select(
        col("y").least_squares.from_formula("x1 + x2", mode="coefficients")
    )["coefficients"]
    np.testing.assert_allclose(
        np.asarray(coefs.values)[0], [0.977375, 0.987413, 0.000757], atol=5e-6
    )


def test_scrambled_order_lazy_weighted_rolling_predict():
    """The reference's non-contiguous-memory scenario
    (tests/test_ols.py:969-996): partitions re-concatenated in reversed
    order, then a lazy pipeline of weighted rolling coefficients over
    groups chained into predict. Row order here is scrambled rather than
    rechunked (this engine has no chunked memory), which exercises the
    same contract — group-scattered rows, weighted drop-policy rolling,
    coefficient structs joined back through predict."""
    rng = np.random.default_rng(0)
    df = _make_data(n_samples=20_000, n_groups=5, n_features=10, add_missing=True)
    parts = df.partition_by("group")
    scrambled = pot.concat(
        [p.sort("x1") for p in reversed(parts)], how="vertical"
    )
    scrambled = scrambled.with_columns(
        weights=pot.lit(rng.uniform(0.0, 10.0, size=len(scrambled)))
    )
    out = (
        scrambled.lazy()
        .with_columns(
            col("y")
            .least_squares.rolling_ols(
                col("^x.*$"),
                window_size=100,
                min_periods=1,
                null_policy="drop",
                sample_weights="weights",
                mode="coefficients",
            )
            .over("group")
            .alias("coefficients")
        )
        .with_columns(
            col("coefficients").least_squares.predict(col("^x.*$")).alias("p")
        )
        .collect()
    )
    coefs = out["coefficients"].to_numpy()
    assert np.nanmean(coefs[-1]) == pytest.approx(1.0, rel=0.01, abs=0.01)
    # chained predict rows must reproduce X . beta_row
    X = np.stack([out[f"x{i+1}"].to_numpy() for i in range(10)], axis=1)
    p = out["p"].to_numpy()
    m = np.isfinite(coefs).all(axis=1) & np.isfinite(X).all(axis=1)
    np.testing.assert_allclose(
        p[m], np.einsum("nk,nk->n", np.nan_to_num(X[m]), coefs[m]), atol=1e-8
    )


def test_over_composite_group_keys():
    """`.over(k1, k2)` groups by the composite key (polars semantics; the
    reference inherits this from the polars engine — README:19): grouped
    OLS over two key columns equals per-composite-group numpy lstsq, and
    coefficient structs broadcast per composite group."""
    rng = np.random.default_rng(21)
    n = 3_000
    x = rng.normal(size=(n, 2))
    y = x.sum(axis=1) + rng.normal(size=n) * 0.1
    g1 = rng.integers(4, size=n).astype(float)
    g2 = rng.integers(3, size=n).astype(float)
    df = pot.DataFrame(
        {"x1": x[:, 0], "x2": x[:, 1], "y": y, "g1": g1, "g2": g2}
    )
    preds = df.select(
        col("y").least_squares.ols(col("x1"), col("x2")).over("g1", "g2").alias("p")
    )["p"].to_numpy()
    for a in range(4):
        for b in range(3):
            m = (g1 == a) & (g2 == b)
            beta = np.linalg.lstsq(x[m], y[m], rcond=None)[0]
            np.testing.assert_allclose(preds[m], x[m] @ beta, atol=1e-9)
    coefs = df.select(
        "g1", "g2",
        col("y").least_squares.ols(
            col("x1"), col("x2"), mode="coefficients"
        ).over("g1", "g2"),
    ).unique()
    assert coefs.shape == (12, 3)
