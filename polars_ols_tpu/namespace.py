"""The `.least_squares` expression namespace.

Method-for-method mirror of the reference's namespace class
(polars_ols/__init__.py:35-295): ols/wls/ridge/lasso/elastic_net/rls/
rolling_ols/expanding_ols/multi_target_ols/from_formula/predict/
predict_from_formula, reachable as ``col("y").least_squares.<model>(...)``.
"""

from __future__ import annotations

from typing import List, Optional, Union

from .expr import Expr
from .least_squares import (
    OLSKwargs,
    RLSKwargs,
    RollingKwargs,
    compute_least_squares,
    compute_multi_target_least_squares,
    compute_recursive_least_squares,
    compute_rolling_least_squares,
    predict,
)

ExprOrStr = Union[Expr, str]


class LeastSquares:
    """Entry points for every model supported by the engine. Parameters
    common to all models mirror the reference docstring
    (polars_ols/__init__.py:37-60): sample_weights, add_intercept,
    mode ∈ {predictions, residuals, coefficients, statistics}, null_policy
    ∈ {ignore, zero, drop, drop_zero, drop_y_zero_x, drop_window}."""

    def __init__(self, expr: Expr):
        self._expr = expr

    def least_squares(
        self,
        *features: ExprOrStr,
        sample_weights: Optional[ExprOrStr] = None,
        add_intercept: bool = False,
        mode: str = "predictions",
        null_policy: str = "ignore",
        solve_method: Optional[str] = None,
        multi_target: bool = False,
        **ols_kwargs,
    ) -> Expr:
        ols_func = (
            compute_least_squares if not multi_target else compute_multi_target_least_squares
        )
        return ols_func(
            self._expr,
            *features,
            sample_weights=sample_weights,
            add_intercept=add_intercept,
            mode=mode,
            ols_kwargs=OLSKwargs(null_policy=null_policy, solve_method=solve_method, **ols_kwargs),
        )

    def ols(self, *features: ExprOrStr, **kwargs) -> Expr:
        """Ordinary least squares. Alias for `least_squares`."""
        return self.least_squares(*features, **kwargs)

    def multi_target_ols(self, *features: ExprOrStr, **kwargs) -> Expr:
        return self.least_squares(*features, multi_target=True, **kwargs)

    def wls(self, *features: ExprOrStr, sample_weights: ExprOrStr, **kwargs) -> Expr:
        """Weighted least squares via sqrt-weight scaling."""
        return self.least_squares(*features, sample_weights=sample_weights, **kwargs)

    def ridge(self, *features: ExprOrStr, alpha: float, **kwargs) -> Expr:
        return self.least_squares(*features, alpha=alpha, l1_ratio=0.0, **kwargs)

    def lasso(self, *features: ExprOrStr, alpha: float, **kwargs) -> Expr:
        return self.least_squares(*features, alpha=alpha, l1_ratio=1.0, **kwargs)

    def elastic_net(
        self,
        *features: ExprOrStr,
        alpha: float,
        l1_ratio: float = 0.5,
        positive: bool = False,
        **kwargs,
    ) -> Expr:
        return self.least_squares(
            *features, alpha=alpha, l1_ratio=l1_ratio, positive=positive, **kwargs
        )

    def rls(
        self,
        *features: ExprOrStr,
        sample_weights: Optional[ExprOrStr] = None,
        add_intercept: bool = False,
        mode: str = "predictions",
        null_policy: str = "drop",
        half_life: Optional[float] = None,
        initial_state_covariance: Optional[float] = 10.0,
        initial_state_mean: Union[Optional[List[float]], float] = None,
    ) -> Expr:
        """Recursive least squares (exponentially forgetting expanding fit)."""
        return compute_recursive_least_squares(
            self._expr,
            *features,
            sample_weights=sample_weights,
            add_intercept=add_intercept,
            mode=mode,
            rls_kwargs=RLSKwargs(
                null_policy=null_policy,
                half_life=half_life,
                initial_state_mean=initial_state_mean,
                initial_state_covariance=initial_state_covariance,
            ),
        )

    def rolling_ols(
        self,
        *features: ExprOrStr,
        window_size: int,
        sample_weights: Optional[ExprOrStr] = None,
        add_intercept: bool = False,
        mode: str = "predictions",
        null_policy: str = "drop",
        min_periods: Optional[int] = None,
        use_woodbury: Optional[bool] = None,
        alpha: Optional[float] = None,
    ) -> Expr:
        """Rolling-window least squares; see RollingKwargs for null policy
        semantics ('drop' = window over valid observations, 'drop_window' =
        statsmodels missing='drop' fixed positional window)."""
        return compute_rolling_least_squares(
            self._expr,
            *features,
            sample_weights=sample_weights,
            add_intercept=add_intercept,
            mode=mode,
            rolling_kwargs=RollingKwargs(
                window_size=window_size,
                min_periods=min_periods,
                use_woodbury=use_woodbury,
                alpha=alpha,
                null_policy=null_policy,
            ),
        )

    def expanding_ols(self, *features: ExprOrStr, **kwargs) -> Expr:
        return self.rls(*features, half_life=None, **kwargs)

    def from_formula(self, formula: str, **kwargs) -> Expr:
        from .utils import build_expressions_from_patsy_formula

        features, add_intercept = build_expressions_from_patsy_formula(
            formula, include_dependent_variable=False
        )
        if kwargs.get("half_life"):
            return self.rls(*features, add_intercept=add_intercept, **kwargs)
        elif kwargs.get("window_size"):
            return self.rolling_ols(*features, add_intercept=add_intercept, **kwargs)
        else:
            return self.least_squares(*features, add_intercept=add_intercept, **kwargs)

    def predict(
        self,
        *features: ExprOrStr,
        name: Optional[str] = None,
        add_intercept: bool = False,
        null_policy: str = "zero",
    ) -> Expr:
        return predict(
            self._expr,
            *features,
            add_intercept=add_intercept,
            name=name,
            null_policy=null_policy,
        )

    def predict_from_formula(self, formula: str, name: Optional[str] = None) -> Expr:
        from .utils import build_expressions_from_patsy_formula

        features, add_intercept = build_expressions_from_patsy_formula(
            formula, include_dependent_variable=False
        )
        has_const = any(f.meta.output_name == "const" for f in features)
        add_intercept &= not has_const
        return self.predict(*features, name=name, add_intercept=add_intercept)
