"""polars_ols_tpu.warmup: one call compiles + executes the standard program
family at the workload's shape, so later queries (and later processes via
the compile service's byte-identical memoization) start warm. Oracle: the
warmed queries are the REAL query paths, so each must produce finite output
and a later identical query must not recompile (compile-count monitor)."""

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col


def test_warmup_runs_every_family_and_mode():
    t = pot.warmup(64, 3, families=("ols", "ridge", "wls", "rls", "rolling_ols"),
                   statistics=True)
    assert set(t) == {
        "ols/predictions", "ols/statistics",
        "ridge/predictions", "ridge/statistics",
        "wls/predictions", "wls/statistics",
        "rls/predictions", "rolling_ols/predictions",
    }
    assert all(v > 0 for v in t.values())


def test_warmup_grouped_then_identical_shape_reuses_programs():
    import jax

    compiles = []
    jax.monitoring.register_event_duration_secs_listener(
        lambda name, dur, **kw: compiles.append(name)
        if "backend_compile" in name
        else None
    )
    pot.warmup(200, 2, n_groups=8, families=("ols",))

    # a second warmup at the same shape builds FRESH device arrays (cache
    # ids all miss, layouts rebuild) but must reuse every compiled program
    before = len(compiles)
    t2 = pot.warmup(200, 2, n_groups=8, families=("ols",))
    fit_compiles = sum("backend_compile" in c for c in compiles[before:])
    assert fit_compiles == 0, f"same-shape warmup recompiled {fit_compiles} programs"
    assert t2["ols/predictions"] > 0

    # and a real query at the same shape produces finite output
    rng = np.random.default_rng(1)
    df = pot.DataFrame(
        {
            "y": rng.normal(size=200),
            "x0": rng.normal(size=200),
            "x1": rng.normal(size=200),
            "g": rng.integers(8, size=200).astype(float),
        }
    )
    out = df.select(col("y").least_squares.ols(col("x0"), col("x1")).over("g"))
    vals = out[out.columns[0]].to_numpy()
    assert np.isfinite(vals).all()


def test_warmup_rejects_unknown_family():
    with pytest.raises(AssertionError, match="unknown families"):
        pot.warmup(16, 2, families=("ols", "nope"))
