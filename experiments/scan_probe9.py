"""Probe 9: the fused kernel is 195 ms but df.select(rolling) syncs at
~700 ms. Count kernel invocations and time the evaluate plumbing."""

import time

import numpy as np
import jax.numpy as jnp

import polars_ols_tpu as pls
from polars_ols_tpu import col
import polars_ols_tpu.engine.fit as F


def main():
    rng = np.random.default_rng(0)
    n, k, n_groups = 2_000_000, 5, 10_000
    x = rng.normal(size=(n, k))
    y = x.sum(axis=1) + rng.normal(size=n, scale=0.1)
    df = pls.DataFrame(
        {
            "y": y,
            **{f"x{i+1}": x[:, i] for i in range(k)},
            "g": rng.integers(n_groups, size=n).astype(float),
        }
    )
    feats = [col(f"x{i+1}") for i in range(k)]
    expr = col("y").least_squares.rolling_ols(*feats, window_size=252).over("g")

    calls = {"kernel": 0, "cache_build": 0, "stack": 0}
    orig_kernel = F._moving_query_kernel
    orig_build = F._build_padded_layout
    orig_stack_build = F._build_blocks

    def wrap_kernel(*a, **kw):
        calls["kernel"] += 1
        return orig_kernel(*a, **kw)

    def wrap_build(*a, **kw):
        calls["cache_build"] += 1
        return orig_build(*a, **kw)

    F._moving_query_kernel = wrap_kernel
    F._build_padded_layout = wrap_build

    out = df.select(expr)["y"]
    np.asarray(out.values[-2:])
    print("warm calls:", dict(calls))

    for _ in range(3):
        for key in calls:
            calls[key] = 0
        t0 = time.perf_counter()
        out = df.select(expr)["y"]
        t1 = time.perf_counter()
        np.asarray(out.tail(2).to_numpy())
        t2 = time.perf_counter()
        print(
            f"evaluate={t1-t0:.3f}s sync={t2-t1:.3f}s calls={dict(calls)} lazy={out.is_lazy}"
        )


if __name__ == "__main__":
    main()
