"""Probe 8: why is the fused rolling query ~700 ms when the standalone
kernel costs 186 ms? Times _moving_query_kernel variants on the engine's
own cached inputs."""

import time

import numpy as np
import jax.numpy as jnp

import polars_ols_tpu as pls
from polars_ols_tpu import col
import polars_ols_tpu.engine.fit as F
from polars_ols_tpu.ops.moving import solve_rolling_lanes
from polars_ols_tpu.engine.groups import layout_for_columns


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    return np.asarray(jnp.ravel(x)[:1].astype(jnp.float32))


def t(fn, reps=3):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


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
    target = df["y"]
    fseries = [df[f"x{i+1}"] for i in range(k)]
    layout = layout_for_columns([df["g"]])
    vals, valid = F._stack_cached(target, fseries)
    Xp, yp, vp, pv = F._moving_cached(layout, vals, valid, "drop_window")
    R_pad = Xp.shape[1]
    print("R_pad:", R_pad, "G:", layout.num_groups)
    unpad = layout.device_unpad(R_pad)
    params = (252, None, 0.0, True)

    print("standalone solve_rolling_lanes:", t(lambda: solve_rolling_lanes(
        Xp, yp, vp, window=252, min_periods=None, alpha=0.0, positional=True)))

    print("fused full:", t(lambda: F._moving_query_kernel(
        Xp, yp, vp, unpad, None, model="rolling", params=params,
        k=k, nan_to_null=True, lazy=True, pair=True)))

    print("fused no nan_to_null:", t(lambda: F._moving_query_kernel(
        Xp, yp, vp, unpad, None, model="rolling", params=params,
        k=k, nan_to_null=False, lazy=True, pair=True)))


if __name__ == "__main__":
    main()
