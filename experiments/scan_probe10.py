"""Probe 10: A/B the engine rolling query vs the direct fused-kernel call
in the same process, interleaved, to rule out environment variance."""

import time

import numpy as np
import jax.numpy as jnp

import polars_ols_tpu as pls
from polars_ols_tpu import col
import polars_ols_tpu.engine.fit as F
from polars_ols_tpu.engine.groups import layout_for_columns


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

    out = df.select(expr)["y"]
    np.asarray(out.tail(2).to_numpy())  # warm query path

    target = df["y"]
    fseries = [df[f"x{i+1}"] for i in range(k)]
    layout = layout_for_columns([df["g"]])
    vals, valid = F._stack_cached(target, fseries)
    Xp, yp, vp, pv = F._moving_cached(layout, vals, valid, "drop_window")
    unpad = layout.device_unpad(Xp.shape[1])
    params = (252, None, 0.0, True)

    def direct():
        flat, validity = F._moving_query_kernel(
            Xp, yp, vp, unpad, pv, model="rolling", params=params,
            k=k, nan_to_null=True, lazy=True, pair=True,
        )
        return flat

    np.asarray(jnp.ravel(direct())[:1].astype(jnp.float32))  # warm direct

    for rep in range(3):
        t0 = time.perf_counter()
        o = df.select(expr)["y"]
        np.asarray(o.tail(2).to_numpy())
        tq = time.perf_counter() - t0
        t0 = time.perf_counter()
        f = direct()
        np.asarray(jnp.ravel(f)[:1].astype(jnp.float32))
        td = time.perf_counter() - t0
        print(f"query={tq*1e3:7.1f} ms   direct={td*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
