"""Probe 7: bisect the engine rolling query in-process.

Times, on the engine's own cached arrays: the lane kernel, the padded
prediction multiply-add, the unpad, and fill_nan — then the full query."""

import time

import numpy as np
import jax.numpy as jnp

import polars_ols_tpu as pls
from polars_ols_tpu import col
import polars_ols_tpu.engine.fit as F
from polars_ols_tpu.ops.moving import solve_rolling_lanes
from polars_ols_tpu.engine.groups import layout_for_columns


def sync(x):
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
    feats = [col(f"x{i+1}") for i in range(k)]
    expr = col("y").least_squares.rolling_ols(*feats, window_size=252).over("g")

    def run():
        return df.select(expr)["y"]

    out = run()
    np.asarray(out.values[-2:])  # compile + warm caches

    target = df["y"]
    fseries = [df[f"x{i+1}"] for i in range(k)]
    layout = layout_for_columns([df["g"]])
    vals, valid = F._stack_cached(target, fseries)
    Xp, yp, vp, pv = F._moving_cached(layout, vals, valid, "drop_window")

    print("kernel:", t(lambda: solve_rolling_lanes(
        Xp, yp, vp, window=252, min_periods=None, alpha=0.0, positional=True)))

    coefs_p = solve_rolling_lanes(
        Xp, yp, vp, window=252, min_periods=None, alpha=0.0, positional=True
    )
    coefs_p.block_until_ready()

    def preds():
        acc = Xp[..., 0] * coefs_p[..., 0]
        for kk in range(1, k):
            acc = acc + Xp[..., kk] * coefs_p[..., kk]
        return acc

    print("padded preds multiply-add:", t(preds))
    preds_p = preds()

    print("unpad gather:", t(lambda: F._unpad_rows(layout, preds_p)))
    flat = F._unpad_rows(layout, preds_p)

    print("fill_nan pass:", t(lambda: jnp.where(jnp.isnan(flat), 0.0, flat)))

    def full():
        o = run()
        return o.values

    print("full query:", t(full))


if __name__ == "__main__":
    main()
