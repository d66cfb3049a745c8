"""Probe 6: account for the gap between solve_rolling_lanes (185 ms) and
the full engine rolling query (680 ms). Splits host dispatch vs device time
and times the cached-layout hit and the rls variant for contrast."""

import time

import numpy as np

import polars_ols_tpu as pls
from polars_ols_tpu import col


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
    ls = col("y").least_squares
    for name, expr in (
        ("rolling", ls.rolling_ols(*feats, window_size=252).over("g")),
        ("rls", ls.rls(*feats, half_life=252.0).over("g")),
    ):
        def run():
            return df.select(expr)["y"]

        out = run()
        np.asarray(out.values[-2:])  # compile + warm caches
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            t_build = time.perf_counter() - t0  # async: host dispatch only
            lazy = out.is_lazy
            np.asarray(out.tail(2).to_numpy())  # device done, no permute
            t_tail = time.perf_counter() - t0
            np.asarray(out.values[-2:])  # full row-order materialization
            t_total = time.perf_counter() - t0
            print(
                f"{name}: dispatch={t_build*1e3:6.1f}  +tail-sync="
                f"{t_tail*1e3:7.1f}  +materialize={t_total*1e3:7.1f} ms  lazy={lazy}"
            )


if __name__ == "__main__":
    main()
