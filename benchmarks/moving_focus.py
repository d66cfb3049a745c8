"""Focused grouped-config bench: just the models being optimized
(rls / rolling / explicit svd / explicit qr) to avoid recompiling the whole
suite when iterating. Same shapes and timing protocol as suite.py."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import polars_ols_tpu as pls  # noqa: E402
from polars_ols_tpu import col  # noqa: E402


def _time(fn, reps=5):
    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out.values[-2:])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


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
    queries = {
        "rls": lambda: df.select(ls.rls(*feats, half_life=252.0).over("g"))["y"],
        "rolling": lambda: df.select(
            ls.rolling_ols(*feats, window_size=252).over("g")
        )["y"],
        "ols_svd": lambda: df.select(ls.ols(*feats, solve_method="svd").over("g"))["y"],
        "ols_qr_explicit": lambda: df.select(
            ls.ols(*feats, solve_method="qr").over("g")
        )["y"],
    }
    for name, fn in queries.items():
        pls.clear_caches()
        ms = _time(fn) * 1e3
        print(f"{name:<16} {ms:9.3f} ms")


if __name__ == "__main__":
    main()
