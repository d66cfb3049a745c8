"""Probe: grouped moving models at K in 9..32 via the unrolled lane-chol.

Round 2 gated the unrolled lane Cholesky at K<=8 (op count ~K^3/6) and the
rolling refined-SM at G<=4, leaving grouped K in 9..32 on the slow classic
kernels. This measures the unrolled lane-chol at K=12/16 (gate raised via
POLS_TPU_LANE_CHOL_MAX_K) to decide the new default.

Run: POLS_TPU_LANE_CHOL_MAX_K=16 JAX_PLATFORMS=axon python experiments/largek_lanes_probe.py
"""

import os
import time

import numpy as np

os.environ.setdefault("POLS_TPU_LANE_CHOL_MAX_K", "16")

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from polars_ols_tpu.ops.moving import (  # noqa: E402
    solve_recursive_lanes,
    solve_rolling_lanes,
)


def timeit(name, fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    np.asarray(out[:1, :1, :1])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[:1, :1, :1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} compile {compile_s:6.1f}s  run {1e3 * min(ts):8.1f} ms")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    import sys
    ks = tuple(int(a) for a in sys.argv[1:]) or (12, 16)
    for K in ks:
        G, R = 10_000, 232  # ~2.3M rows over 10k groups (grouped config shape)
        Xp = jnp.asarray(rng.normal(size=(G, R, K)))
        yp = jnp.asarray(rng.normal(size=(G, R)))
        vp = jnp.ones((G, R), dtype=bool)
        timeit(
            f"rls K={K} G={G}",
            lambda: solve_recursive_lanes(
                Xp, yp, vp, half_life=None,
                initial_state_covariance=10.0, initial_state_mean=None,
            ),
        )
        timeit(
            f"rolling K={K} G={G}",
            lambda: solve_rolling_lanes(
                Xp, yp, vp, window=100, min_periods=None,
                alpha=0.0, positional=True,
            ),
        )


if __name__ == "__main__":
    main()
