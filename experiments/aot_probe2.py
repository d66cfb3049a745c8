"""Does the remote compile service memoize byte-identical programs across
processes? (Cold-start mitigation, VERDICT r4 task 3 follow-up.)

Design: the engine's real grouped fit kernel (moments + Cholesky + CSNE
refine) at three feature widths that share no earlier compile:
  A. fresh process compiles K=K1      -> T1 (cold)
  B. fresh process compiles K=K1 again-> T2 (same bytes as A)
  C. fresh process compiles K=K2     -> T3 (cold control)
T2 << T3 ~ T1  => the server memoizes; warm-start = pre-touch programs once
per fleet, every later process compiles fast. T2 ~ T1 => no server cache;
cold start is unavoidable per process on this backend.

Usage: python experiments/aot_probe2.py   (orchestrates subprocesses)
"""
import subprocess
import sys
import time


def child(k: int):
    sys.path.insert(0, "/root/repo")
    import numpy as np

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from polars_ols_tpu.engine.fit import _blocks_fit_kernel

    rng = np.random.default_rng(0)
    S, R = 20, 512
    Zp = jnp.asarray(rng.normal(size=(S, R, 1 + k)))
    wp = jnp.ones((S, R))
    bg = jnp.zeros(S, dtype=jnp.int32)
    up = jnp.arange(S * R, dtype=jnp.int32)[: 10_000]
    gids = jnp.zeros(10_000, dtype=jnp.int32)
    t0 = time.time()
    _blocks_fit_kernel.lower(
        Zp, wp, bg, up, gids, num_groups=1,
        alpha=jnp.asarray(0.0), want="preds", cd_params=None,
        force_refine=True, svd_guard=False, lu=False,
    ).compile()
    print(f"K={k}: compile {time.time() - t0:.1f}s", flush=True)


def main():
    for tag, k in (("A cold K=83", 83), ("B same  K=83", 83), ("C cold K=89", 89)):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, __file__, "child", str(k)],
                timeout=540, capture_output=True, text=True,
            )
            out = [ln for ln in r.stdout.splitlines() if "compile" in ln]
            print(f"{tag}: {out[0] if out else r.stderr[-500:]}")
        except subprocess.TimeoutExpired:
            print(f"{tag}: TIMED OUT after {time.time() - t0:.0f}s")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[2]))
    else:
        main()
