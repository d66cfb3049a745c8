"""Round-4 probe: what dominates the grouped statistics kernel (553 ms at
2M x 5 x 10k vs 46 ms for the plain grouped fit)?

Times jitted stage-variants of engine/fit._blocks_statistics_kernel on a
synthetic padded partition of the same shape class (S=10k blocks x R=200
rows x K=5), pipelined 4 ops per sync (the tunnel sync floor is ~30 ms):

  fit_only     : moments + solve (the plain fit's work)
  +rowpasses   : + sst / resid / sae / rss per-row segment passes
  +fm_nop      : + feature_metrics with p-values = t (betainc skipped)
  full         : + betainc p-values (the shipped kernel)
  betainc_only : jax.scipy.special.betainc on [G, K] f64 alone
  betainc_f32  : the same in f32

Run (own process): python experiments/statistics_probe.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

F64 = jnp.float64
S, R, K, G = 10_000, 200, 5, 10_000
BATCH = 4
REPS = 5


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])[:1]
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(BATCH)]
            np.asarray(jax.tree.leaves(outs[-1])[0])[:1]
            ts.append((time.perf_counter() - t0) / BATCH)
        print(f"{name:12s} {1e3 * float(np.min(ts)):8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED: {str(e)[:300]}", flush=True)


def _stats_body(Zp, wp, block_group, alpha, stage: str):
    import sys

    sys.path.insert(0, "/root/repo")
    from polars_ols_tpu.ops.direct import grouped_moments
    from polars_ols_tpu.ops.linalg import solve_psd
    from polars_ols_tpu.ops.statistics import _feature_metrics_jit

    yp, Xp = Zp[..., 0], Zp[..., 1:]
    XtX, Xty, counts = grouped_moments(Xp, yp, wp, block_group, G)
    A = XtX + jnp.asarray(alpha, F64) * jnp.eye(K, dtype=F64)
    beta = solve_psd(A, Xty)
    if stage == "fit_only":
        return beta
    wf = wp.astype(F64)
    seg = lambda v: jax.ops.segment_sum(v, block_group, num_segments=G)
    n_safe = jnp.maximum(counts, 1.0)
    sumy = seg((yp * wf).sum(axis=1))
    mean_b = jnp.take(sumy / n_safe, block_group, axis=0)
    sst = seg((((yp - mean_b[:, None]) * wf) ** 2).sum(axis=1))
    bb = jnp.take(beta, block_group, axis=0)
    preds = jnp.zeros_like(yp)
    for kk in range(K):
        preds = preds + Xp[..., kk] * bb[:, None, kk]
    resid = (yp - preds) * wf
    sae = seg(jnp.abs(resid).sum(axis=1))
    rss = seg((resid * resid).sum(axis=1))
    out = {"mse": rss / n_safe, "mae": sae / n_safe, "r2": 1.0 - rss / sst}
    if stage == "rowpasses":
        return out
    fm = _feature_metrics_jit(XtX, Xty, rss, counts, alpha, ridge=False)
    if stage == "fm_nop":
        # skip the betainc: report t in place of p
        out.update(
            standard_errors=fm["standard_errors"], t_values=fm["t_values"],
            p_values=fm["t_values"],
        )
        return out
    out.update(
        standard_errors=fm["standard_errors"], t_values=fm["t_values"],
        p_values=fm["p_values"],
    )
    return out


def main():
    print(f"devices: {jax.devices()}  S={S} R={R} K={K} G={G}", flush=True)
    rng = np.random.default_rng(0)
    Zp = jnp.asarray(rng.normal(size=(S, R, 1 + K)))
    wp = jnp.asarray(rng.random((S, R)) > 0.02)
    block_group = jnp.asarray(np.arange(S, dtype=np.int32))
    alpha = jnp.asarray(0.0, F64)

    for stage in ("fit_only", "rowpasses", "fm_nop", "full"):
        fn = jax.jit(partial(_stats_body, stage=stage))
        timeit(stage, fn, Zp, wp, block_group, alpha)

    t = jnp.asarray(rng.normal(size=(G, K)) * 3.0)
    dof = jnp.asarray(np.full((G, K), float(R - K)))

    @jax.jit
    def bi64(t, dof):
        x = dof / (dof + t * t)
        return jax.scipy.special.betainc(dof / 2.0, 0.5, x)

    @jax.jit
    def bi32(t, dof):
        t32, d32 = t.astype(jnp.float32), dof.astype(jnp.float32)
        x = d32 / (d32 + t32 * t32)
        return jax.scipy.special.betainc(d32 / 2.0, 0.5, x)

    timeit("betainc_f64", bi64, t, dof)
    timeit("betainc_f32", bi32, t, dof)


if __name__ == "__main__":
    main()
