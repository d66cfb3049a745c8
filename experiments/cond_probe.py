"""Does lax.cond cost scale with the UNTAKEN branch on this backend?

ridge_svd/ols_svd carry a conditioning-gated lax.cond whose untaken branch
is a large row-space SVD (engine/fit.py _solve_dispatch svd_guard); the
measured rows sit ~+9-11 ms above the equivalent qr rows with the guard
never firing. Hypothesis: the conditional itself (scheduling/allocation of
the big dormant branch) is the residual.

Times three programs on the same data, identical taken-path math:
  a) fast path alone (CSNE-refined moment solve)
  b) lax.cond(True, fast, tiny_branch)
  c) lax.cond(True, fast, huge_svd_branch)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/cond_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_enable_x64", True)
F64 = jnp.float64
K, N = 100, 10_000


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def bench(fn, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return np.min(ts) * 1e3


def main():
    from polars_ols_tpu.ops.linalg import solve_psd, svd_lstsq

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, K))
    y = X.sum(1) + rng.normal(size=N)
    Xd = jnp.asarray(X)[None]
    yd = jnp.asarray(y)[None]
    XtX = jnp.asarray(X.T @ X)[None]
    Xty = jnp.asarray(X.T @ y)[None]

    def fast(b):
        return solve_psd(XtX, Xty)

    def tiny(b):
        return b + 1.0

    def huge(b):
        nv = jnp.asarray([float(N)])
        return svd_lstsq(Xd.astype(F64), yd.astype(F64), alpha=0.0,
                         rcond=None, n_valid=nv)

    pred = jnp.asarray(True)
    b0 = jnp.zeros((1, K), dtype=F64)

    f_a = jax.jit(lambda b: fast(b))
    f_b = jax.jit(lambda p, b: lax.cond(p, fast, tiny, b))
    f_c = jax.jit(lambda p, b: lax.cond(p, fast, huge, b))

    print(f"floor (trivial):            {bench(lambda: sync(jax.jit(lambda x: x + 1.0)(b0))):7.1f} ms")
    print(f"fast alone:                 {bench(lambda: sync(f_a(b0))):7.1f} ms")
    print(f"cond(fast | tiny):          {bench(lambda: sync(f_b(pred, b0))):7.1f} ms")
    print(f"cond(fast | huge svd):      {bench(lambda: sync(f_c(pred, b0))):7.1f} ms")


if __name__ == "__main__":
    main()
