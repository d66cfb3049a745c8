"""Where does elastic_net's 24-ms-above-floor exec go at 10k x 100?

Components timed separately (G=1, K=100, covariance form):
  a) the full solve_elastic_net_cov (FISTA + 2 CD polish sweeps)
  b) FISTA while_loop only (polish removed)
  c) CD polish sweeps only (fori over K coordinates x2)
  d) power-iteration Lipschitz estimate only
  e) unrolled FISTA variant: U steps per while iteration

Run on the real chip: python experiments/enet_probe.py
"""
import time
from functools import partial

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
    from polars_ols_tpu.ops.cd import (
        _coord_update,
        _mv,
        _soft_threshold,
        solve_elastic_net_cov,
    )

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, K))
    y = X.sum(axis=1) + rng.normal(size=N)
    XtX = jnp.asarray(X.T @ X)[None]
    Xty = jnp.asarray(X.T @ y)[None]
    nv = jnp.asarray([float(N)])
    a, l1 = 0.1, 0.5

    t = bench(lambda: sync(solve_elastic_net_cov(
        XtX, Xty, nv, alpha=a, l1_ratio=l1, max_iter=200, tol=1e-5)))
    print(f"full solve_elastic_net_cov: {t:7.1f} ms")

    A, b = XtX[0], Xty[0]
    al = a * N
    a_l1, a_l2 = al * l1, al * (1 - l1)

    @jax.jit
    def power_only(A):
        def pw(_, v):
            v = _mv(A, v)
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-300)
        v = lax.fori_loop(0, 24, pw, jnp.full(K, K ** -0.5, dtype=F64))
        return jnp.vdot(v, _mv(A, v))

    print(f"power iteration (24 steps):  {bench(lambda: sync(power_only(A))):7.1f} ms")

    @partial(jax.jit, static_argnames=("unroll",))
    def fista_only(A, b, unroll: int):
        L = power_only(A) * 1.02 + a_l2 + 1e-300
        def body(state):
            w, z, tt, it, _ = state
            for _ in range(unroll):
                grad = _mv(A, z) - b + a_l2 * z
                w_new = _soft_threshold(z - grad / L, a_l1 / L, False)
                t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tt * tt))
                z_new = w_new + ((tt - 1.0) / t_new) * (w_new - w)
                restart = jnp.vdot(z - w_new, w_new - w) > 0.0
                z = jnp.where(restart, w_new, z_new)
                tt = jnp.where(restart, 1.0, t_new)
                delta = jnp.linalg.norm(w_new - w)
                w = w_new
            return w, z, tt, it + unroll, delta
        def cond(state):
            *_, it, delta = state
            return (it < 800) & (delta >= 1e-5 * 0.05)
        w0 = jnp.zeros(K, dtype=F64)
        out = lax.while_loop(cond, body, (w0, w0, jnp.asarray(1.0, F64),
                                          jnp.int32(0), jnp.asarray(jnp.inf, F64)))
        return out[0], out[3]

    for u in (1, 4, 8):
        w, iters = fista_only(A, b, u)
        t = bench(lambda u=u: sync(fista_only(A, b, u)[0]))
        print(f"FISTA only (unroll={u}):      {t:7.1f} ms   iters={int(iters)}")

    @jax.jit
    def polish_only(A, b, w):
        update = _coord_update(A, b, a_l1, a_l2, False)
        def coord_body(j, w):
            return w.at[j].set(update(j, w))
        for _ in range(2):
            w = lax.fori_loop(0, K, coord_body, w)
        return w

    w0 = jnp.zeros(K, dtype=F64)
    print(f"2 CD polish sweeps:          {bench(lambda: sync(polish_only(A, b, w0))):7.1f} ms")


if __name__ == "__main__":
    main()
