"""Follow-up to enet_probe.py after the active-set Newton polish landed.

Times on the real chip (G=1, K=100):
  a) full solve_elastic_net_cov (FISTA + AS polish)
  b) _active_set_polish alone (2 rounds = 2 batched K=100 f64 Choleskys)
  c) power-iteration Lipschitz chain vs a Gershgorin row-sum bound
  d) FISTA with Gershgorin L: iteration count + wall clock

Run: python experiments/enet_probe2.py
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
        _active_set_polish,
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
    al = a * N
    a_l1, a_l2 = al * l1, al * (1 - l1)

    t = bench(lambda: sync(solve_elastic_net_cov(
        XtX, Xty, nv, alpha=a, l1_ratio=l1, max_iter=200, tol=1e-5)))
    print(f"full solve (FISTA + AS polish): {t:7.1f} ms")

    w_fista = solve_elastic_net_cov(XtX, Xty, nv, alpha=a, l1_ratio=l1,
                                    max_iter=200, tol=1e-5)

    pol = jax.jit(lambda w: _active_set_polish(
        XtX, Xty, jnp.full(1, a_l1), jnp.full(1, a_l2), w, False))
    print(f"AS polish alone (2 rounds):     {bench(lambda: sync(pol(w_fista))):7.1f} ms")

    A, b = XtX[0], Xty[0]

    @jax.jit
    def power_L(A):
        def pw(_, v):
            v = _mv(A, v)
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-300)
        v = lax.fori_loop(0, 24, pw, jnp.full(K, K ** -0.5, dtype=F64))
        return jnp.vdot(v, _mv(A, v)) * 1.02

    @jax.jit
    def gersh_L(A):
        return jnp.abs(A).sum(axis=1).max()

    Lp, Lg = float(power_L(A)), float(gersh_L(A))
    print(f"L power={Lp:.3e}  gershgorin={Lg:.3e}  ratio={Lg / Lp:.2f}")
    print(f"power chain: {bench(lambda: sync(power_L(A))):7.1f} ms  "
          f"gershgorin: {bench(lambda: sync(gersh_L(A))):7.1f} ms")

    @partial(jax.jit, static_argnames=("use_gersh",))
    def fista(A, b, use_gersh: bool):
        L = (gersh_L(A) if use_gersh else power_L(A)) + a_l2 + 1e-300

        def body(state):
            w, z, tt, it, _ = state
            grad = _mv(A, z) - b + a_l2 * z
            w_new = _soft_threshold(z - grad / L, a_l1 / L, False)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tt * tt))
            z_new = w_new + ((tt - 1.0) / t_new) * (w_new - w)
            restart = jnp.vdot(z - w_new, w_new - w) > 0.0
            z = jnp.where(restart, w_new, z_new)
            tt = jnp.where(restart, 1.0, t_new)
            return w_new, z, tt, it + 1, jnp.linalg.norm(w_new - w)

        def cond(state):
            *_, it, delta = state
            return (it < 800) & (delta >= 1e-5 * 0.05)

        w0 = jnp.zeros(K, dtype=F64)
        out = lax.while_loop(cond, body, (w0, w0, jnp.asarray(1.0, F64),
                                          jnp.int32(0), jnp.asarray(jnp.inf, F64)))
        return out[0], out[3]

    for g in (False, True):
        w, iters = fista(A, b, g)
        t = bench(lambda g=g: sync(fista(A, b, g)[0]))
        print(f"FISTA gersh={g}: {t:7.1f} ms   iters={int(iters)}")


if __name__ == "__main__":
    main()
