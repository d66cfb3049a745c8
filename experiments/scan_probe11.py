"""Probe 11: stage times of rolling refined-SM at 10k x 100 (single group).

Suspected: the chunk-0 direct pass (400 column passes over [512,K,K,1])
dominates; also times the scan and seeds.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import polars_ols_tpu.ops.moving as mov

jax.config.update("jax_enable_x64", True)
F64 = jnp.float64


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
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
    G, R, K, W = 1, 10_240, 100, 252
    Xp = jnp.asarray(rng.normal(size=(G, R, K)))
    yp = jnp.asarray(rng.normal(size=(G, R)))
    vp = jnp.ones((G, R), dtype=bool)

    print("full solve_rolling_lanes:", t(lambda: mov.solve_rolling_lanes(
        Xp, yp, vp, window=W, min_periods=None, alpha=0.0, positional=True)))

    # isolate: the refined core without the chunk-0 direct overwrite
    X = (Xp.astype(F64)).transpose(1, 2, 0)
    y = yp.transpose(1, 0)
    Xs = jnp.concatenate([jnp.zeros((W, K, G), F64), X[: R - W]], axis=0)
    ys = jnp.concatenate([jnp.zeros((W, G), F64), y[: R - W]], axis=0)
    reg = jnp.full(G, 1e-6, F64)

    import functools

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def refined_only(X, y, Xs, ys, chunk):
        return mov._rolling_refined_sm(X, y, Xs, ys, reg, chunk)

    print("refined_sm (incl chunk-0 fix):", t(lambda: refined_only(X, y, Xs, ys, 512)))

    # the direct chunk-0 style pass alone, via lane chol vec on [C,K,K,1]
    @jax.jit
    def chunk0_direct(X, y, Xs, ys):
        C = 512
        Xa0, ya0 = X[:C], y[:C]
        Xl0, yl0 = Xs[:C], ys[:C]
        dU = Xa0[:, :, None, :] * Xa0[:, None, :, :] - Xl0[:, :, None, :] * Xl0[:, None, :, :]
        du = Xa0 * ya0[:, None, :] - Xl0 * yl0[:, None, :]
        W_t = jnp.cumsum(dU, axis=0)
        b_t = jnp.cumsum(du, axis=0)
        eye = jnp.eye(K, dtype=F64)
        A_t = W_t + reg[None, None, None, :] * eye[:, :, None]
        return mov._lane_chol_solve_vec(A_t, b_t)

    print("chunk0 direct pass alone:", t(lambda: chunk0_direct(X, y, Xs, ys)))


if __name__ == "__main__":
    main()
