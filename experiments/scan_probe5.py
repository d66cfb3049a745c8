"""Probe 5: where do grouped rolling's ~450 ms (vs rls 226 ms) go?

Times solve_rolling_lanes stage by stage at the grouped bench shape
(G=10k, R=320 padded, K=5, positional window 252).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
F64 = jnp.float64


def sync(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(jnp.ravel(x)[:1].astype(jnp.float32))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from polars_ols_tpu.ops.moving import (
        _lane_chol_solve,
        _rolling_lane_chol,
        solve_rolling_lanes,
    )

    rng = np.random.default_rng(0)
    G, R, K, W = 10_000, 320, 5, 252
    Xp = jnp.asarray(rng.normal(size=(G, R, K)))
    yp = jnp.asarray(rng.normal(size=(G, R)))
    vp = jnp.ones((G, R), dtype=bool)

    t, _ = timeit(
        lambda a, b, c: solve_rolling_lanes(
            a, b, c, window=W, min_periods=None, alpha=0.0, positional=True
        ),
        Xp, yp, vp,
    )
    print(f"full solve_rolling_lanes: {t*1e3:.1f} ms")

    # stage: transposes + streams only
    @jax.jit
    def streams(Xp, yp, vp):
        vf = vp.astype(F64)
        X = (Xp * vf[..., None]).transpose(1, 2, 0)
        y = (yp * vf).transpose(1, 0)
        Xs = jnp.concatenate([jnp.zeros((W, K, G), F64), X[: R - W]], axis=0)
        ys = jnp.concatenate([jnp.zeros((W, G), F64), y[: R - W]], axis=0)
        r = jnp.cumsum(vp.transpose(1, 0).astype(jnp.int64), axis=0)
        return X, y, Xs, ys, r

    t, (X, y, Xs, ys, r) = timeit(streams, Xp, yp, vp)
    print(f"streams (transpose+shift+rank): {t*1e3:.1f} ms")

    # stage: chunked chol kernel alone
    reg = jnp.full(G, 1e-8, F64)
    for chunk in (64, 128):
        t, coefs = timeit(
            jax.jit(lambda a, b, c, d: _rolling_lane_chol(a, b, c, d, reg, chunk)),
            X, y, Xs, ys,
        )
        print(f"_rolling_lane_chol chunk={chunk}: {t*1e3:.1f} ms")

    # stage: ffill assoc-scan alone
    t0 = jnp.arange(R)
    defined = r >= 5

    @jax.jit
    def ffill(coefs, defined):
        coefs = jnp.where(defined[:, None, :], coefs, jnp.nan)

        def last_defined(a, b):
            ca, da = a
            cb, db = b
            return jnp.where(db, cb, ca), da | db

        d1 = defined[:, None, :]
        filled, seen = lax.associative_scan(
            last_defined, (jnp.where(d1, coefs, 0.0), d1), axis=0
        )
        return jnp.where(seen, filled, jnp.nan)

    t, _ = timeit(ffill, coefs, defined)
    print(f"ffill assoc-scan: {t*1e3:.1f} ms")

    # stage: cumsum of dU alone (the big [C,K,K,G] traffic) at chunk 64
    @jax.jit
    def one_chunk(X, y, Xs, ys):
        Xa, Xl = X[:64], Xs[:64]
        dU = Xa[:, :, None, :] * Xa[:, None, :, :] - Xl[:, :, None, :] * Xl[:, None, :, :]
        W_t = jnp.cumsum(dU, axis=0)
        return W_t

    t, _ = timeit(one_chunk, X, y, Xs, ys)
    print(f"one chunk dU+cumsum (x5 chunks/query): {t*1e3:.1f} ms")

    # stage: lane chol solve alone on one chunk
    Wc = jnp.asarray(rng.normal(size=(64, K, K, G)))
    Wc = Wc + jnp.swapaxes(Wc, 1, 2) + 10.0 * jnp.eye(K, dtype=F64)[None, :, :, None]
    bc = jnp.asarray(rng.normal(size=(64, K, G)))
    t, _ = timeit(jax.jit(_lane_chol_solve), Wc, bc)
    print(f"lane chol one chunk (x5/query): {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
