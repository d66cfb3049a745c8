"""Probe: cost structure of Sherman-Morrison scan bodies on this TPU backend.

Questions:
  1. f64 vs f32 per-step cost of the K=100 SM body (matvec + outer + state upd).
  2. Does vmapping L lanes over a shorter scan (re-anchored chunk parallelism)
     keep the per-step cost flat (i.e., wall time ~ depth, not rows)?
  3. Grouped small-K (G=10k, K=5): scan over rows with state [G,K,K] --
     f64 vs f32, and with the G axis moved minor-most ([K,K,G]).

Run on the real chip: python experiments/scan_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)


def sync(x):
    return np.asarray(jnp.ravel(x)[:1].astype(jnp.float32))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sm_body(carry, xyv):
    P, coef = carry
    x, yt = xyv
    Px = P @ x
    r = 1.0 + jnp.dot(x, Px)
    k = Px / r
    coef = coef + k * (yt - jnp.dot(x, coef))
    P = P - jnp.outer(k, k) * r
    return (P, coef), coef


def scan_single(X, y):
    K = X.shape[-1]
    P0 = jnp.eye(K, dtype=X.dtype) * 10.0
    (_, _), coefs = lax.scan(sm_body, (P0, jnp.zeros(K, X.dtype)), (X, y))
    return coefs


def scan_lanes(Xc, yc):
    # Xc: [C, L, K] scan over C with L lanes
    K = Xc.shape[-1]
    L = Xc.shape[1]
    dt = Xc.dtype

    def body(carry, xyv):
        P, coef = carry
        x, yt = xyv  # [L, K], [L]
        Px = jnp.einsum("lij,lj->li", P, x)
        r = 1.0 + jnp.einsum("li,li->l", x, Px)
        k = Px / r[:, None]
        coef = coef + k * (yt - jnp.einsum("li,li->l", x, coef))[:, None]
        P = P - k[:, :, None] * k[:, None, :] * r[:, None, None]
        return (P, coef), coef

    P0 = jnp.broadcast_to(jnp.eye(K, dtype=dt) * 10.0, (L, K, K))
    (_, _), coefs = lax.scan(body, (P0, jnp.zeros((L, K), dt)), (Xc, yc))
    return coefs


def scan_grouped(Xg, yg):
    # Xg: [R, G, K] scan over rows, G lanes (G minor-most would be [R, K, G])
    return scan_lanes(Xg, yg)


def scan_grouped_minor(Xg, yg):
    # Xg: [R, K, G] state [K, K, G] -- G on the 128-lane axis
    K = Xg.shape[1]
    G = Xg.shape[2]
    dt = Xg.dtype

    def body(carry, xyv):
        P, coef = carry  # [K, K, G], [K, G]
        x, yt = xyv  # [K, G], [G]
        Px = (P * x[None, :, :]).sum(axis=1)  # [K, G]
        r = 1.0 + (x * Px).sum(axis=0)  # [G]
        k = Px / r[None, :]
        coef = coef + k * (yt - (x * coef).sum(axis=0))[None, :]
        P = P - k[:, None, :] * k[None, :, :] * r[None, None, :]
        return (P, coef), coef

    P0 = jnp.broadcast_to(jnp.eye(K, dtype=dt)[:, :, None] * 10.0, (K, K, G))
    (_, _), coefs = lax.scan(body, (P0, jnp.zeros((K, G), dt)), (Xg, yg))
    return coefs


def main():
    rng = np.random.default_rng(0)

    # --- 1. K=100 single-lane scan, R=2048 (extrapolate per-row) ---
    R, K = 2048, 100
    X = rng.normal(size=(R, K))
    y = rng.normal(size=R)
    for dt in (jnp.float32, jnp.float64):
        t = timeit(jax.jit(scan_single), jnp.asarray(X, dt), jnp.asarray(y, dt))
        print(f"single-lane K={K} R={R} {dt.__name__}: {t*1e3:.1f} ms  ({t/R*1e6:.2f} us/row)")

    # --- 2. lane-parallel: same 2048*8=16384 rows as [C=2048, L=8, K] ---
    L = 8
    Xc = rng.normal(size=(R, L, K))
    yc = rng.normal(size=(R, L))
    for dt in (jnp.float32,):
        t = timeit(jax.jit(scan_lanes), jnp.asarray(Xc, dt), jnp.asarray(yc, dt))
        print(f"lanes L={L} K={K} depth={R} {dt.__name__}: {t*1e3:.1f} ms  ({t/R*1e6:.2f} us/step, {t/(R*L)*1e6:.2f} us/row)")

    # --- 3. grouped small-K: G=10000, K=5, depth 200 ---
    G, Ks, depth = 10000, 5, 200
    Xg = rng.normal(size=(depth, G, Ks))
    yg = rng.normal(size=(depth, G))
    for dt in (jnp.float64, jnp.float32):
        t = timeit(jax.jit(scan_grouped), jnp.asarray(Xg, dt), jnp.asarray(yg, dt))
        print(f"grouped [depth,G,K] G={G} K={Ks} depth={depth} {dt.__name__}: {t*1e3:.1f} ms ({t/depth*1e6:.1f} us/step)")
    Xgm = np.swapaxes(Xg, 1, 2).copy()  # [depth, K, G]
    ygm = yg
    for dt in (jnp.float64, jnp.float32):
        t = timeit(jax.jit(scan_grouped_minor), jnp.asarray(Xgm, dt), jnp.asarray(ygm, dt))
        print(f"grouped [depth,K,G] G={G} K={Ks} depth={depth} {dt.__name__}: {t*1e3:.1f} ms ({t/depth*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
