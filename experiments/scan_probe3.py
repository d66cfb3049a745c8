"""Probe 3: shave the refined-SM body (large-K moving models).

The f64 einsum matvecs in probe 2's body lower to the emulated-f64 MXU path;
reformulate them as elementwise-broadcast multiply + sum reductions (VPU,
near bandwidth for f64) and compare 1 vs 2 refinement passes. Also check
accuracy vs an exact per-row f64 oracle.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)

F64 = jnp.float64
F32 = jnp.float32


def sync(x):
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


def mv64(M, c):
    """[L,K,K] @ [L,K] -> [L,K] as elementwise+reduce (VPU path for f64)."""
    return (M * c[:, None, :]).sum(axis=-1)


def mv32(P, x):
    return (P * x[:, None, :]).sum(axis=-1)


def make_rls_refined(n_refine):
    def rls_refined(X64, y64, P0, M0, b0, c0):
        X32 = X64.astype(F32)

        def body(carry, xs):
            P, M, b, coef = carry
            x32, x64, y = xs
            Px = mv32(P, x32)
            r = 1.0 + (x32 * Px).sum(-1)
            k = Px / r[:, None]
            P = P - k[:, :, None] * k[:, None, :] * r[:, None, None]
            M = M + x64[:, :, None] * x64[:, None, :]
            b = b + x64 * y[:, None]
            c = coef
            for _ in range(n_refine):
                resid = b - mv64(M, c)
                c = c + mv32(P, resid.astype(F32)).astype(F64)
            return (P, M, b, c), c

        (_, _, _, _), coefs = lax.scan(body, (P0, M0, b0, c0), (X32, X64, y64))
        return coefs

    return rls_refined


def oracle(Xl, yl, M0l, b0l):
    C, K = Xl.shape
    M = M0l.copy()
    b = b0l.copy()
    out = np.zeros((C, K))
    for t in range(C):
        M += np.outer(Xl[t], Xl[t])
        b += Xl[t] * yl[t]
        out[t] = np.linalg.solve(M, b)
    return out


def main():
    rng = np.random.default_rng(0)
    C, L, K = 512, 20, 100
    X = rng.normal(size=(C, L, K))
    y = (X @ rng.normal(size=K)) + rng.normal(size=(C, L)) * 0.1

    # warm seeds: pretend each lane saw 600 prior rows (exact f64 seed state)
    M0 = np.zeros((L, K, K))
    b0 = np.zeros((L, K))
    c0 = np.zeros((L, K))
    P0 = np.zeros((L, K, K), dtype=np.float32)
    for l in range(L):
        Xw = rng.normal(size=(600, K))
        yw = Xw @ rng.normal(size=K) + rng.normal(size=600) * 0.1
        M0[l] = Xw.T @ Xw + 1e-3 * np.eye(K)
        b0[l] = Xw.T @ yw
        c0[l] = np.linalg.solve(M0[l], b0[l])
        P0[l] = np.linalg.inv(M0[l]).astype(np.float32)

    args = (
        jnp.asarray(X), jnp.asarray(y), jnp.asarray(P0),
        jnp.asarray(M0), jnp.asarray(b0), jnp.asarray(c0),
    )
    for n_refine in (1, 2):
        fn = jax.jit(make_rls_refined(n_refine))
        t, out = timeit(fn, *args)
        # accuracy vs exact per-row oracle on lane 3
        ora = oracle(X[:, 3], y[:, 3], M0[3], b0[3])
        err = np.max(np.abs(np.asarray(out[:, 3]) - ora) / (np.abs(ora) + 1e-12))
        print(
            f"refine={n_refine}: {t*1e3:.1f} ms ({t/C*1e6:.1f} us/step, "
            f"{t/(C*L)*1e6:.2f} us/row)  max relerr vs f64 oracle: {err:.2e}"
        )


if __name__ == "__main__":
    main()
