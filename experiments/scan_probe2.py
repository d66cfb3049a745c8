"""Probe 2: validate the two moving-model kernel designs end-to-end shapes.

A. Small-K grouped (K=5, G=10k, R=300): lane-major chunked moments + unrolled
   lane Cholesky solve (f64, exact). Target: <100 ms for the whole path.
B. Large-K (K=100): lane-parallel scan with f32 P-state (Sherman-Morrison),
   f64 moment accumulation, one refinement step per row for the coefficient.
   L=20 lanes, depth 512 (= 10k rows re-anchored in chunks of 512).
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


# --------------------------------------------------------------------------- #
# A. small-K lane-major chunked rolling-style kernel
# --------------------------------------------------------------------------- #
def chol_solve_lanes(W, b, K):
    """W: [C, K, K, G] as nested index access; b: [C, K, G]. Unrolled K."""
    a = [[W[:, i, j, :] for j in range(i + 1)] for i in range(K)]
    L = [[None] * (i + 1) for i in range(K)]
    inv_d = [None] * K
    for j in range(K):
        s = a[j][j]
        for m in range(j):
            s = s - L[j][m] * L[j][m]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, K):
            s = a[i][j]
            for m in range(j):
                s = s - L[i][m] * L[j][m]
            L[i][j] = s * inv_d[j]
    bb = [b[:, i, :] for i in range(K)]
    z = [None] * K
    for i in range(K):
        s = bb[i]
        for m in range(i):
            s = s - L[i][m] * z[m]
        z[i] = s * inv_d[i]
    x = [None] * K
    for i in range(K - 1, -1, -1):
        s = z[i]
        for m in range(i + 1, K):
            s = s - L[m][i] * x[m]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=1)  # [C, K, G]


def rolling_lane_major(X, y, C=32, alpha=1e-9):
    """X: [R, K, G], y: [R, G]; expanding-window (no subtract) for probe."""
    R, K, G = X.shape
    n_chunks = R // C

    def body(carry, idx):
        W_c, b_c = carry
        Xa = lax.dynamic_slice_in_dim(X, idx * C, C)  # [C, K, G]
        ya = lax.dynamic_slice_in_dim(y, idx * C, C)  # [C, G]
        dU = Xa[:, :, None, :] * Xa[:, None, :, :]  # [C, K, K, G]
        du = Xa * ya[:, None, :]  # [C, K, G]
        W = W_c + jnp.cumsum(dU, axis=0)
        b = b_c + jnp.cumsum(du, axis=0)
        Wr = W + alpha * jnp.eye(K, dtype=F64)[None, :, :, None]
        coef = chol_solve_lanes(Wr, b, K)
        return (W[-1], b[-1]), coef

    carry0 = (jnp.zeros((K, K, G), F64), jnp.zeros((K, G), F64))
    _, coefs = lax.scan(body, carry0, jnp.arange(n_chunks))
    return coefs.reshape(R, K, G)


# --------------------------------------------------------------------------- #
# B. large-K f32-P + f64-M refined SM scan
# --------------------------------------------------------------------------- #
def rls_refined_lanes(X64, y64):
    """X64: [C, L, K] f64. P-state f32 SM; M,b f64; coef refined once."""
    C, L, K = X64.shape
    X32 = X64.astype(F32)

    def body(carry, xs):
        P, M, b, coef = carry
        x32, x64, y = xs  # [L,K] f32, [L,K] f64, [L] f64
        Px = jnp.einsum("lij,lj->li", P, x32)
        r = 1.0 + jnp.einsum("li,li->l", x32, Px)
        k = Px / r[:, None]
        P = P - k[:, :, None] * k[:, None, :] * r[:, None, None]
        M = M + x64[:, :, None] * x64[:, None, :]
        b = b + x64 * y[:, None]
        # refined coefficient: c = c_prev; two Newton-ish passes with f32 P
        c = coef
        for _ in range(2):
            resid = b - jnp.einsum("lij,lj->li", M, c)
            c = c + jnp.einsum("lij,lj->li", P, resid.astype(F32)).astype(F64)
        return (P, M, b, c), c

    P0 = jnp.broadcast_to(jnp.eye(K, dtype=F32) * 10.0, (L, K, K))
    M0 = jnp.broadcast_to(jnp.eye(K, dtype=F64) * 0.1, (L, K, K))
    carry0 = (P0, M0, jnp.zeros((L, K), F64), jnp.zeros((L, K), F64))
    (_, _, _, _), coefs = lax.scan(body, carry0, (X32, X64, y64))
    return coefs


def main():
    rng = np.random.default_rng(0)

    # A: grouped small-K
    R, K, G = 320, 5, 10000
    X = jnp.asarray(rng.normal(size=(R, K, G)))
    y = jnp.asarray(rng.normal(size=(R, G)))
    fn = jax.jit(rolling_lane_major)
    t, out = timeit(fn, X, y)
    print(f"A small-K lane-major grouped: R={R} K={K} G={G} f64: {t*1e3:.1f} ms")
    # correctness spot check at row 100, lane 7
    tt, g = 100, 7
    Xs = np.asarray(X[: tt + 1, :, g])
    ys = np.asarray(y[: tt + 1, g])
    beta = np.linalg.solve(Xs.T @ Xs + 1e-9 * np.eye(K), Xs.T @ ys)
    got = np.asarray(out[tt, :, g])
    print("   max err vs direct solve:", np.abs(got - beta).max())

    # B: large-K refined SM
    C, L, Kb = 512, 20, 100
    Xb = rng.normal(size=(C, L, Kb))
    yb = rng.normal(size=(C, L))
    fnb = jax.jit(rls_refined_lanes)
    t, _ = timeit(fnb, jnp.asarray(Xb), jnp.asarray(yb))
    rows = C * L
    print(f"B refined-SM lanes: C={C} L={L} K={Kb}: {t*1e3:.1f} ms ({t/C*1e6:.1f} us/step, {t/rows*1e6:.2f} us/row)")


if __name__ == "__main__":
    main()
