"""Probe 4: explicit qr/svd path costs.

A. batched tiny SVD custom call [10k,5,5] f64 and single [100,100] f64.
B. lane-major Householder reduction (G minor) at the grouped shape vs the
   current [G,R,K] layout.
C. row-major unrolled Householder at K=100 single group (K is minor ~ lanes).
D. lane-major one-sided Jacobi SVD of [K,K,G] at K=5, G=10k.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

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


def householder_lanes(X, Y):
    """X [R, K, G], Y [R, M, G] -> (R [K,K,G], QtY [K,M,G])."""
    Rn, K, G = X.shape
    rows = jnp.arange(Rn)
    A, B = X, Y
    for j in range(K):
        mask = (rows >= j).astype(F64)[:, None]  # [R,1]
        colf = A[:, j, :] * mask  # [R, G]
        sigma = (colf * colf).sum(axis=0)  # [G]
        cj = A[j, j, :]
        s = jnp.where(cj >= 0, 1.0, -1.0)
        alpha = -s * jnp.sqrt(sigma)
        v = jnp.where((rows == j)[:, None], colf - alpha[None, :], colf)  # [R,G]
        denom = sigma - cj * alpha
        beta = jnp.where(denom > 0, 1.0 / denom, 0.0)  # [G]
        vtA = (v[:, None, :] * A).sum(axis=0)  # [K, G]
        A = A - (beta[None, :] * v)[:, None, :] * vtA[None, :, :]
        vtB = (v[:, None, :] * B).sum(axis=0)  # [M, G]
        B = B - (beta[None, :] * v)[:, None, :] * vtB[None, :, :]
    return A[:K], B[:K]


def householder_rowmajor(X, Y, K):
    """Current-style reduce on [G, R, K] for comparison (from ops/linalg)."""
    rows = jnp.arange(X.shape[-2])
    A, B = X, Y
    for j in range(K):
        mask = (rows >= j).astype(X.dtype)
        col = A[..., :, j] * mask
        sigma = jnp.sum(col * col, axis=-1, keepdims=True)
        cj = A[..., j, j][..., None]
        s = jnp.where(cj >= 0, 1.0, -1.0)
        alpha = -s * jnp.sqrt(sigma)
        v = jnp.where(rows == j, col - alpha, col)
        denom = sigma - cj * alpha
        beta = jnp.where(denom > 0, 1.0 / denom, 0.0)
        bv = beta[..., None] * v[..., :, None]
        vtA = jnp.einsum("...r,...rk->...k", v, A)
        A = A - bv * vtA[..., None, :]
        vtB = jnp.einsum("...r,...rm->...m", v, B)
        B = B - bv * vtB[..., None, :]
    return A[..., :K, :], B[..., :K, :]


def jacobi_svd_lanes(W, n_sweeps=8):
    """One-sided Jacobi on W [K, K, G] (columns): returns (U [K,K,G],
    sigma [K,G], V [K,K,G]) with W = U diag(sigma) V^T."""
    K, _, G = W.shape
    V = jnp.eye(K, dtype=F64)[:, :, None] * jnp.ones((1, 1, G), F64)
    for _ in range(n_sweeps):
        for p in range(K - 1):
            for q in range(p + 1, K):
                wp = W[:, p, :]
                wq = W[:, q, :]
                app = (wp * wp).sum(0)
                aqq = (wq * wq).sum(0)
                apq = (wp * wq).sum(0)
                # Jacobi rotation zeroing the off-diagonal of the 2x2 Gram
                tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(apq == 0, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = c * t
                Wp = c * wp - s * wq
                Wq = s * wp + c * wq
                W = W.at[:, p, :].set(Wp).at[:, q, :].set(Wq)
                vp = V[:, p, :]
                vq = V[:, q, :]
                V = V.at[:, p, :].set(c * vp - s * vq).at[:, q, :].set(s * vp + c * vq)
    sigma = jnp.sqrt((W * W).sum(0))  # [K, G]
    U = W / jnp.where(sigma == 0, 1.0, sigma)[None, :, :]
    return U, sigma, V


def main():
    rng = np.random.default_rng(0)

    # A. batched tiny SVD custom calls
    A5 = jnp.asarray(rng.normal(size=(10_000, 5, 5)))
    t, _ = timeit(jax.jit(lambda a: jnp.linalg.svd(a, full_matrices=False)), A5)
    print(f"A svd [10k,5,5] f64: {t*1e3:.1f} ms")
    A100 = jnp.asarray(rng.normal(size=(1, 100, 100)))
    t, _ = timeit(jax.jit(lambda a: jnp.linalg.svd(a, full_matrices=False)), A100)
    print(f"A svd [1,100,100] f64: {t*1e3:.1f} ms")

    # B. Householder reduce at grouped shape
    G, R, K = 10_000, 232, 5
    Xg = jnp.asarray(rng.normal(size=(G, R, K)))
    Yg = jnp.asarray(rng.normal(size=(G, R, 1)))
    t, _ = timeit(jax.jit(lambda x, y: householder_rowmajor(x, y, K)), Xg, Yg)
    print(f"B householder row-major [G,R,K]={G},{R},{K}: {t*1e3:.1f} ms")
    Xl = jnp.asarray(np.asarray(Xg).transpose(1, 2, 0))
    Yl = jnp.asarray(np.asarray(Yg).transpose(1, 2, 0))
    t, (Rl, QtYl) = timeit(jax.jit(householder_lanes), Xl, Yl)
    print(f"B householder lane-major [R,K,G]: {t*1e3:.1f} ms")
    # correctness: R'R == X'X for group 7
    Rm = np.asarray(Rl[:, :, 7])
    Xm = np.asarray(Xg[7])
    err = np.abs(Rm.T @ Rm - Xm.T @ Xm).max() / np.abs(Xm.T @ Xm).max()
    print(f"   R'R vs X'X relerr: {err:.2e}")

    # C. row-major unrolled Householder at K=100 single group
    X1 = jnp.asarray(rng.normal(size=(1, 10_000, 100)))
    Y1 = jnp.asarray(rng.normal(size=(1, 10_000, 1)))
    t, _ = timeit(jax.jit(lambda x, y: householder_rowmajor(x, y, 100)), X1, Y1)
    print(f"C householder row-major [1,10k,100]: {t*1e3:.1f} ms")

    # D. lane Jacobi SVD at [5,5,10k]
    W = jnp.asarray(np.asarray(Rl))
    t, (U, sig, V) = timeit(jax.jit(jacobi_svd_lanes), W)
    print(f"D jacobi svd lanes [5,5,10k]: {t*1e3:.1f} ms")
    s_ref = np.linalg.svd(np.asarray(W[:, :, 7]).copy(), compute_uv=False)
    s_got = np.sort(np.asarray(sig[:, 7]))[::-1]
    print(f"   sigma relerr vs lapack: {np.abs(np.sort(s_ref) - np.sort(np.asarray(sig[:,7]))).max()/s_ref.max():.2e}")


if __name__ == "__main__":
    main()
