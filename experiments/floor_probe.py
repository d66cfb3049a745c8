"""Measure the tunnel dispatch floor and whether independent dispatches
pipeline (VERDICT r4 task 1a).

Questions:
1. floor = wall time of ONE trivial program round trip (dispatch + tiny fetch)
2. do M independent dispatches overlap?  time(M dispatches, then M tiny
   fetches) vs M * floor
3. same for a realistic 10k x 100 moments+cholesky fit kernel
4. one batched program solving M problems at once vs M separate dispatches

Run ON THE REAL CHIP: python experiments/floor_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

F64 = jnp.float64
jax.config.update("jax_enable_x64", True)


def sync(x):
    np.asarray(x[:1])


def bench(fn, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.sort(ts)
    return ts[0] * 1e3, float(np.median(ts)) * 1e3


@jax.jit
def trivial(x):
    return x + 1.0


def fit_kernel(X, y, alpha):
    XtX = X.T @ X + alpha * jnp.eye(X.shape[1], dtype=F64)
    Xty = X.T @ y
    L = jnp.linalg.cholesky(XtX)
    beta = jax.scipy.linalg.cho_solve((L, True), Xty)
    return X @ beta


fit_j = jax.jit(fit_kernel)


def fit_batched(Xs, ys, alpha):
    # [M, N, K] batched: one program, M problems
    XtX = jnp.einsum("mnk,mnl->mkl", Xs, Xs) + alpha * jnp.eye(Xs.shape[2], dtype=F64)
    Xty = jnp.einsum("mnk,mn->mk", Xs, ys)
    L = jnp.linalg.cholesky(XtX)
    beta = jax.scipy.linalg.cho_solve((L, True), Xty[..., None])[..., 0]
    return jnp.einsum("mnk,mk->mn", Xs, beta)


fitb_j = jax.jit(fit_batched)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((8,), dtype=F64)
    sync(trivial(x0))

    mn, med = bench(lambda: sync(trivial(x0)))
    print(f"floor (1 trivial dispatch+fetch): min {mn:.2f} ms  med {med:.2f} ms")

    for M in (2, 4, 8, 16):
        xs = [jnp.asarray(rng.normal(size=8)) for _ in range(M)]

        def many():
            outs = [trivial(x) for x in xs]
            for o in outs:
                sync(o)

        mn, med = bench(many)
        print(f"{M:>2} trivial dispatches, sync at end: min {mn:.2f} ms  med {med:.2f} ms"
              f"  ({mn / M:.2f} ms/query)")

    # realistic single-frame fit: 10k x 100
    N, K = 10_000, 100
    Xs = [jnp.asarray(rng.normal(size=(N, K))) for _ in range(8)]
    ys = [jnp.asarray(rng.normal(size=N)) for _ in range(8)]
    sync(fit_j(Xs[0], ys[0], 0.1))
    mn, med = bench(lambda: sync(fit_j(Xs[0], ys[0], 0.1)))
    print(f"fit 10k x 100 single: min {mn:.2f} ms  med {med:.2f} ms")

    for M in (2, 4, 8):
        def many_fit(M=M):
            outs = [fit_j(Xs[i], ys[i], 0.1) for i in range(M)]
            for o in outs:
                sync(o)

        mn, med = bench(many_fit)
        print(f"{M} fit dispatches, sync at end: min {mn:.2f} ms  med {med:.2f} ms"
              f"  ({mn / M:.2f} ms/query)")

    for M in (2, 4, 8):
        Xb = jnp.stack(Xs[:M])
        yb = jnp.stack(ys[:M])
        sync(fitb_j(Xb, yb, 0.1)[0])
        mn, med = bench(lambda: sync(fitb_j(Xb, yb, 0.1)[0]))
        print(f"{M}-problem batched ONE program: min {mn:.2f} ms  med {med:.2f} ms"
              f"  ({mn / M:.2f} ms/query)")


if __name__ == "__main__":
    main()
