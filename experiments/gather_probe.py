"""Measure row-order materialization strategies on the TPU backend.

The headline grouped-OLS query computes block-ordered predictions; restoring
row order costs an [N]-element permutation gather (~44 ms of a ~93 ms
materialized query at N=8M). This probe times the candidate formulations:

  pair      : take(pairs [M,2] f32, idx, axis=0)        (round-2 default)
  two_f32   : two independent 1-D f32 takes (hi, lo)
  f64       : take(flat f64, idx)
  rowspace  : per-k gather from the tiny [G] beta table + K row-space fmas
              (no big-table gather at all: preds computed directly in row
              order from the cached row-order [N, K] feature stack)
  transposed: take(pairsT [2, M] f32, idx, axis=1)
  scatter   : scatter flat values to row order via the forward map

Run: JAX_PLATFORMS=axon python experiments/gather_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

N = 8_000_000
G = 10_000
K = 5
R_CAP = 1024

rng = np.random.default_rng(0)
gids_np = rng.integers(G, size=N)
# build a split-padded-like forward map: row i -> slot in flat
order = np.argsort(gids_np, kind="stable")
rank = np.empty(N, dtype=np.int64)
counts = np.bincount(gids_np, minlength=G)
first = np.zeros(G, dtype=np.int64)
np.cumsum(counts[:-1], out=first[1:])
rank[order] = np.arange(N) - first[gids_np[order]]
nblocks = np.maximum(1, -(-counts // R_CAP))
bfirst = np.zeros(G, dtype=np.int64)
np.cumsum(nblocks[:-1], out=bfirst[1:])
blk = bfirst[gids_np] + rank // R_CAP
slot = rank % R_CAP
idx_np = blk * R_CAP + slot  # [N] row -> flat position
S = int(nblocks.sum())
M = S * R_CAP

flat = jnp.asarray(rng.normal(size=M))
idx = jnp.asarray(idx_np, dtype=jnp.int32)
gids = jnp.asarray(gids_np, dtype=jnp.int32)
beta = jnp.asarray(rng.normal(size=(G, K)))
Xrow = jnp.asarray(rng.normal(size=(N, K)))
Xcols = [jnp.asarray(np.ascontiguousarray(np.asarray(Xrow)[:, k])) for k in range(K)]


def timeit(name, fn, reps=5):
    out = fn()
    np.asarray(out[:1])  # sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} {1e3 * float(np.median(ts)):8.2f} ms")
    return float(np.median(ts))


@jax.jit
def pair(flat, idx):
    hi = flat.astype(jnp.float32)
    lo = (flat - hi.astype(jnp.float64)).astype(jnp.float32)
    pairs = jnp.stack([hi, lo], axis=-1)
    out = jnp.take(pairs, idx, axis=0)
    return out[:, 0].astype(jnp.float64) + out[:, 1].astype(jnp.float64)


@jax.jit
def two_f32(flat, idx):
    hi = flat.astype(jnp.float32)
    lo = (flat - hi.astype(jnp.float64)).astype(jnp.float32)
    return jnp.take(hi, idx).astype(jnp.float64) + jnp.take(lo, idx).astype(
        jnp.float64
    )


@jax.jit
def f64(flat, idx):
    return jnp.take(flat, idx)


@jax.jit
def rowspace(beta, gids, *cols):
    acc = cols[0] * jnp.take(beta[:, 0], gids)
    for k in range(1, K):
        acc = acc + cols[k] * jnp.take(beta[:, k], gids)
    return acc


@jax.jit
def rowspace_f32table(beta, gids, *cols):
    acc = None
    for k in range(K):
        bk = beta[:, k]
        hi = bk.astype(jnp.float32)
        lo = (bk - hi.astype(jnp.float64)).astype(jnp.float32)
        bk64 = jnp.take(hi, gids).astype(jnp.float64) + jnp.take(lo, gids).astype(
            jnp.float64
        )
        term = cols[k] * bk64
        acc = term if acc is None else acc + term
    return acc


@jax.jit
def transposed(flat, idx):
    hi = flat.astype(jnp.float32)
    lo = (flat - hi.astype(jnp.float64)).astype(jnp.float32)
    pairsT = jnp.stack([hi, lo], axis=0)  # [2, M]
    out = jnp.take(pairsT, idx, axis=1)  # [2, N]
    return out[0].astype(jnp.float64) + out[1].astype(jnp.float64)


@jax.jit
def scatter(flat, idx):
    out = jnp.zeros(N, dtype=flat.dtype)
    return out.at[jnp.arange(N, dtype=jnp.int32)].set(jnp.take(flat, idx))


@jax.jit
def scatter_fwd(flat, idx):
    # scatter formulation: out[i] = flat[idx[i]]  ==  out.at[?]... true
    # scatter needs the inverse map; emulate with one scatter of flat by idx
    out = jnp.zeros(N, dtype=flat.dtype)
    return out.at[idx % N].add(0.0) + jnp.take(flat, idx)  # placeholder


def main():
    print(f"devices: {jax.devices()}  N={N} M={M} G={G}")
    timeit("pair", lambda: pair(flat, idx))
    timeit("two_f32", lambda: two_f32(flat, idx))
    timeit("f64", lambda: f64(flat, idx))
    timeit("rowspace", lambda: rowspace(beta, gids, *Xcols))
    timeit("rowspace32", lambda: rowspace_f32table(beta, gids, *Xcols))
    timeit("transposed", lambda: transposed(flat, idx))


if __name__ == "__main__":
    main()
