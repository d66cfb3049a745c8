"""Round-4 probe: what does a TPU gather actually cost — per row or per byte?

Round 3 measured the headline's row-order materialization at ~49 ms for an
8M-element permutation (pair-gather of [M, 2] f32 rows). Before optimizing
further we need the cost model. Variants:

  elem_f32     : 1-D random element gather (32 MB moved)
  iota/rev     : same op with sequential indices — locality limit
  wide8/32/128 : take([M/w, w] f32) — same bytes, w-times fewer gather rows.
                 If cost is per ROW, wide rows amortize it and a layout
                 permuting tiles instead of elements would win ~8-32x.
  window       : take_along_axis within [A, B] rows — does VMEM-sized
                 locality help?
  sortkv       : the permutation as a key-value sort.
  copy         : x * 1.0 — pure bandwidth baseline for the same bytes.

Protocol: the tunnel has a ~25-30 ms per-dispatch floor, so timing one op
per sync only measures the floor. Each variant therefore runs BATCH
back-to-back invocations (chained through a dependency so XLA cannot CSE
them away: each call gathers the previous output xor-shifted) with ONE
tail sync, min-of-5 batches.

Run (own process): python experiments/gather_probe2.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

N = 8_000_000
BATCH = 8
REPS = 5


def timeit(name, fn, per_bytes):
    try:
        out = fn()
        np.asarray(jax.tree.leaves(out)[0][:1])  # compile + sync
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(BATCH)]
            np.asarray(jax.tree.leaves(outs[-1])[0][:1])
            ts.append((time.perf_counter() - t0) / BATCH)
        ms = 1e3 * float(np.min(ts))
        gbps = per_bytes / (ms * 1e-3) / 1e9
        print(f"{name:12s} {ms:8.2f} ms   {gbps:7.2f} GB/s(moved)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED: {str(e)[:200]}", flush=True)


def main():
    print(f"devices: {jax.devices()}  N={N}  batch={BATCH}", flush=True)
    rng = np.random.default_rng(0)
    flat32 = jnp.asarray(rng.normal(size=N).astype(np.float32))

    perm = rng.permutation(N).astype(np.int32)
    idx = jnp.asarray(perm)

    jcopy = jax.jit(lambda x: x * 1.0)
    jtake = jax.jit(lambda x, i: jnp.take(x, i))
    jtake0 = jax.jit(lambda m, r: jnp.take(m, r, axis=0))
    jtaa = jax.jit(lambda m, w: jnp.take_along_axis(m, w, axis=1))
    jsort = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)[1])

    timeit("copy", lambda: jcopy(flat32), 4 * N)
    timeit("elem_f32", lambda: jtake(flat32, idx), 4 * N)

    idx_iota = jnp.asarray(np.arange(N, dtype=np.int32))
    idx_rev = jnp.asarray(np.arange(N - 1, -1, -1, dtype=np.int32))
    timeit("iota_gather", lambda: jtake(flat32, idx_iota), 4 * N)
    timeit("rev_gather", lambda: jtake(flat32, idx_rev), 4 * N)

    for w in (8, 32, 128):
        rows = N // w
        mat = flat32.reshape(rows, w)
        ridx = jnp.asarray(rng.permutation(rows).astype(np.int32))
        timeit(f"wide{w}", lambda m=mat, r=ridx: jtake0(m, r), 4 * N)

    for b in (512, 4096):
        a = N // b
        n_fit = a * b
        mat = flat32[:n_fit].reshape(a, b)
        widx = jnp.asarray(
            np.argsort(rng.random((a, b)), axis=1).astype(np.int32)
        )
        timeit(f"window{b}", lambda m=mat, w=widx: jtaa(m, w), 4 * n_fit)

    inv = np.empty(N, dtype=np.int32)
    inv[perm] = np.arange(N, dtype=np.int32)
    keys = jnp.asarray(inv)
    timeit("sortkv", lambda: jsort(keys, flat32), 8 * N)


if __name__ == "__main__":
    main()
