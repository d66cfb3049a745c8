"""Measure row-broadcast strategies for grouped statistics (VERDICT r4 #4).

The deferred StatisticsSeries costs ~49 ms; materializing the full row view
cost 253 ms in round 4. The materialization is `_gather_fields`: 7 separate
takes ([G]->[N] x3 scalars, [G,K]->[N,K] x4 lists). Candidates:

  a) current: 7 takes in one program
  b) packed:  one [G, 3+4K] concat + ONE take -> [N, 3+4K] (slice-size 23)
  c) packed pair: b) but gathered as f32 (hi, lo) -> [N, 2*(3+4K)]

Run on the real chip: python experiments/stats_gather_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
F64, F32 = jnp.float64, jnp.float32

N, G, K = 2_000_000, 10_000, 5
C = 3 + 4 * K


def sync(x):
    np.asarray(x[:1])


def bench(fn, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return np.min(ts) * 1e3, float(np.median(ts)) * 1e3


@jax.jit
def seven_takes(scalars, lists, idx):
    outs = [jnp.take(s, idx, axis=0) for s in scalars]
    outs += [jnp.take(m, idx, axis=0) for m in lists]
    return outs[0]


@jax.jit
def packed_take(scalars, lists, idx):
    packed = jnp.concatenate([s[:, None] for s in scalars] + list(lists), axis=1)
    out = jnp.take(packed, idx, axis=0)
    return out[:, 0]


@jax.jit
def packed_pair_take(scalars, lists, idx):
    packed = jnp.concatenate([s[:, None] for s in scalars] + list(lists), axis=1)
    hi = packed.astype(F32)
    lo = (packed - hi.astype(F64)).astype(F32)
    pairs = jnp.concatenate([hi, lo], axis=1)
    out = jnp.take(pairs, idx, axis=0)
    full = out[:, :C].astype(F64) + out[:, C:].astype(F64)
    return full[:, 0]


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    scalars = tuple(jnp.asarray(rng.normal(size=G)) for _ in range(3))
    lists = tuple(jnp.asarray(rng.normal(size=(G, K))) for _ in range(4))
    idx = jnp.asarray(rng.integers(0, G, size=N), dtype=jnp.int32)

    for name, fn in [
        ("7 takes", seven_takes),
        ("packed [N,23] take", packed_take),
        ("packed pair f32 [N,46]", packed_pair_take),
    ]:
        mn, med = bench(lambda f=fn: sync(f(scalars, lists, idx)))
        print(f"{name:<26} min {mn:7.1f} ms  med {med:7.1f} ms")


if __name__ == "__main__":
    main()
