"""Round-4 probe: does the backend accept gridded Pallas (Mosaic) now?

Rounds 1-3: any pallas_call with a grid failed remote compilation
(HTTP 500), so ops/pallas_moments.py ships interpret-tested but gated
off. Re-check each round — if the backend accepts grids, the Pallas
moment/gather kernels can go live.

Run in its OWN process (a rejected compile can poison the client):
    python experiments/pallas_grid_probe.py
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def main():
    print(f"devices: {jax.devices()}", flush=True)
    x = jnp.arange(2048 * 256, dtype=jnp.float32).reshape(2048, 256)

    # 1. ungridded (known-good in earlier rounds)
    out = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(x[:256])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:256]) * 2.0)
    print("ungridded pallas: OK", flush=True)

    # 2. gridded
    out = pl.pallas_call(
        copy_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((256, 256), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((256, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((2048, 256), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("gridded pallas: OK", flush=True)


if __name__ == "__main__":
    main()
