"""Pallas TPU kernel: fused digit-pair moments with in-VMEM recombination.

The XLA ozaki path (ops/ozaki.py) materializes the full digit-pair product
matrix P = Zcat^T Zcat [S, D*C, D*C] int32 in HBM (~180 MB at bench scale)
and recombines it in a second pass. This kernel keeps P in VMEM: each grid
step computes the int8 digit matmul for a batch of blocks ON-CHIP (bf16
MXU passes — digit magnitudes <= 64 make bf16 products and f32 int
accumulation EXACT), recombines the level sums immediately, and writes
only the compensated (hi, lo) f32 pair of the unscaled [C, C] moment —
~30x less HBM write traffic.

Every recombination term t_s = level_s * 128^-(s+2) is an exact f32 value
(level sums are integers < 2^24, scales are powers of two); the running
sum is kept as a TwoSum-compensated (hi, lo) f32 pair, preserving ~48+
significant bits. The caller reconstructs f64 as hi + lo and applies the
per-block-column scales.

Status: numerically verified (interpret mode, tests/test_ozaki.py) and
selectable via CONFIG.use_pallas_moments. On the current axon-tunneled
backend the Mosaic compiler rejects ANY gridded pallas_call (HTTP 500 from
the remote compile helper — including trivial elementwise kernels), so the
flag defaults off and the engine uses the XLA formulation of the same
algorithm (ops/ozaki.py), which already lowers the single concatenated
digit matmul onto the int8 MXU path. On backends with full Mosaic support
this kernel additionally avoids the [S, D*C, D*C] int32 HBM round-trip.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CONFIG
from .ozaki import N_DIGITS, PAIR_SUM, RADIX

F64 = jnp.float64


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (no FMA needed)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _moment_kernel(z_ref, hi_ref, lo_ref, *, C: int, TS: int):
    """One grid step: TS blocks' digit matmuls + level recombination."""
    for ts in range(TS):
        A = z_ref[ts].astype(jnp.bfloat16)  # [R, D*C]; ints <= 64 exact
        P = jax.lax.dot_general(
            A,
            A,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D*C, D*C] — integer-exact in f32 (partial sums < 2^24)
        hi = jnp.zeros((C, C), dtype=jnp.float32)
        lo = jnp.zeros((C, C), dtype=jnp.float32)
        for s in range(PAIR_SUM + 1):
            level = None
            for i in range(0, s // 2 + 1):
                j = s - i
                p = P[i * C : (i + 1) * C, j * C : (j + 1) * C]
                q = p if i == j else p + p.T  # P_ji = P_ij^T
                level = q if level is None else level + q
            term = level * jnp.float32(RADIX ** -(s + 2))  # exact f32
            hi, err = _two_sum(hi, term)
            lo = lo + err
        hi_ref[ts] = hi
        lo_ref[ts] = lo


def digit_pair_moments_pallas(Zcat: jnp.ndarray, block_batch: int = 8):
    """Unscaled recombined block moments from concatenated digit planes.

    Args:
        Zcat: [S, R, D*C] int8 (S must be padded to a block_batch multiple
            by the caller — the engine's S is always a power-of-two-friendly
            block count; we pad here defensively).
    Returns:
        (hi, lo): two [S, C, C] f32 arrays; block moment = hi + lo (f64),
        to be scaled by the per-block-column scale outer product.
    """
    S, R, DC = Zcat.shape
    C = DC // N_DIGITS
    TS = block_batch
    pad = (-S) % TS
    if pad:
        Zcat = jnp.pad(Zcat, ((0, pad), (0, 0), (0, 0)))
    Sp = S + pad
    kernel = partial(_moment_kernel, C=C, TS=TS)
    hi, lo = pl.pallas_call(
        kernel,
        grid=(Sp // TS,),
        in_specs=[
            pl.BlockSpec((TS, R, DC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((TS, C, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, C, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, C, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, C, C), jnp.float32),
        ),
        interpret=CONFIG.interpret_pallas,
    )(Zcat)
    return hi[:S], lo[:S]


@partial(jax.jit, static_argnames=("num_groups",))
def moments_from_digits_pallas(
    Zcat: jnp.ndarray,  # [S, R, D*C] int8
    m: jnp.ndarray,  # [S, C] f64 scales
    wp: jnp.ndarray,  # [S, R] bool
    block_group: jnp.ndarray,  # [S]
    num_groups: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ozaki.moments_from_digits using the fused
    Pallas kernel for the per-block pair products + recombination."""
    hi, lo = digit_pair_moments_pallas(Zcat)
    M = (hi.astype(F64) + lo.astype(F64)) * (m[:, :, None] * m[:, None, :])
    Mg = jax.ops.segment_sum(M, block_group, num_segments=num_groups)
    counts = jax.ops.segment_sum(
        wp.sum(axis=1).astype(F64), block_group, num_segments=num_groups
    )
    return Mg, counts
