"""Global configuration for the TPU least-squares engine.

The reference implementation (azmyrajab/polars_ols) computes everything in
f64 on the host CPU (src/expressions.rs:22-63 casts every series to Float64).
On TPU, f64 is software-emulated but fully supported by XLA for the batched
factorizations we rely on; empirically on this backend f64 matmul sustains
>10 Tflop/s, which is far above the reference's per-core LAPACK throughput.
We therefore default to f64 for solver math (exact parity with
numpy.linalg.lstsq) and allow opting into f32 for throughput-bound paths.
"""

from __future__ import annotations

import os

# x64 must be enabled before any jax array is created.
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


class Config:
    """Runtime configuration knobs.

    Attributes:
        solve_dtype: dtype used for moment accumulation and factorizations.
        moment_chunk_rows: row-block size used by streaming/rolling moment
            kernels (bounds peak memory at chunk_rows * K^2 * 8 bytes).
        dense_group_pad_waste: maximum tolerated padding blow-up before the
            grouped engine switches from the padded batched-matmul layout to
            the chunked segment-sum layout.
    """

    def __init__(self) -> None:
        self.solve_dtype = jnp.float64
        self.moment_chunk_rows = int(os.environ.get("POLS_TPU_CHUNK_ROWS", 512))
        self.dense_group_pad_waste = float(
            os.environ.get("POLS_TPU_PAD_WASTE", 4.0)
        )
        self.interpret_pallas = bool(int(os.environ.get("POLS_TPU_INTERPRET", "0")))
        # overrides for the lazy accelerator-only defaults below
        self._use_ozaki = _env_flag("POLS_TPU_OZAKI")
        self._pair_gather = _env_flag("POLS_TPU_PAIR_GATHER")
        self._moving_lanes = _env_flag("POLS_TPU_MOVING_LANES")
        # fused Pallas digit-moment kernel (ops/pallas_moments.py). Off by
        # default: the current axon backend rejects gridded Mosaic kernels;
        # enable on full-Mosaic TPU backends with POLS_TPU_PALLAS=1.
        self.use_pallas_moments = bool(int(os.environ.get("POLS_TPU_PALLAS", "0")))
        # defer the row-order unpad permutation of grouped predictions: the
        # output Series carries (block values, index map) and materialises
        # row order on first full-column access (~5 ns/element gather —
        # 44 ms at 8M rows — that reductions/slices never need)
        self.lazy_row_order = bool(int(os.environ.get("POLS_TPU_LAZY", "1")))
        # materialized grouped predictions: compute row-order output
        # directly from the cached [N, 1+K] row stack (K tiny-table beta
        # gathers + K fmas, exact f64) instead of permuting the block-layout
        # output with an [N] gather. Off until measured faster on the
        # target backend (experiments/gather_probe.py "rowspace" variant).
        self.row_epilogue = bool(int(os.environ.get("POLS_TPU_ROW_EPILOGUE", "0")))
        # fuse a multi-expression select()'s independent fit queries into
        # ONE device program (engine/batch.py): the tunnel dispatch floor
        # (~25 ms) does not pipeline, so M eager queries cost M x floor
        # while one fused program costs floor + M x exec
        self.fused_select = bool(int(os.environ.get("POLS_TPU_FUSED_SELECT", "1")))
        # route grouped fits through the mesh-sharded engine
        # (parallel/sharded.py): rows stay in place, partial moments
        # psum_scatter-merge across shards; moving models shard the group
        # batch axis. Defaults ON when >1 device is visible.
        self._auto_shard = _env_flag("POLS_TPU_AUTO_SHARD")

    @property
    def use_ozaki(self) -> bool:
        """int8 digit-matmul moments (ops/ozaki.py): exact to ~2^-58, runs
        on the int8 MXU path instead of emulated f64 matmul. Default: on
        for accelerator backends, off on CPU (native f64 is already fast).
        Override with POLS_TPU_OZAKI=0/1 or CONFIG.use_ozaki = True."""
        if self._use_ozaki is None:
            self._use_ozaki = jax.default_backend() != "cpu"
        return self._use_ozaki

    @use_ozaki.setter
    def use_ozaki(self, v) -> None:
        self._use_ozaki = bool(v)

    @property
    def pair_gather(self) -> bool:
        """Gather f64 row data as f32 (hi, lo) pairs — same bytes, ~2x
        faster gathers on TPU; reconstruction exact to 2^-48 (output-only
        path). Override with POLS_TPU_PAIR_GATHER=0/1."""
        if self._pair_gather is None:
            self._pair_gather = jax.default_backend() != "cpu"
        return self._pair_gather

    @pair_gather.setter
    def pair_gather(self, v) -> None:
        self._pair_gather = bool(v)

    @property
    def moving_lanes(self) -> bool:
        """Lane-major moving-window kernels (ops/moving.py): the group/chunk
        batch axis is laid out minor-most so scan bodies fill the VPU's
        128-wide lanes (measured 16-50x faster on TPU). Default: on for
        accelerator backends, off on CPU (the classic kernels are exact and
        fast there). Override with POLS_TPU_MOVING_LANES=0/1."""
        if self._moving_lanes is None:
            self._moving_lanes = jax.default_backend() != "cpu"
        return self._moving_lanes

    @moving_lanes.setter
    def moving_lanes(self, v) -> None:
        self._moving_lanes = bool(v)

    @property
    def auto_shard(self) -> bool:
        """Distribute grouped queries across all visible devices. On by
        default with >1 accelerator device; off on CPU meshes (every query
        shape would pay an 8-way SPMD recompile — the sharded paths are
        exercised there explicitly by tests/test_autoshard.py). Override
        with POLS_TPU_AUTO_SHARD=0/1."""
        if self._auto_shard is None:
            self._auto_shard = (
                jax.device_count() > 1 and jax.default_backend() != "cpu"
            )
        return self._auto_shard

    @auto_shard.setter
    def auto_shard(self, v) -> None:
        self._auto_shard = bool(v)


def _env_flag(name: str):
    env = os.environ.get(name)
    return None if env is None else bool(int(env))


CONFIG = Config()

# Default epsilon used when filling null sample weights, mirroring the
# reference's `_EPSILON` (polars_ols/least_squares.py:63).
EPSILON: float = 1.0e-12
