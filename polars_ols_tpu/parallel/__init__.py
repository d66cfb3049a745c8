"""Multi-chip distribution for the grouped least-squares engine.

See `sharded` for the mesh/collective design: data-parallel partial-moment
accumulation with ``psum_scatter`` merges (exact for groups spanning
shards), shard-local covariance-form CD and statistics, and group-parallel
batched solves for whole-group solvers (scans, SVD).
"""

from .sharded import (
    fit_moments_sharded,
    make_mesh,
    mesh_row_axes,
    shard_group_axis,
    shuffle_rows_to_groups,
    solve_groups_sharded,
    statistics_moments_sharded,
)

__all__ = [
    "fit_moments_sharded",
    "make_mesh",
    "mesh_row_axes",
    "shard_group_axis",
    "shuffle_rows_to_groups",
    "solve_groups_sharded",
    "statistics_moments_sharded",
]
