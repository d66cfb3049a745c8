"""Deferred row-order permutation of grouped prediction outputs
(series.BlockPermuted): correctness vs the eager path, point/slice access
without full materialization, and transparent materialization for
downstream consumers."""

import numpy as np
import pytest

import polars_ols_tpu as pot
from polars_ols_tpu import col
from polars_ols_tpu.config import CONFIG


@pytest.fixture
def gdf():
    rng = np.random.default_rng(21)
    n = 5_000
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = 2.0 * x1 - 1.0 * x2 + rng.normal(size=n) * 0.1
    g = rng.integers(50, size=n).astype(float)
    return pot.DataFrame({"y": y, "x1": x1, "x2": x2, "g": g})


def _run(df, lazy: bool):
    CONFIG.lazy_row_order = lazy
    try:
        return df.select(
            col("y").least_squares.ols(col("x1"), col("x2")).over("g")
        )["y"]
    finally:
        CONFIG.lazy_row_order = True


def test_lazy_matches_eager(gdf):
    eager = _run(gdf, lazy=False)
    lazy = _run(gdf, lazy=True)
    assert lazy.is_lazy and not eager.is_lazy
    np.testing.assert_allclose(
        lazy.to_numpy(), eager.to_numpy(), rtol=1e-12, atol=1e-12
    )
    assert not lazy.is_lazy  # materialized (and cached) by the full access


def test_lazy_point_access_before_materialization(gdf):
    lazy = _run(gdf, lazy=True)
    eager = _run(gdf, lazy=False).to_numpy()
    tail = lazy.tail(4).to_numpy()
    head = lazy.head(3).to_numpy()
    assert lazy.is_lazy  # point access must not materialize the column
    np.testing.assert_allclose(tail, eager[-4:], rtol=1e-12)
    np.testing.assert_allclose(head, eager[:3], rtol=1e-12)
    np.testing.assert_allclose(
        lazy[10:20].to_numpy(), eager[10:20], rtol=1e-12
    )
    assert lazy.is_lazy


def test_lazy_residuals_transparent(gdf):
    """residuals = target - predictions goes through Series arithmetic,
    which must transparently materialize the lazy operand."""
    out = gdf.select(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="residuals").over("g")
    )["y"].to_numpy()
    eager_preds = _run(gdf, lazy=False).to_numpy()
    np.testing.assert_allclose(
        out, gdf["y"].to_numpy() - eager_preds, rtol=1e-10, atol=1e-12
    )


def test_row_epilogue_matches_block_unpad(gdf):
    """The row-space materialized epilogue (predictions straight from the
    cached row stack, CONFIG.row_epilogue) must agree with the block-unpad
    path bit-for-bit at f64 tolerances, including under WLS scaling."""
    rng = np.random.default_rng(3)
    df = gdf.with_columns((col("x1") * 0.0 + 1.0).alias("w0"))
    w = rng.random(len(gdf["y"].to_numpy())) + 0.1
    df = pot.DataFrame(
        {**{c: gdf[c].to_numpy() for c in gdf.columns}, "w": w}
    )
    outs = {}
    CONFIG.lazy_row_order = False
    try:
        for flag in (False, True):
            CONFIG.row_epilogue = flag
            pot.clear_caches()
            outs[flag] = {
                "ols": df.select(
                    col("y").least_squares.ols(col("x1"), col("x2")).over("g")
                )["y"].to_numpy(),
                "wls": df.select(
                    col("y").least_squares.wls(
                        col("x1"), col("x2"), sample_weights=col("w")
                    ).over("g")
                )["y"].to_numpy(),
            }
    finally:
        CONFIG.row_epilogue = False
        CONFIG.lazy_row_order = True
    for key in outs[False]:
        np.testing.assert_allclose(
            outs[False][key], outs[True][key], rtol=1e-12, atol=1e-13,
            err_msg=key,
        )


def test_statistics_broadcast_is_deferred(gdf):
    """.over() statistics keep [G]-level base arrays with a deferred row
    index; gathers compose without materialising, and a tail gather
    touches O(n_tail) elements, not O(N)."""
    out = gdf.select(
        col("y").least_squares.ols(col("x1"), col("x2"), mode="statistics")
        .over("g").alias("s")
    )["s"]
    assert len(out) == len(gdf["y"].to_numpy())
    assert out._row_index is not None
    assert out._base["r2"].shape[0] == 50  # group-level, not row-level
    # composed gather stays deferred and lands on the right groups
    tail = out.gather(np.arange(len(out) - 3, len(out)))
    assert tail._base is out._base
    g = gdf["g"].to_numpy()[-3:]
    eager = {k: np.asarray(v) for k, v in out.arrays.items()}  # materialise
    for i, gi in enumerate(g.astype(int)):
        assert np.asarray(tail.arrays["r2"])[i] == np.asarray(out._base["r2"])[gi]
        assert eager["r2"][len(out) - 3 + i] == np.asarray(out._base["r2"])[gi]
