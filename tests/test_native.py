"""Native C++ runtime helper tests (hash factorization).

The native library is the host-side analog of the reference's in-engine
group hashing (reference layer L3, SURVEY §1): an O(N) open-addressing
table replacing numpy's sort-based unique. Built automatically on first
use (engine/native.py); these tests skip if no compiler is available.
"""

import numpy as np
import pytest

from polars_ols_tpu.engine.groups import _factorize_numeric, factorize_columns
from polars_ols_tpu.engine.native import native_factorize
import polars_ols_tpu as pot


def _native_available() -> bool:
    return native_factorize(np.asarray([1, 2, 1], dtype=np.int64)) is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native library unavailable"
)


@pytest.mark.parametrize("n,g", [(1_000, 7), (100_000, 1_000), (50_000, 50_000)])
def test_native_matches_numpy_unique(n, g):
    rng = np.random.default_rng(0)
    keys = rng.integers(-g, g, size=n)
    expected = np.unique(keys, return_inverse=True)[1]
    got = native_factorize(keys)
    np.testing.assert_array_equal(got, expected)


def test_native_negative_and_extreme_keys():
    keys = np.asarray(
        [0, -1, 2**62, -(2**62), 0, -1, 7, 2**62], dtype=np.int64
    )
    expected = np.unique(keys, return_inverse=True)[1]
    np.testing.assert_array_equal(native_factorize(keys), expected)


def test_factorize_numeric_float_bitpattern():
    rng = np.random.default_rng(1)
    vals = np.round(rng.normal(size=10_000), 2)  # non-integral floats
    vals[vals == 0.0] = -0.0  # exercise -0.0 canonicalization
    expected = np.unique(vals, return_inverse=True)[1]
    np.testing.assert_array_equal(_factorize_numeric(vals), expected)


def test_factorize_columns_multi_key():
    rng = np.random.default_rng(2)
    a = pot.Series("a", rng.integers(5, size=1_000).astype(float))
    b = pot.Series("b", rng.integers(7, size=1_000).astype(float))
    gids = factorize_columns([a, b])
    combo = a.to_numpy() * 100 + b.to_numpy()
    expected = np.unique(combo, return_inverse=True)[1]
    # same partition (ids may be numbered differently only if orders differ;
    # both use sorted-unique order of (a, b) lexicographic == combo order)
    np.testing.assert_array_equal(gids, expected)


@pytest.mark.parametrize("n,g,r_cap", [(5_000, 13, 64), (40_000, 900, 512)])
def test_native_layout_build_matches_numpy(n, g, r_cap):
    """Counting-sort layout (counts/order/rank) and the one-pass blocked
    scatters must equal the numpy argsort-based construction exactly,
    including empty groups and a dominating heavy group."""
    import polars_ols_tpu.engine.native as native
    from polars_ols_tpu.engine import groups

    rng = np.random.default_rng(4)
    gids = np.concatenate(
        [rng.integers(g, size=n), np.full(3 * r_cap + 5, g // 2), [g - 1]]
    )
    rng.shuffle(gids)
    lay_nat = groups.build_layout(gids.copy(), len(gids))
    pad_nat = groups.padded_indices(lay_nat)
    split_nat = groups.split_padded_indices(lay_nat, r_cap)

    saved_build = native.native_layout_build
    saved_scatter = native.native_scatter_blocks
    native.native_layout_build = lambda *a, **k: None
    native.native_scatter_blocks = lambda *a, **k: None
    try:
        lay_np = groups.build_layout(gids.copy(), len(gids))
        pad_np = groups.padded_indices(lay_np)
        split_np = groups.split_padded_indices(lay_np, r_cap)
    finally:
        native.native_layout_build = saved_build
        native.native_scatter_blocks = saved_scatter

    assert lay_nat.num_groups == lay_np.num_groups
    np.testing.assert_array_equal(lay_nat.counts, lay_np.counts)
    np.testing.assert_array_equal(lay_nat.order, lay_np.order)
    np.testing.assert_array_equal(lay_nat.rank_in_group, lay_np.rank_in_group)
    for a, b in zip(pad_nat, pad_np):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(split_nat, split_np):
        np.testing.assert_array_equal(a, b)

    # the one-pass int32 unpad maps (inverse gathers) vs the numpy fallback
    R = pad_nat[2]
    unpad_nat = np.asarray(lay_nat.device_unpad(R))
    split_unpad_nat = np.asarray(lay_nat.device_split_unpad(r_cap))
    saved_unpad = native.native_unpad_map
    native.native_unpad_map = lambda *a, **k: None
    try:
        lay_ref = groups.build_layout(gids.copy(), len(gids))
        np.testing.assert_array_equal(
            unpad_nat, np.asarray(lay_ref.device_unpad(R))
        )
        np.testing.assert_array_equal(
            split_unpad_nat, np.asarray(lay_ref.device_split_unpad(r_cap))
        )
    finally:
        native.native_unpad_map = saved_unpad


def test_native_layout_build_out_of_range_falls_back():
    """A gid outside [0, num_groups) makes the native builder return None
    (numpy fallback) instead of writing out of bounds."""
    from polars_ols_tpu.engine.native import native_layout_build

    bad = np.asarray([0, 1, 5], dtype=np.int64)
    assert native_layout_build(bad, 3) is None
    assert native_layout_build(np.asarray([-1, 0], dtype=np.int64), 2) is None
