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
