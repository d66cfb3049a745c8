"""ctypes bindings to the native C++ runtime helpers (engine/native/).

The reference keeps its hot host-side machinery (group hashing, series ->
ndarray conversion) in native Rust inside polars itself; our equivalent is a
small C++ shared library providing O(N) open-addressing hash factorization
of group keys — the host-side step that precedes every grouped solve. The
TPU compute path itself is pure XLA and needs no native code.

Falls back to numpy transparently when the library has not been built
(``make -C polars_ols_tpu/engine/native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(os.path.dirname(__file__), "native")
    path = os.path.join(native_dir, "libpols_native.so")
    if not os.path.exists(path):
        # build once, best-effort (g++ is part of the supported toolchain)
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", native_dir],
                capture_output=True,
                timeout=120,
                check=False,
            )
        except (OSError, subprocess.TimeoutExpired):
            pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pols_factorize_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pols_factorize_i64.restype = ctypes.c_int64
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_factorize(
    keys: np.ndarray, sort_keys: Optional[np.ndarray] = None
) -> Optional[np.ndarray]:
    """Dense-factorize int64 keys into group ids in first-seen order.

    Returns None when the native library is unavailable (caller falls back
    to numpy). First-seen order is remapped to sorted-unique order to match
    numpy.unique semantics; ``sort_keys`` supplies the value used for that
    ordering when ``keys`` are raw bit patterns (e.g. of floats).
    """
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    out = np.empty(len(keys), dtype=np.int64)
    n_groups = lib.pols_factorize_i64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(keys),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_groups < 0:
        return None
    # remap first-seen ids -> ids sorted by key value (numpy.unique order)
    order_vals = keys if sort_keys is None else sort_keys
    first_pos = np.full(n_groups, len(keys), dtype=np.int64)
    np.minimum.at(first_pos, out, np.arange(len(keys), dtype=np.int64))
    remap = np.argsort(np.argsort(order_vals[first_pos]))
    return remap[out]
