"""ctypes binding to the native C++ subtile grouping
(``native/plan_group.cpp``) with transparent build + pure-NumPy fallback
(the Python loop in ``formats.base._group_subtiles``).

Set ``SPMV_TPU_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "group_subtiles"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libplangroup.so")
_lib = None
_tried = False


def _ensure_built() -> bool:
    # Always invoke make: it is a no-op when the .so is newer than the
    # sources (the Makefile carries the deps), and it guarantees edits to
    # plan_group.cpp take effect — a stale prebuilt .so must never win.
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass  # fall through: a preexisting .so (e.g. read-only tree) still loads
    return os.path.exists(_SO)


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SPMV_TPU_NO_NATIVE"):
        return None
    if not _ensure_built():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.spmv_plan_abi_version.restype = ctypes.c_int64
        if lib.spmv_plan_abi_version() != 1:
            return None
        lib.spmv_group_subtiles.restype = ctypes.c_int64
        lib.spmv_group_subtiles.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def group_subtiles(subrow_blk: np.ndarray, subrow_stp: np.ndarray, S: int):
    """Native greedy grouping; returns (slot, blocks, bases, ntiles) or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    blk = np.ascontiguousarray(subrow_blk, dtype=np.int64)
    stp = np.ascontiguousarray(subrow_stp, dtype=np.int64)
    n = blk.size
    slot = np.empty(n, dtype=np.int64)
    blocks = np.empty(max(n, 1), dtype=np.int32)
    bases = np.empty(max(n, 1), dtype=np.int32)
    ntiles = lib.spmv_group_subtiles(
        blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        stp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, S,
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return slot, blocks[:ntiles], bases[:ntiles], int(ntiles)
