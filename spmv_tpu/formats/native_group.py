"""ctypes binding to the native C++ row placement
(``native/plan_group.cpp``) with transparent build + pure-NumPy fallback
(the Python loop in ``formats.base._emit_rows``).

Set ``SPMV_TPU_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "emit_rows", "pack_run_slots", "pool_pack",
           "bank_pack"]

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
        if lib.spmv_plan_abi_version() != 5:
            return None
        lib.spmv_emit_rows.restype = ctypes.c_int64
        lib.spmv_emit_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.spmv_pack_run_slots.restype = None
        lib.spmv_pack_run_slots.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.spmv_pool_pack.restype = ctypes.c_int64
        lib.spmv_pool_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        try:
            lib.spmv_bank_pack.restype = ctypes.c_int64
            lib.spmv_bank_pack.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ]
        except AttributeError:  # pragma: no cover — stale .so
            pass
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def emit_rows(subrow_blk: np.ndarray, subrow_stp: np.ndarray, wcap: int):
    """Native greedy row placement; returns (row_of, out_blk, out_stp) or
    None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    blk = np.ascontiguousarray(subrow_blk, dtype=np.int64)
    stp = np.ascontiguousarray(subrow_stp, dtype=np.int64)
    n = blk.size
    row_of = np.empty(max(n, 1), dtype=np.int64)
    cap = n + 1024
    for _ in range(2):
        out_blk = np.empty(cap, dtype=np.int64)
        out_stp = np.empty(cap, dtype=np.int64)
        t = lib.spmv_emit_rows(
            blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            stp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, wcap,
            row_of.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_blk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_stp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if t >= 0:
            return row_of[:n], out_blk[:t], out_stp[:t]
        cap = -t  # exact required capacity; one retry always suffices
    return None  # pragma: no cover


def pool_pack(pool_id: np.ndarray, lid: np.ndarray, stp: np.ndarray,
              lo: np.ndarray, pack: int):
    """Native pooled per-lane-hi packing walk (see ``formats.pool`` for
    the semantics and the NumPy fallback).  Elements must arrive sorted
    by (pool, lid, stripe, col).  Returns ``(erow, slot, msb, row_pool)``
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pid = np.ascontiguousarray(pool_id, dtype=np.int64)
    lidv = np.ascontiguousarray(lid, dtype=np.int64)
    stpv = np.ascontiguousarray(stp, dtype=np.int64)
    lov = np.ascontiguousarray(lo, dtype=np.int64)
    n = pid.size
    erow = np.empty(max(n, 1), dtype=np.int64)
    slot = np.empty(max(n, 1), dtype=np.int64)
    msb = np.empty(max(n, 1), dtype=np.uint8)
    cap = n + 1024
    for _ in range(2):
        row_pool = np.empty(cap, dtype=np.int64)
        r = lib.spmv_pool_pack(
            pid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lidv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            stpv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lov.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, pack,
            erow.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            msb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            row_pool.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if r >= 0:
            return erow[:n], slot[:n], msb[:n], row_pool[:r]
        cap = -r  # exact required capacity; one retry always suffices
    return None  # pragma: no cover


def bank_pack(pool_id: np.ndarray, lid: np.ndarray, stp: np.ndarray,
              lo: np.ndarray, pack: int):
    """Native two-bank drain-queue packing walk (see ``formats.bank`` for
    the semantics and the NumPy fallback).  Elements must arrive sorted
    by (pool, lid, stripe, col).  Returns ``(erow, slot, msb, bank,
    row_pool)`` or None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "spmv_bank_pack"):
        return None
    pid = np.ascontiguousarray(pool_id, dtype=np.int64)
    lidv = np.ascontiguousarray(lid, dtype=np.int64)
    stpv = np.ascontiguousarray(stp, dtype=np.int64)
    lov = np.ascontiguousarray(lo, dtype=np.int64)
    n = pid.size
    erow = np.empty(max(n, 1), dtype=np.int64)
    slot = np.empty(max(n, 1), dtype=np.int64)
    msb = np.empty(max(n, 1), dtype=np.uint8)
    bank = np.empty(max(n, 1), dtype=np.uint8)
    cap = n + 1024
    for _ in range(2):
        row_pool = np.empty(cap, dtype=np.int64)
        r = lib.spmv_bank_pack(
            pid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lidv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            stpv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lov.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, pack,
            erow.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            msb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bank.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            row_pool.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if r >= 0:
            return erow[:n], slot[:n], msb[:n], bank[:n], row_pool[:r]
        cap = -r  # exact required capacity; one retry always suffices
    return None  # pragma: no cover


def pack_run_slots(seg_sizes: np.ndarray, seg_run: np.ndarray, pack: int):
    """Native dense per-run slot packing (≤1 segment boundary per quad);
    returns each segment's start slot, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    sizes = np.ascontiguousarray(seg_sizes, dtype=np.int64)
    run = np.ascontiguousarray(seg_run, dtype=np.int64)
    f = np.empty(max(sizes.size, 1), dtype=np.int64)
    lib.spmv_pack_run_slots(
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        run.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.size, pack,
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return f[: sizes.size]
