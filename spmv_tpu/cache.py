"""Converted-format caching.

The reference re-parses the 60 MB .mtx text file from scratch on every run
— three full parses per driver execution (SURVEY.md §3.5).  Two cache
levels, both ``.npz``:

* **triplets** keyed by a file content fingerprint (replaces the parse);
* **device plans** keyed by a content hash of the builder inputs
  (replaces the conversion) — enabled by :func:`set_plan_cache` and used
  transparently by every ``build_*_plan`` call, including the sub-plans
  HYB builds internally.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

__all__ = ["cache_key", "save_plan", "load_plan", "cached_convert",
           "set_plan_cache", "plan_lookup", "plan_store"]

_CACHE_VERSION = 4  # bump when plan layouts change (4: P-packed SegPlan)

_PLAN_CACHE_DIR: str | None = None


def set_plan_cache(cache_dir: str | None) -> None:
    """Enable (or disable with None) transparent plan-build caching."""
    global _PLAN_CACHE_DIR
    _PLAN_CACHE_DIR = cache_dir


def _plan_key(kind: str, rows, cols, vals, nrows: int, ncols: int,
              chunk: int) -> str:
    h = hashlib.sha256()
    h.update(f"v{_CACHE_VERSION}|{kind}|{nrows}|{ncols}|{chunk}".encode())
    for a in (rows, cols, vals):
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return f"plan-{kind}-{h.hexdigest()[:24]}"


def plan_lookup(kind: str, rows, cols, vals, nrows, ncols, chunk, plan_cls):
    """Return the cached plan dataclass, or None (cache off / miss)."""
    if _PLAN_CACHE_DIR is None:
        return None
    hit = load_plan(_PLAN_CACHE_DIR, _plan_key(kind, rows, cols, vals,
                                               nrows, ncols, chunk))
    if hit is None:
        return None
    meta, arrays = hit
    return plan_cls(**arrays, **meta)


def plan_store(kind: str, rows, cols, vals, nrows, ncols, chunk,
               plan) -> None:
    if _PLAN_CACHE_DIR is None:
        return
    from dataclasses import fields

    meta, arrays = {}, {}
    for f in fields(plan):
        v = getattr(plan, f.name)
        (arrays if isinstance(v, np.ndarray) else meta)[f.name] = v
    save_plan(_PLAN_CACHE_DIR, _plan_key(kind, rows, cols, vals,
                                         nrows, ncols, chunk), meta, arrays)


def _fingerprint(path: str) -> str:
    """Content fingerprint: sha256 of size + first/last 64KB (fast on the
    60MB benchmark files, strong enough for a local cache)."""
    h = hashlib.sha256()
    size = os.path.getsize(path)
    h.update(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
        if size > 131072:
            f.seek(-65536, 2)
            h.update(f.read(65536))
    return h.hexdigest()[:24]


def cache_key(path: str, format: str, params: dict) -> str:
    p = json.dumps(params, sort_keys=True, default=str)
    h = hashlib.sha256(f"v{_CACHE_VERSION}|{format}|{p}".encode()).hexdigest()[:12]
    return f"{_fingerprint(path)}-{format}-{h}"


def save_plan(cache_dir: str, key: str, meta: dict, arrays: dict) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, key + ".npz")
    tmp = out + ".tmp.npz"
    np.savez_compressed(tmp, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, out)
    return out


def load_plan(cache_dir: str, key: str):
    path = os.path.join(cache_dir, key + ".npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return meta, arrays


def cached_convert(path: str, format: str, cache_dir: str | None = None,
                   **fmt_kwargs):
    """Load + convert with npz caches of the raw triplets and the built
    device plans.  Returns the format container."""
    from spmv_tpu.api import from_coo
    from spmv_tpu.io.mmio import read_path_or_synthesize

    if cache_dir is None or not os.path.exists(path):
        info, rows, cols, vals = read_path_or_synthesize(path)
        return from_coo(format, info.nrows, info.ncols, rows, cols, vals,
                        **fmt_kwargs)

    key = cache_key(path, "coo-triplets", {})
    hit = load_plan(cache_dir, key)
    if hit is not None:
        meta, arrays = hit
        rows, cols, vals = arrays["rows"], arrays["cols"], arrays["vals"]
        nrows, ncols = meta["nrows"], meta["ncols"]
    else:
        info, rows, cols, vals = read_path_or_synthesize(path)
        nrows, ncols = info.nrows, info.ncols
        save_plan(cache_dir, key, {"nrows": nrows, "ncols": ncols},
                  {"rows": rows, "cols": cols, "vals": vals})
    prev = _PLAN_CACHE_DIR
    set_plan_cache(cache_dir)
    try:
        return from_coo(format, nrows, ncols, rows, cols, vals, **fmt_kwargs)
    finally:
        set_plan_cache(prev)
