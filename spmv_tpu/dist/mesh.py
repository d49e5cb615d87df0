"""Mesh construction + multi-host initialization.

The reference's multi-device scaffolding is vestigial (≤8-device
enumeration whose loop always breaks after device 0, ``coo.c:30,274``;
no communication backend at all — SURVEY.md §2.3).  Here the real thing:
a 1-D ``jax.sharding.Mesh`` over all addressable devices (ICI within a
host, DCN across hosts via ``jax.distributed``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed"]

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROWS_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op when single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
