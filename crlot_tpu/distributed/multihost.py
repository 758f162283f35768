"""Multi-host setup: (hosts x chips) meshes over DCN + ICI.

SURVEY.md §5 'Distributed communication backend': mesh = (dcn: hosts,
ici: chips). On a multi-host slice, each host runs the same program under
`jax.distributed`; `global_mesh()` lays the TIME axis so consecutive time
blocks sit on ICI-adjacent chips of the same host and only one block edge
per host crosses DCN — halos then ride ICI, and the per-host DCN traffic per
pipeline step is a single (frame - hop)-sample boundary exchange in each
direction (BASELINE.json: >= 80% weak scaling on >= 2 hosts).

This module is exercised single-host in CI (process_count == 1 collapses to
the plain mesh); on a real slice call `initialize()` first on every host.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import CHANNEL_AXIS, TIME_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper (no-op if already initialized or
    single-process with no coordinator configured).

    Must run before ANY backend-initializing jax call (jax.devices(),
    device_put, any computation) — so the check here uses
    jax.distributed.is_initialized(), NOT jax.process_count(), which would
    itself initialize the backend and make the real initialize() throw."""
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address is None:
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(channel: int = 1) -> Mesh:
    """(channel, time) mesh over ALL processes' devices, time-major within
    each host so halo ppermutes are ICI-local except at host boundaries.

    jax.devices() orders devices process-major already; reshaping
    [hosts, devices_per_host] -> channel x time keeps each host's devices
    contiguous along the time axis.
    """
    devs = jax.devices()
    n = len(devs)
    if n % channel != 0:
        raise ValueError(f"{n} devices not divisible by channel={channel}")
    grid = np.asarray(devs).reshape(channel, n // channel)
    return Mesh(grid, (CHANNEL_AXIS, TIME_AXIS))


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
