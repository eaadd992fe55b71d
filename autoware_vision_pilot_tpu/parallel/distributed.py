"""Multi-host distributed initialization (the torch.distributed
init_process_group('nccl', init_method='env://') analog —
auto_speed_trainer.py:280-298).

On TPU pods jax.distributed discovers the topology automatically; on
other setups the same env:// convention the reference uses applies:
COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID. Collectives inside a
host's chips ride ICI; across hosts they ride DCN — the hybrid mesh
helper lays the data axis out so gradient all-reduces stay hierarchical
(reduce-scatter over ICI, small cross-host all-reduce over DCN).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the env:// convention.
    Returns True when multi-process mode is active, False for the
    single-process fallback (mirrors the reference's WORLD_SIZE==1
    path). Safe to call twice."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(
        os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", 1)))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", os.environ.get("RANK", 0)))
    if num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
    return True


def make_hybrid_mesh(ici_axes: Sequence[int] = (),
                     axis_names: Sequence[str] = ("data",),
                     devices=None) -> Mesh:
    """Mesh whose leading axis spans hosts (DCN) and trailing axes span
    each host's chips (ICI). With one host this degrades to a flat
    device mesh — the same code path runs everywhere."""
    devices = devices if devices is not None else jax.devices()
    n_hosts = max(1, jax.process_count())
    per_host = len(devices) // n_hosts
    if not ici_axes:
        ici_axes = (per_host,)
    shape = (n_hosts, *ici_axes) if n_hosts > 1 else ici_axes
    names = (("dcn_data", *axis_names) if n_hosts > 1
             else tuple(axis_names))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)
