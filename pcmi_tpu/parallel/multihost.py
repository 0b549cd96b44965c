"""Multi-host bring-up: jax.distributed + DCN-aware mesh construction.

The reference has no distributed runtime at all (SURVEY §2.8). In this
framework the scale-out story spans three tiers:

1. single chip — everything under jit;
2. one slice — (data × tile) mesh over ICI (:mod:`pcmi_tpu.parallel.mesh`);
3. multi-host / multi-slice — the embarrassingly parallel axes (stereo
   pairs, acquisition dates, AOIs of a sweep) ride DCN, while the
   tile/halo axis stays inside each slice's ICI domain.

``initialize()`` wraps ``jax.distributed.initialize`` with environment
detection; ``make_multihost_mesh()`` builds a (dcn, data, tile) mesh whose
leading axis spans processes, using
``jax.experimental.mesh_utils.create_hybrid_device_mesh`` so collectives
never cross DCN except on the axis that needs no bandwidth.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DCN_AXIS = "dcn"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed when running multi-process.

    Safe to call unconditionally: single-process runs (no coordinator in
    the environment and no arguments) return False without touching
    distributed state. TPU pod environments auto-detect everything.
    """
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) and \
        len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
    if coordinator_address is None and env_coord is None and not on_pod:
        return False
    kwargs = {}
    if coordinator_address or env_coord:
        kwargs["coordinator_address"] = coordinator_address or env_coord
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def make_multihost_mesh(data: int = 1, tile: Optional[int] = None) -> Mesh:
    """(dcn, data, tile) mesh: processes on the leading axis, ICI inside.

    Pairs/dates/AOIs shard over ``dcn`` × ``data`` (no communication
    between shards), row-band halo exchange over ``tile`` stays on ICI.
    Falls back to a single-process mesh with a unit dcn axis.
    """
    n_proc = jax.process_count()
    local = jax.local_device_count()
    if tile is None:
        if local % max(data, 1):
            raise ValueError(f"{local} local devices not divisible by data={data}")
        tile = local // max(data, 1)
    if data * tile != local:
        raise ValueError(f"data*tile={data * tile} != local devices {local}")

    if n_proc == 1:
        grid = np.array(jax.devices()).reshape(1, data, tile)
        return Mesh(grid, (DCN_AXIS, "data", "tile"))

    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data, tile),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices(),
        )
    except ValueError:
        # Devices without distinct slice indices (multi-process CPU, or a
        # single slice spanning hosts): group by process so the leading
        # axis still aligns with DCN boundaries.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        grid = np.array(devs)
    return Mesh(grid.reshape(n_proc, data, tile), (DCN_AXIS, "data", "tile"))
