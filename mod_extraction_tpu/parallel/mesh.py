"""Device mesh + sharding helpers — the framework's parallelism layer.

Replaces the reference's DDP/NCCL setup (`cli.py:48`,
`CUDA_VISIBLE_DEVICES` plumbing `cli.py:117-126`) with JAX SPMD:

* a 1-D `data` mesh (the reference is pure data-parallel; its models are
  <1M params so TP/PP are unnecessary — SURVEY.md §2.4),
* batches sharded on axis 0, params replicated,
* gradient reduction happens inside the jitted step as XLA-inserted
  all-reduces over ICI (no explicit NCCL-style calls anywhere).

On-device data rendering (train/render.py) is sharded WITH the batch, so
synthesis throughput scales linearly with chip count.

Multi-host scaling note: the same code runs unchanged on multi-host
slices — `jax.devices()` returns the global device list under
`jax.distributed.initialize()`, the mesh spans hosts, and XLA routes the
gradient all-reduce over ICI within a slice (DCN across slices).  The
only host-side change needed is per-host batch feeding: give each host
its shard of the global batch (`jax.make_array_from_process_local_data`
instead of `device_put`).  Since every model here is <1M params, the
data axis is the only axis worth sharding at any scale the reference
targets (SURVEY.md §2.4, §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    """Replicate a pytree of host arrays across the whole mesh.

    Single-host: plain device_put.  Multi-host: `jax.device_put` from one
    process's host buffer cannot populate non-addressable devices, so the
    fully-replicated global array is assembled with
    `make_array_from_process_local_data` (every process holds the full
    value, which IS its process-local portion of a replicated array).
    Every process must hold identical data — true here because corpora
    are built from config-seeded generators."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Feed a pytree of host arrays with batch-axis sharding.

    The input is the FULL GLOBAL batch on every host (loaders are
    config-seeded, so all processes draw identical batches).

    Single-host: plain device_put.  Multi-host (a mesh spanning
    processes under `jax.distributed.initialize()`): each process slices
    out the contiguous row-block that lands on its addressable devices
    and the global array is assembled with
    `make_array_from_process_local_data`, so the global batch is
    identical to the single-host batch (same size, same examples) —
    hosts just feed disjoint slices of it."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        pi, pc = jax.process_index(), jax.process_count()

        def put(x):
            x = np.asarray(x)
            if x.shape[0] % pc != 0:
                raise ValueError(
                    f"global batch dim {x.shape[0]} not divisible by "
                    f"process_count {pc}"
                )
            per = x.shape[0] // pc
            local = x[pi * per : (pi + 1) * per]
            return jax.make_array_from_process_local_data(sharding, local)

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
