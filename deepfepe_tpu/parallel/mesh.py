"""Device mesh + sharding for data-parallel (and future model-parallel) runs.

The reference's only parallelism is single-process `nn.DataParallel`
(train_good.py:311-314 — SURVEY.md §2.5). Here the equivalent is a
`jax.sharding.Mesh` with a `data` axis (and a reserved `model` axis for the
wide MLP layers / future distributed-BA blocks): parameters replicated,
batches sharded on `data`, gradient all-reduce emitted by XLA as `psum` over
ICI. Multi-host extends the same mesh via `jax.distributed.initialize` +
`create_hybrid_device_mesh` (DCN × ICI) without touching the step function.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} > {len(devices)} devices"
    )
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(n_model: int = 1) -> Mesh:
    """Multi-host mesh: DCN-major data axis × ICI model axis.

    Uses `mesh_utils.create_hybrid_device_mesh` so the data-parallel gradient
    all-reduce decomposes into an ICI reduce-scatter/all-gather within each
    slice plus a small DCN all-reduce across slices.
    """
    from jax.experimental import mesh_utils

    n_dev = jax.device_count()
    per_host = jax.local_device_count()
    n_hosts = max(1, n_dev // per_host)
    mesh_shape = (n_dev // n_model, n_model)
    if n_hosts > 1:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host // n_model, n_model),
            dcn_mesh_shape=(n_hosts, 1),
        )
    else:
        devices = mesh_utils.create_device_mesh(mesh_shape)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with the batch axis sharded on `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_params(mesh: Mesh, tree):
    """Replicate a parameter/optimizer tree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
