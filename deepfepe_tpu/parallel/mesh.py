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
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(per_host // n_model, n_model),
                dcn_mesh_shape=(n_hosts, 1),
            )
        except ValueError:
            # Non-TPU multi-process backends (e.g. the gloo CPU
            # collectives the launcher test runs on) expose no
            # slice_index, so create_hybrid_device_mesh sees one slice.
            # Group by process instead: process-major ordering keeps
            # each host's shard of the data axis on its own devices —
            # the same DCN-major layout the hybrid mesh produces.
            import numpy as _np

            devs = sorted(
                jax.devices(), key=lambda d: (d.process_index, d.id)
            )
            devices = _np.array(devs).reshape(mesh_shape)
    else:
        devices = mesh_utils.create_device_mesh(mesh_shape)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with the batch axis sharded on `data`.

    Single-process: a plain device_put of the full batch. Multi-process
    (jax.distributed): each process passes its LOCAL rows and the global
    array is assembled from the per-process shards
    (jax.make_array_from_process_local_data) — the launcher feeds every
    process the rows its devices own (launch/train_multihost.py)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as _np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, _np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_params(mesh: Mesh, tree):
    """Replicate a parameter/optimizer tree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
