"""Tensor parallelism for the weight-net MLPs over the mesh 'model' axis.

The reference has no TP (SURVEY.md §2.5 — nn.DataParallel only); this is the
TPU-native optional capability called out there: shard the wide (>=256
channel) Conv1d/Dense layers of the ErrorEstimator stack column-wise over
the 'model' mesh axis. Channels are the LAST axis of every kernel/bias/
InstanceNorm-affine leaf, so one rule shards the whole tree; XLA inserts the
(ICI) collectives for the sharded-contraction boundaries from the committed
input shardings — no manual psum.

Composable with the 'data' axis: a (data, model) mesh runs DP x TP with the
batch sharded over 'data' (parallel.shard_batch) and the params over
'model' (shard_params_tp).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def tp_param_shardings(mesh, params, min_channels: int = 256):
    """NamedSharding tree: last-axis ('channel') sharding over MODEL_AXIS
    for every leaf whose channel count is wide and divisible; everything
    else replicated."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[-1] >= min_channels
            and x.shape[-1] % n_model == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(rule, params)


def shard_params_tp(mesh, params, min_channels: int = 256):
    """Commit the params onto the mesh with TP shardings (device_put)."""
    sh = tp_param_shardings(mesh, params, min_channels)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
