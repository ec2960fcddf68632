"""Mesh + sharding utilities for data/model-parallel training."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
from .nshard import make_nsharded_fit
from .tp import shard_params_tp, tp_param_shardings

__all__ = [k for k in dir() if not k.startswith("_")]
