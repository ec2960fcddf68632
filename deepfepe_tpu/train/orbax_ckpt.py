"""Orbax sharded checkpointing: per-component trees, mesh-aware restore.

The TPU-native upgrade of the reference's torch `.pth.tar` checkpoints
(Train_model_pipeline.py:56-77 save_checkpoint with n_iter / model /
optimizer state; loader.py:196-229 restore — SURVEY.md §5.4). The reference
keeps *separate* deepF and SuperPoint checkpoint files to enable its staged
training recipe (README steps 0-3); here the same separation is the
top-level component keys of ONE sharded Orbax checkpoint:

    {"deepF": TrainState, "superPoint": sp_params, "meta": {...}}

so each component can be restored independently (`items=` subset), and
array shards are written/read per device — on a real multi-host pod every
host writes only its shards (no device→single-host gather, unlike the
msgpack path in train/loop.py, which stays as the small-scale/portable
format).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ensure_abs(path: str) -> str:
    return os.path.abspath(path)


def save_sharded(path: str, components: Dict[str, Any]) -> str:
    """Write one sharded checkpoint holding named component trees.

    `components` maps component name -> pytree (TrainState, params, opt
    state, plain dicts of arrays). Arrays keep their shardings; each
    process writes only addressable shards.
    """
    path = _ensure_abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, components, force=True)
    return path


def restore_sharded(
    path: str,
    templates: Dict[str, Any],
    mesh: Optional[jax.sharding.Mesh] = None,
    sharding_fn=None,
) -> Dict[str, Any]:
    """Restore a subset of components directly onto device shardings.

    `templates` maps component name -> pytree of the same structure as was
    saved (concrete arrays or jax.ShapeDtypeStruct leaves). When `mesh` is
    given, every leaf is restored replicated over the mesh unless
    `sharding_fn(leaf) -> Sharding | None` says otherwise — the
    restore-time resharding story the torch format can't express.
    """
    path = _ensure_abs(path)

    def to_abstract(leaf):
        x = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec())
        if sharding_fn is not None:
            sharding = sharding_fn(x) or sharding
        return jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", np.asarray(x).dtype),
            sharding=sharding,
        )

    abstract = {
        name: jax.tree_util.tree_map(to_abstract, tpl)
        for name, tpl in templates.items()
    }
    restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
    # PyTreeRestore(partial_restore=True) allows `templates` to name a
    # subset of the saved components (restore deepF without superPoint —
    # the staged-recipe path).
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=abstract,
                restore_args=restore_args,
                partial_restore=True,
            ),
        )


class CheckpointManagerWrapper:
    """Iteration-keyed checkpoint rotation (the reference's
    `<name>_<iter>_checkpoint.pth.tar` files + implicit keep-all becomes
    an Orbax CheckpointManager with max_to_keep + best-metric retention,
    mirroring Trainer's best-val checkpoint)."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 5,
        best_fn_metric: Optional[str] = None,
    ):
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: -m[best_fn_metric]) if best_fn_metric else None,
        )
        self.mgr = ocp.CheckpointManager(
            _ensure_abs(directory), options=options
        )

    def save(self, step: int, components: Dict[str, Any],
             metrics: Optional[Dict[str, float]] = None) -> None:
        self.mgr.save(
            step, args=ocp.args.StandardSave(components), metrics=metrics
        )

    def restore_latest(self, templates: Dict[str, Any]) -> Dict[str, Any]:
        step = self.mgr.latest_step()
        assert step is not None, "no checkpoints found"
        abstract = {
            name: jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tpl
            )
            for name, tpl in templates.items()
        }
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self.mgr.close()
