"""Orbax sharded checkpointing (train/orbax_ckpt.py).

The reference keeps separate deepF / SuperPoint .pth.tar files for its
staged recipe (Train_model_pipeline.py:56-77, loader.py:196-229); here the
components are keys of one sharded checkpoint, restorable independently
and directly onto mesh shardings.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfepe_tpu.parallel.mesh import make_mesh
from deepfepe_tpu.train.orbax_ckpt import (
    CheckpointManagerWrapper,
    restore_sharded,
    save_sharded,
)


def test_save_restore_components(tmp_path):
    """Per-component trees round-trip; a subset restores independently."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.model.depth = 2
    cfg.data.good_num = 64
    net = DeepFNet(depth=2)
    trainer = Trainer(net, cfg)
    batch = SyntheticPairs(good_num=64, seed=0).batch(8)
    trainer.init_state(batch)
    state = jax.device_get(trainer.state)
    sp_params = {"conv": np.ones((3, 3, 1, 8), np.float32)}

    path = str(tmp_path / "ckpt")
    save_sharded(path, {"deepF": state, "superPoint": sp_params})

    # Restore ONLY the deepF component (the staged-recipe restore path).
    out = restore_sharded(path, {"deepF": state})
    got = jax.tree_util.tree_leaves(out["deepF"].params)
    want = jax.tree_util.tree_leaves(state.params)
    assert len(got) == len(want)
    assert all(np.allclose(a, b) for a, b in zip(got, want))
    assert int(out["deepF"].n_iter) == int(state.n_iter)

    # Restore both, replicated over the mesh.
    mesh = make_mesh(n_data=8)
    both = restore_sharded(
        path, {"deepF": state, "superPoint": sp_params}, mesh=mesh
    )
    assert np.allclose(both["superPoint"]["conv"], sp_params["conv"])
    leaf = jax.tree_util.tree_leaves(both["deepF"].params)[0]
    assert leaf.sharding.mesh.shape["data"] == 8


def test_restore_with_custom_sharding(tmp_path):
    """sharding_fn reshards large leaves over the data axis at restore."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=8)
    tree = {"big": np.arange(8 * 6, dtype=np.float32).reshape(8, 6),
            "small": np.float32(3.0)}
    path = str(tmp_path / "ckpt")
    save_sharded(path, {"data": tree})

    def shard_big(leaf):
        if np.ndim(leaf) == 2 and leaf.shape[0] % 8 == 0:
            return NamedSharding(mesh, P("data", None))
        return None

    out = restore_sharded(
        path, {"data": tree}, mesh=mesh, sharding_fn=shard_big
    )
    big = out["data"]["big"]
    assert big.sharding.spec == P("data", None)
    assert np.allclose(np.asarray(big), tree["big"])
    # scalar fell back to replicated
    assert out["data"]["small"].sharding.spec == P()


def test_checkpoint_manager_rotation(tmp_path):
    """max_to_keep rotation + latest restore (the reference's
    <name>_<iter>_checkpoint.pth.tar series)."""
    tree = {"solver": {"w": np.zeros(4, np.float32)}}
    mgr = CheckpointManagerWrapper(str(tmp_path / "mgr"), max_to_keep=2)
    for step in (100, 200, 300):
        tree["solver"]["w"] = np.full(4, step, np.float32)
        mgr.save(step, tree)
    mgr.mgr.wait_until_finished()
    steps = mgr.mgr.all_steps()
    assert list(sorted(steps)) == [200, 300]
    out = mgr.restore_latest({"solver": {"w": np.zeros(4, np.float32)}})
    assert np.allclose(out["solver"]["w"], 300.0)
    mgr.close()
