"""Multi-host surface tests on the virtual 8-device mesh.

The real multi-host path (jax.distributed over DCN x ICI) is
hardware-blocked in this environment; what CAN be validated is the full
single-process code path of the launcher (launch/train_multihost.py) and
the hybrid-mesh constructor it uses — the same functions a pod slice
runs, minus the cross-process init (SURVEY §2.5 / §5.8).
"""

import os
import sys

import numpy as np
import pytest
import yaml

import jax

from deepfepe_tpu.parallel import make_hybrid_mesh, make_mesh


def test_make_hybrid_mesh_single_host_shapes():
    """Single-host fall-through: (n_dev/n_model, n_model) mesh with the
    (data, model) axis names the train step expects."""
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["model"] == 1

    mesh2 = make_hybrid_mesh(n_model=2)
    assert mesh2.shape == {"data": len(jax.devices()) // 2, "model": 2}


def test_hybrid_mesh_train_step_matches_plain_mesh(rng):
    """One solver train step under make_hybrid_mesh == under make_mesh
    (device order may differ; the math must not)."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.parallel import shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = 64
    cfg.model.depth = 2
    net = DeepFNet(depth=2, image_size=(120, 160))
    ds = SyntheticPairs(good_num=64, seed=0, image_size=(120, 160))
    batch = ds.batch(8)

    losses = []
    for mesh in (make_mesh(n_data=8), make_hybrid_mesh()):
        trainer = Trainer(net, cfg, mesh=mesh)
        trainer.init_state(batch)
        state, m = trainer.train_step(
            trainer.state, shard_batch(mesh, batch), 0.1, 0.5
        )
        losses.append(float(np.asarray(m["loss"])))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_launcher_main_single_process(tmp_path, monkeypatch):
    """Drive launch/train_multihost.py end-to-end in single-process mode:
    config load, hybrid mesh, per-host stream seeding, 2 fit iterations,
    checkpoint save."""
    cfg = {
        "data": {"dataset": "synthetic", "batch_size": 8, "good_num": 64,
                 "image": {"size": [120, 160, 3]}},
        "model": {"depth": 2, "clamp_at": 0.02},
        "training": {"learning_rate": 1.0e-4, "train_iter": 2,
                     "save_interval": 2, "seed": 0},
    }
    cfg_path = tmp_path / "mh.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "train_multihost.py", "--config", str(cfg_path),
        "--exper", "mh0",
    ])
    import runpy

    launcher = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "launch", "train_multihost.py",
    )
    runpy.run_path(launcher, run_name="__main__")
    ckpts = list((tmp_path / "logs" / "mh0").rglob("*.msgpack"))
    assert ckpts, "launcher saved no checkpoint"
