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


@pytest.mark.slow
def test_launcher_two_real_processes_cpu(tmp_path):
    """VERDICT r4 next-step #3: the launcher as a REAL multi-process job
    (jax.distributed + gloo CPU collectives, 2 processes x 4 local
    devices). Asserts: the mesh spans both processes (global = 2x
    local), training completes with a loss IDENTICAL to the
    single-process run at the same global batch (the launcher renders
    process-count-invariant global batches), checkpoint/metrics are
    written by process 0 only, and --pretrained resume continues from
    the restored iteration."""
    import json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = os.path.join(repo, "launch", "train_multihost.py")
    cfg = {
        "data": {"dataset": "synthetic", "batch_size": 8, "good_num": 64,
                 "image": {"size": [120, 160, 3]}},
        "model": {"depth": 2, "clamp_at": 0.02, "mlp_dtype": "float32"},
        "training": {"learning_rate": 1.0e-4, "train_iter": 2,
                     "save_interval": 2, "seed": 0, "val_interval": 0,
                     "tensorboard": False},
    }
    cfg_path = tmp_path / "mh.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    driver = tmp_path / "driver.py"
    driver.write_text(
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=4'\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_cpu_collectives_implementation', 'gloo')\n"
        "sys.argv = ['train_multihost.py'] + sys.argv[1:]\n"
        "import runpy\n"
        f"runpy.run_path({launcher!r}, run_name='__main__')\n"
    )

    def run_pair(exper, extra=(), port=29541):
        common = [sys.executable, str(driver), "--config", str(cfg_path),
                  "--exper", exper, "--coordinator", f"localhost:{port}",
                  "--num_processes", "2", *extra]
        procs = [
            subprocess.Popen(
                common + ["--process_id", str(k)], cwd=tmp_path,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for k in (0, 1)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        return outs

    outs = run_pair("mh2")
    # The mesh spans both processes: 2 x 4 local = 8 global devices.
    assert "processes=2 devices=8" in outs[0] + outs[1], outs
    log_dir = tmp_path / "logs" / "mh2"
    ckpts = sorted(p.name for p in (log_dir / "checkpoints").iterdir())
    assert "deepFNet_2_checkpoint.msgpack" in ckpts
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    mp_losses = {r["iter"]: r["loss"] for r in lines if r["tag"] == "train"}
    assert set(mp_losses) == {0, 1} and all(
        np.isfinite(v) for v in mp_losses.values()
    )
    # Process 0 wrote everything; process 1 wrote nothing (its save_dir
    # is None) — the only logs/ entries are mh2's.
    assert sorted(p.name for p in (tmp_path / "logs").iterdir()) == ["mh2"]

    # Single-process run, same config: the launcher's global batches are
    # process-count-invariant, so the losses must match.
    sp = subprocess.run(
        [sys.executable, str(driver), "--config", str(cfg_path),
         "--exper", "mh1"], cwd=tmp_path, capture_output=True, text=True,
        timeout=600,
    )
    assert sp.returncode == 0, sp.stdout + sp.stderr
    lines1 = [json.loads(l) for l in
              (tmp_path / "logs/mh1/metrics.jsonl").read_text().splitlines()]
    sp_losses = {r["iter"]: r["loss"] for r in lines1
                 if r["tag"] == "train"}
    # Iter 0 is pre-update: identical global batch + identical init must
    # give the SAME loss up to f32 reduction order (tight tolerance —
    # this is the data-identity check). Iter 1 has been through one
    # cross-process gradient psum + Adam update, whose reduction order
    # differs from the single-device sum; allow accumulated f32 noise.
    np.testing.assert_allclose(mp_losses[0], sp_losses[0], rtol=1e-6)
    np.testing.assert_allclose(mp_losses[1], sp_losses[1], rtol=5e-4)

    # Resume: restore the 2-process checkpoint in a fresh 2-process job
    # and continue to iter 3.
    cfg["training"]["train_iter"] = 3
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    ckpt = str(log_dir / "checkpoints" / "deepFNet_2_checkpoint.msgpack")
    outs2 = run_pair("mh2r", extra=["--pretrained", ckpt], port=29543)
    assert "restored" in outs2[0], outs2[0]
    lines2 = [json.loads(l) for l in
              (tmp_path / "logs/mh2r/metrics.jsonl").read_text().splitlines()]
    resumed = {r["iter"] for r in lines2 if r["tag"] == "train"}
    assert resumed == {2}, resumed  # continues exactly where it stopped
