"""End-to-end model + training tests on the synthetic oracle dataset.

The key assertions mirror the reference's verification strategy: (a) training
reduces the F-loss; (b) with informative weights, the estimated F approaches
gt (err_q/err_t sanity vs gt); (c) the whole step is shardable over an
8-device data mesh with identical numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfepe_tpu.data import SyntheticPairs
from deepfepe_tpu.losses import f_loss, rt_loss
from deepfepe_tpu.models import DeepFNet, ErrorEstimator
from deepfepe_tpu.parallel import make_mesh, shard_batch
from deepfepe_tpu.train import Config, Trainer


pytestmark = pytest.mark.slow  # end-to-end: excluded from the core numeric suite

def to_jax(b):
    return {k: jnp.asarray(v) for k, v in b.items()}


def small_config(**model_kw):
    cfg = Config()
    cfg.data.good_num = 128
    cfg.data.batch_size = 2
    cfg.model.depth = 3
    for k, v in model_kw.items():
        setattr(cfg.model, k, v)
    cfg.training.val_interval = -1
    cfg.training.save_interval = -1
    cfg.training.learning_rate = 1e-3  # fast-converging test regime
    return cfg


def make_net(cfg, **kw):
    return DeepFNet(
        depth=cfg.model.depth,
        image_size=cfg.data.image_size,
        if_quality=cfg.model.if_quality,
        **kw,
    )


def test_error_estimator_shapes(rng):
    net = ErrorEstimator()
    x = jnp.asarray(rng.randn(2, 64, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 64, 1)
    # InstanceNorm affine params exist.
    flat = jax.tree_util.tree_leaves(params)
    # 4->64->128->1024->512->256->1 Conv1d stack + affine InstanceNorms
    # = 801,089 params, matching the reference ErrorEstimator exactly.
    assert sum(int(np.prod(p.shape)) for p in flat) == 801_089


def test_deepfnet_forward_shapes():
    ds = SyntheticPairs(good_num=128, seed=3)
    batch = to_jax(ds.batch(2))
    net = DeepFNet(depth=4, image_size=(376, 1241), if_quality=True)
    params = net.init(jax.random.PRNGKey(0), batch)
    outs = net.apply(params, batch)
    assert outs["out_layers"].shape == (4, 2, 3, 3)
    assert outs["epi_res_layers"].shape == (3, 2, 128)
    assert outs["weights_layers"].shape == (4, 2, 128)
    assert outs["F_est"].shape == (2, 3, 3)
    # Weights are a distribution over N.
    np.testing.assert_allclose(
        np.asarray(jnp.sum(outs["weights"], -1)), 1.0, atol=1e-5
    )


def test_deepfnet_variants_compile():
    ds = SyntheticPairs(good_num=64, seed=4)
    b = ds.batch(2)
    b["weights_im"] = np.ones((2, 64), np.float32)
    batch = to_jax(b)
    for kw in (
        dict(if_learn_offsets=True),
        dict(if_img_w=True),
        dict(if_tri_depth=True),
    ):
        net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True, **kw)
        params = net.init(jax.random.PRNGKey(0), batch)
        outs = net.apply(params, batch)
        assert np.all(np.isfinite(np.asarray(outs["F_est"])))


def test_deepfnet_des_fusion_variant():
    """Descriptor-fusion input path (ref: if_des -> ErrorEstimatorFeatFusion,
    DeepFNet.py:330-333): fused per-point descriptors join the weight-net
    input; gradients must flow back into them (the end-to-end SP path)."""
    ds = SyntheticPairs(good_num=64, seed=12)
    b = to_jax(ds.batch(2))
    D = 8
    b["des"] = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, D), jnp.float32
    )
    net = DeepFNet(
        depth=2, image_size=(376, 1241), if_quality=True,
        if_des=True, des_size=D,
    )
    params = net.init(jax.random.PRNGKey(0), b)

    def f(des):
        outs = net.apply(params, {**b, "des": des})
        return jnp.sum(outs["F_est"] ** 2)

    g = jax.grad(f)(b["des"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_training_reduces_floss():
    cfg = small_config(if_quality=True)
    net = make_net(cfg)
    ds = SyntheticPairs(
        good_num=cfg.data.good_num, noise_px=0.3, outlier_frac=0.3, seed=7
    )
    fixed = [ds.batch(cfg.data.batch_size) for _ in range(4)]

    trainer = Trainer(net, cfg, save_dir=None, mesh=make_mesh(n_data=1))
    trainer.init_state(fixed[0])
    losses = []
    for i in range(200):
        b = shard_batch(trainer.mesh, fixed[i % len(fixed)])
        trainer.state, m = trainer.train_step(trainer.state, b, 0.1, 0.5)
        losses.append(float(m["loss_F"]))  # computed at pre-update params
    first = np.mean(losses[:8])
    last = np.mean(losses[-8:])
    assert last < first * 0.95, (first, last)


def test_qt_loss_mode_trains():
    cfg = small_config(if_quality=True, if_qt_loss=True)
    net = make_net(cfg)
    ds = SyntheticPairs(
        good_num=cfg.data.good_num, noise_px=0.2, outlier_frac=0.2, seed=8
    )
    fixed = [ds.batch(cfg.data.batch_size) for _ in range(2)]
    trainer = Trainer(net, cfg, save_dir=None, mesh=make_mesh(n_data=1))
    trainer.init_state(fixed[0])
    m0 = None
    for i in range(30):
        b = shard_batch(trainer.mesh, fixed[i % 2])
        trainer.state, m = trainer.train_step(trainer.state, b, 0.1, 0.5)
        if m0 is None:
            m0 = m
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_sharded_step_matches_single_device():
    cfg = small_config(if_quality=True)
    net = make_net(cfg)
    ds = SyntheticPairs(good_num=cfg.data.good_num, seed=9)
    # Batch divisible by 8 devices.
    batch = ds.batch(8)

    mesh8 = make_mesh(n_data=8)
    mesh1 = make_mesh(n_data=1)
    tr8 = Trainer(net, cfg, mesh=mesh8)
    tr1 = Trainer(net, cfg, mesh=mesh1)
    tr8.init_state(batch)
    tr1.init_state(batch)
    # Same init (same seed) -> same loss and same gradient direction.
    # (Post-Adam params are NOT compared: the first Adam step is
    # ±lr·sign(g), which amplifies f32 reduction-order noise unboundedly.)
    from deepfepe_tpu.train.engine import compute_losses

    def loss_fn(params, b):
        return compute_losses(net, params, b, cfg, 0.1, 0.5)[0]

    l8, g8 = jax.value_and_grad(loss_fn)(tr8.state.params, shard_batch(mesh8, batch))
    l1, g1 = jax.value_and_grad(loss_fn)(tr1.state.params, shard_batch(mesh1, batch))
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    v8 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(g8))]
    )
    v1 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(jax.device_get(g1))]
    )
    cos = np.dot(v8, v1) / (np.linalg.norm(v8) * np.linalg.norm(v1))
    assert cos > 1 - 1e-5, cos


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_config(if_quality=True)
    net = make_net(cfg)
    ds = SyntheticPairs(good_num=cfg.data.good_num, seed=10)
    batch = ds.batch(2)
    trainer = Trainer(net, cfg, save_dir=str(tmp_path), mesh=make_mesh(n_data=1))
    trainer.init_state(batch)
    trainer.state, _ = trainer.train_step(
        trainer.state, shard_batch(trainer.mesh, batch), 0.1, 0.5
    )
    path = trainer.save(1)

    trainer2 = Trainer(net, cfg, save_dir=str(tmp_path), mesh=make_mesh(n_data=1))
    state2 = trainer2.restore(path, batch)
    assert int(state2.n_iter) == 1
    a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sample_loss_variant_trains():
    cfg = small_config(if_quality=True, if_sample_loss=True)
    net = DeepFNet(
        depth=2,
        image_size=cfg.data.image_size,
        if_quality=True,
        if_sample_loss=True,
        sample_topk=9,
        sample_selects=16,
    )
    cfg.model.depth = 2
    ds = SyntheticPairs(good_num=64, noise_px=0.3, outlier_frac=0.3, seed=11)
    cfg.data.good_num = 64
    batch = ds.batch(2)
    trainer = Trainer(net, cfg, save_dir=None, mesh=make_mesh(n_data=1))
    trainer.init_state(batch)
    b = shard_batch(trainer.mesh, batch)
    state, m = trainer.train_step(trainer.state, b, 0.1, 0.5)
    assert "loss_selected_F" in m
    assert np.isfinite(float(m["loss_selected_F"]))
    assert float(m["loss"]) > float(m["loss_F"])  # aux term added


def test_resume_continuity_bitexact():
    """Elastic-recovery guarantee (SURVEY §5.3): train k, checkpoint,
    restart a FRESH trainer, restore, train k more — parameters match an
    uninterrupted 2k-iter run exactly (the step rng is keyed on n_iter, so
    resume replays the identical trajectory)."""
    import tempfile

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = 64
    cfg.model.depth = 2
    cfg.model.if_quality = True
    cfg.training.val_interval = 10_000  # no mid-run validation
    net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True)

    def batches():
        ds = SyntheticPairs(good_num=64, seed=0)
        while True:
            yield ds.batch(8)  # divisible by the 8-device virtual mesh

    with tempfile.TemporaryDirectory() as d:
        # Uninterrupted 6 iterations.
        t_a = Trainer(net, cfg, save_dir=d + "/a")
        t_a.fit(batches(), max_iters=6)
        p_ref = jax.device_get(t_a.state.params)

        # 3 iterations + checkpoint.
        t_b = Trainer(net, cfg, save_dir=d + "/b")
        t_b.fit(batches(), max_iters=3)
        t_b.save(3)
        ckpt = d + "/b/checkpoints/deepFNet_3_checkpoint.msgpack"

        # Fresh process-equivalent: new trainer, restore, 3 more. The
        # data stream must resume where it left off (deterministic
        # generators: fast-forward by n_iter).
        t_c = Trainer(net, cfg, save_dir=d + "/c")
        stream = batches()
        first = next(batches())
        t_c.restore(ckpt, first)
        assert t_c.n_iter == 3
        for _ in range(3):
            next(stream)
        t_c.fit(stream, max_iters=6)  # continues to iter 6
        p_res = jax.device_get(t_c.state.params)

    mism = [
        float(np.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref),
            jax.tree_util.tree_leaves(p_res),
        )
    ]
    assert max(mism) == 0.0, max(mism)
