"""Torch .pth.tar checkpoint import (utils/torch_import.py).

Forward-equivalence oracles: torch models built here from the reference's
documented architecture spec (ErrorEstimators.py:14-69 Conv1d/InstanceNorm
stack; classic SuperPointNet conv1a..convDb layout) are run side by side
with our flax modules under converted weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepfepe_tpu.utils.torch_import import (  # noqa: E402
    convert_deepf_state,
    convert_superpoint_state,
    load_reference_checkpoint,
    strip_module_prefix,
)


def _torch_error_estimator(input_size, output_size=1, seed=0):
    """The reference ErrorEstimator stack (non-BN), built from its spec."""
    torch.manual_seed(seed)
    dims = [input_size, 64, 128, 1024, 512, 256]
    layers = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        layers += [
            tnn.Conv1d(cin, cout, kernel_size=1, bias=True),
            tnn.InstanceNorm1d(cout, affine=True),
            tnn.LeakyReLU(),
        ]
    layers.append(tnn.Conv1d(256, output_size, kernel_size=1, bias=True))
    net = tnn.Sequential(*layers)
    # Randomize the affine norms so the test is not identity-covered.
    with torch.no_grad():
        for m in net:
            if isinstance(m, tnn.InstanceNorm1d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    return net


class _TorchDeepFWeights(tnn.Module):
    """Carrier exposing the reference DeepFNet naming
    (input_weights.fw.*, update_weights.fw.* — DeepFNet.py:325-326)."""

    def __init__(self, in1, in2):
        super().__init__()
        self.input_weights = tnn.Module()
        self.input_weights.fw = _torch_error_estimator(in1, seed=1)
        self.update_weights = tnn.Module()
        self.update_weights.fw = _torch_error_estimator(in2, seed=2)


def test_error_estimator_forward_parity():
    from deepfepe_tpu.models.error_estimator import ErrorEstimator

    tnet = _torch_error_estimator(5, seed=3)
    sd = {f"ee.fw.{k}": v for k, v in tnet.state_dict().items()}
    variables = convert_deepf_state(sd)
    params = variables["params"]["ee"]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 50, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    ours = ErrorEstimator(output_size=1).apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5
    )


def test_deepf_checkpoint_roundtrip(tmp_path):
    """Full .pth.tar -> DeepFNet params: tree matches init, forward runs."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet

    carrier = _TorchDeepFWeights(5, 8)
    ckpt = {
        "n_iter": 1234,
        "model_state_dict": {
            "module." + k: v for k, v in carrier.state_dict().items()
        },
        "loss": 0.5,
    }
    path = tmp_path / "deepFNet_1234_checkpoint.pth.tar"
    torch.save(ckpt, path)

    variables, n_iter = load_reference_checkpoint(str(path))
    assert n_iter == 1234

    net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True)
    batch = SyntheticPairs(good_num=100, seed=0).batch(2)
    init = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch,
    )
    ref_tree = jax.tree_util.tree_structure(init)
    got_tree = jax.tree_util.tree_structure(variables)
    assert ref_tree == got_tree
    for a, b in zip(
        jax.tree_util.tree_leaves(init), jax.tree_util.tree_leaves(variables)
    ):
        assert a.shape == np.shape(b)

    preds = net.apply(
        variables, batch, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert np.all(np.isfinite(np.asarray(preds["F_est"])))


def _torch_superpoint(seed=0):
    torch.manual_seed(seed)

    class SP(tnn.Module):
        def __init__(self):
            super().__init__()
            c = tnn.Conv2d
            self.conv1a = c(1, 64, 3, padding=1)
            self.conv1b = c(64, 64, 3, padding=1)
            self.conv2a = c(64, 64, 3, padding=1)
            self.conv2b = c(64, 64, 3, padding=1)
            self.conv3a = c(64, 128, 3, padding=1)
            self.conv3b = c(128, 128, 3, padding=1)
            self.conv4a = c(128, 128, 3, padding=1)
            self.conv4b = c(128, 128, 3, padding=1)
            self.convPa = c(128, 256, 3, padding=1)
            self.convPb = c(256, 65, 1)
            self.convDa = c(128, 256, 3, padding=1)
            self.convDb = c(256, 256, 1)
            self.relu = tnn.ReLU()
            self.pool = tnn.MaxPool2d(2, 2)

        def forward(self, x):
            r, p = self.relu, self.pool
            x = r(self.conv1b(r(self.conv1a(x))))
            x = p(x)
            x = r(self.conv2b(r(self.conv2a(x))))
            x = p(x)
            x = r(self.conv3b(r(self.conv3a(x))))
            x = p(x)
            x = r(self.conv4b(r(self.conv4a(x))))
            semi = self.convPb(r(self.convPa(x)))
            desc = self.convDb(r(self.convDa(x)))
            desc = desc / torch.norm(desc, dim=1, keepdim=True)
            return semi, desc

    return SP()


@pytest.mark.slow
def test_superpoint_forward_parity():
    from deepfepe_tpu.frontend import SuperPointNet

    tnet = _torch_superpoint(seed=4)
    variables = convert_superpoint_state(tnet.state_dict())

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 32, 40, 1)).astype(np.float32)
    with torch.no_grad():
        semi_t, desc_t = tnet(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = SuperPointNet().apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out["semi"]),
        semi_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["desc"]),
        desc_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4,
        atol=1e-4,
    )


def test_strip_module_prefix():
    sd = {"module.a.weight": 1, "module.b.bias": 2}
    assert set(strip_module_prefix(sd)) == {"a.weight", "b.bias"}
    sd2 = {"a.weight": 1}
    assert strip_module_prefix(sd2) is sd2


def test_load_checkpoint_pth_tar(tmp_path):
    """Trainer-side restore path accepts reference .pth.tar directly."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config, Trainer

    carrier = _TorchDeepFWeights(5, 8)
    ckpt = {"n_iter": 77, "model_state_dict": carrier.state_dict()}
    path = tmp_path / "deepFNet_77_checkpoint.pth.tar"
    torch.save(ckpt, path)

    cfg = Config()
    cfg.model.if_quality = True
    net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True)
    trainer = Trainer(net, cfg)
    batch = SyntheticPairs(good_num=100, seed=0).batch(8)
    trainer.restore(str(path), batch)
    assert trainer.n_iter == 77
    got = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0]
    )
    want = jax.tree_util.tree_leaves(
        convert_deepf_state(carrier.state_dict())
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _torch_gauss2(seed=0):
    """In-test torch replica of SuperPointNet_gauss2 (pytorch-superpoint
    models/SuperPointNet_gauss2.py + unet_parts.double_conv — the net
    train_good.py:224 instantiates), exposing its exact state-dict naming."""
    torch.manual_seed(seed)

    def double_conv(in_ch, out_ch):
        m = tnn.Module()
        m.conv = tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, 3, padding=1),
            tnn.BatchNorm2d(out_ch),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(out_ch, out_ch, 3, padding=1),
            tnn.BatchNorm2d(out_ch),
            tnn.ReLU(inplace=True),
        )
        m.forward = lambda x, _m=m: _m.conv(x)
        return m

    class Gauss2(tnn.Module):
        def __init__(self):
            super().__init__()
            c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
            det_h = 65
            self.relu = tnn.ReLU(inplace=True)
            self.pool = tnn.MaxPool2d(kernel_size=2, stride=2)
            # Real pytorch-superpoint nesting: inc = inconv whose .conv
            # is the double_conv module -> state-dict path inc.conv.conv.*
            self.inc = tnn.Module()
            self.inc.conv = double_conv(1, c1)
            self.inc.forward = lambda x, _m=self.inc: _m.conv(x)
            self.down1 = tnn.Module()
            self.down1.mpconv = tnn.Sequential(
                tnn.MaxPool2d(2), double_conv(c1, c2)
            )
            self.down2 = tnn.Module()
            self.down2.mpconv = tnn.Sequential(
                tnn.MaxPool2d(2), double_conv(c2, c3)
            )
            self.down3 = tnn.Module()
            self.down3.mpconv = tnn.Sequential(
                tnn.MaxPool2d(2), double_conv(c3, c4)
            )
            self.convPa = tnn.Conv2d(c4, c5, 3, stride=1, padding=1)
            self.bnPa = tnn.BatchNorm2d(c5)
            self.convPb = tnn.Conv2d(c5, det_h, 1, stride=1, padding=0)
            self.bnPb = tnn.BatchNorm2d(det_h)
            self.convDa = tnn.Conv2d(c4, c5, 3, stride=1, padding=1)
            self.bnDa = tnn.BatchNorm2d(c5)
            self.convDb = tnn.Conv2d(c5, d1, 1, stride=1, padding=0)
            self.bnDb = tnn.BatchNorm2d(d1)

        def forward(self, x):
            x1 = self.inc(x)
            x2 = self.down1.mpconv(x1)
            x3 = self.down2.mpconv(x2)
            x4 = self.down3.mpconv(x3)
            cPa = self.relu(self.bnPa(self.convPa(x4)))
            semi = self.bnPb(self.convPb(cPa))
            cDa = self.relu(self.bnDa(self.convDa(x4)))
            desc = self.bnDb(self.convDb(cDa))
            dn = torch.norm(desc, p=2, dim=1)
            desc = desc.div(torch.unsqueeze(dn, 1))
            return {"semi": semi, "desc": desc}

    net = Gauss2()
    # Non-trivial BN running stats so the import path is actually tested.
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(2, 1, 64, 64))
    net.eval()
    return net


@pytest.mark.slow
def test_superpoint_gauss2_forward_parity():
    """gauss2 .pth.tar weights -> flax SuperPointNetGauss2: forward match
    to 1e-4 (VERDICT round-1 item 2)."""
    from deepfepe_tpu.frontend import SuperPointNetGauss2
    from deepfepe_tpu.utils.torch_import import (
        convert_superpoint_gauss2_state,
    )

    tnet = _torch_gauss2(seed=5)
    variables = convert_superpoint_gauss2_state(
        {"module." + k: v for k, v in tnet.state_dict().items()}
    )

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(2, 64, 96, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = SuperPointNetGauss2().apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(ours["semi"]),
        ref["semi"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["desc"]),
        ref["desc"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )


def test_gauss2_checkpoint_auto_detect(tmp_path):
    """load_reference_checkpoint sniffs the gauss2 layout from .pth.tar."""
    from deepfepe_tpu.utils.torch_import import load_reference_checkpoint

    tnet = _torch_gauss2(seed=6)
    path = tmp_path / "superPointNet_100_checkpoint.pth.tar"
    torch.save(
        {"n_iter": 100, "model_state_dict": tnet.state_dict()}, path
    )
    variables, n_iter = load_reference_checkpoint(str(path))
    assert n_iter == 100
    assert "batch_stats" in variables
    assert "inc" in variables["params"]
    assert variables["params"]["convPb"]["kernel"].shape == (1, 1, 256, 65)
    assert variables["batch_stats"]["bnDb"]["mean"].shape == (256,)


def test_export_roundtrip_identity():
    """export_deepf_state is the exact inverse of convert_deepf_state:
    flax init -> torch layout -> flax again is bit-identical."""
    import jax

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.utils.torch_import import export_deepf_state

    net = DeepFNet(depth=2, image_size=(240, 320), if_quality=True)
    batch = SyntheticPairs(good_num=64, seed=0).batch(2)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        db,
    )
    sd = export_deepf_state(variables)
    assert any(k.endswith("fw.0.weight") for k in sd)
    back = convert_deepf_state(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_loads_into_live_reference_net(tmp_path):
    """save_reference_checkpoint output loads into the LIVE torch DeepFNet
    via its own pretrainedLoader path (strict state_dict match) and the
    two nets then agree on a forward pass — models trained HERE run in
    the reference stack."""
    import sys

    sys.path.insert(0, "tests")
    import jax

    from _reference_oracle import load_reference

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.utils.torch_import import save_reference_checkpoint

    ref = load_reference()
    H, W = 240, 320
    net_t = ref.DeepFNet(
        depth=2, image_size=[H, W, 3], if_quality=False,
        is_cuda=False, is_test=False, if_cpu_svd=False,
    )

    # Our net with matching IO sizes (if_quality=False -> 4-d input).
    net_j = DeepFNet(depth=2, image_size=(H, W), if_quality=False)
    batch = SyntheticPairs(good_num=128, seed=3).batch(2)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    db.pop("quality", None)
    variables = net_j.init(
        {"params": jax.random.PRNGKey(7), "sample": jax.random.PRNGKey(8)},
        db,
    )
    path = tmp_path / "exported.pth.tar"
    save_reference_checkpoint(variables, str(path), n_iter=42)

    ckpt = torch.load(path, weights_only=False)
    assert ckpt["n_iter"] == 42
    missing, unexpected = net_t.load_state_dict(
        ckpt["model_state_dict"], strict=False
    )
    assert not unexpected, unexpected
    # Only torch-side buffers/extras may be missing, never weights:
    assert not [m for m in missing if ".fw." in m], missing

    m = np.asarray(batch["matches_xy_ori"], np.float32)
    data_t = {
        "matches_xy_ori": torch.tensor(m),
        "matches_good_unique_nums": torch.full((2,), 128),
        "t_scene_scale": torch.ones(2, 1),
    }
    with torch.no_grad():
        preds_t = net_t(data_t)
    preds_j = net_j.apply(variables, db)
    F_t = (
        preds_t["T2"].transpose(1, 2) @ preds_t["F_est"] @ preds_t["T1"]
    ).numpy()
    F_j = np.asarray(
        jnp.swapaxes(preds_j["T2"], -1, -2)
        @ preds_j["F_est"] @ preds_j["T1"]
    )

    def canon(M):
        M = M / np.linalg.norm(M, axis=(-2, -1), keepdims=True)
        flat = M.reshape(M.shape[0], -1)
        idx = np.argmax(np.abs(flat), axis=-1)
        sign = np.sign(
            np.take_along_axis(flat, idx[:, None], axis=-1)
        )[:, :, None]
        return M * sign

    np.testing.assert_allclose(canon(F_t), canon(F_j), atol=5e-4)


@pytest.mark.slow
def test_superpoint_gauss2_export_roundtrip(tmp_path):
    """Symmetric SP checkpoint export (VERDICT r4 weak #5): our trained
    gauss2 variables -> reference .pth.tar -> (a) the torch
    SuperPointNet_gauss2 replica loads it strict and matches our
    forward; (b) re-import through the auto-detecting loader is
    bit-exact, INCLUDING the BN running statistics."""
    import os

    from flax import serialization

    from deepfepe_tpu.frontend import SuperPointNetGauss2
    from deepfepe_tpu.utils.torch_import import (
        load_reference_checkpoint,
        save_superpoint_checkpoint,
    )

    net = SuperPointNetGauss2()
    # The round-4 fine-tuned production frontend if present, else a
    # freshly initialized one with non-trivial stats.
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments/joint_fullres_train_qt3/"
        "superPoint_stage2_end_to_end.msgpack",
    )
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(2, 64, 96, 1)).astype(np.float32)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            variables = serialization.from_bytes(template, f.read())
    else:
        variables = template

    out = tmp_path / "sp_export.pth.tar"
    save_superpoint_checkpoint(variables, str(out), n_iter=77)

    # (a) strict load into the torch replica + forward parity.
    tnet = _torch_gauss2(seed=0)
    payload = torch.load(str(out), weights_only=False)
    assert payload["n_iter"] == 77
    missing = tnet.load_state_dict(
        {k: torch.as_tensor(v) for k, v in
         payload["model_state_dict"].items()}, strict=True
    )
    tnet.eval()
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = net.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours["semi"]),
        ref["semi"].numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["desc"]),
        ref["desc"].numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4,
    )

    # (b) bit-exact re-import, including running statistics.
    back, n_iter = load_reference_checkpoint(str(out), kind="auto")
    assert n_iter == 77
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    b_by_path = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(b_by_path[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p),
        )


def test_cli_export_torch_superpoint(tmp_path, monkeypatch):
    """`cli export_torch --superpoint`: msgpack frontend -> reference
    superPointNet .pth.tar, auto-detected by the importer."""
    from flax import serialization

    from deepfepe_tpu.cli import main
    from deepfepe_tpu.frontend import SuperPointNetGauss2
    from deepfepe_tpu.utils.torch_import import load_reference_checkpoint

    net = SuperPointNetGauss2()
    variables = net.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 64, 96, 1), jnp.float32)
    )
    src = tmp_path / "sp.msgpack"
    with open(src, "wb") as f:
        f.write(serialization.to_bytes(variables))
    out = tmp_path / "sp.pth.tar"
    main(["export_torch", "unused.yaml", str(src), str(out),
          "--superpoint", "--n_iter", "5"])
    back, n_iter = load_reference_checkpoint(str(out), kind="auto")
    assert n_iter == 5
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["inc"]["bn0"]["var"]),
        np.asarray(back["batch_stats"]["inc"]["bn0"]["var"]),
    )
