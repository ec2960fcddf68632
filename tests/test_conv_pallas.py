"""Fused conv kernel + functional SuperPoint forward parity.

Covers ops/pallas/conv_pallas.py (values and all four gradients vs the
XLA reference, interpret mode) and frontend/sp_pallas.py (fused
functional forward vs the flax modules, forward and backward), plus the
run_superpoint conv_backend routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfepe_tpu.frontend.pipeline import FrontendParams, run_superpoint
from deepfepe_tpu.frontend.sp_pallas import superpoint_forward_fused
from deepfepe_tpu.frontend.superpoint import (
    SuperPointNet,
    SuperPointNetGauss2,
)
from deepfepe_tpu.ops.pallas.conv_pallas import (
    conv3x3_affine_relu,
    conv3x3_affine_relu_ref,
)


@pytest.mark.parametrize(
    "shape",
    [(2, 13, 17, 1, 64), (1, 16, 32, 64, 64), (3, 9, 21, 5, 8)],
    ids=["cin1_pad", "aligned64", "odd_small"],
)
def test_kernel_value_and_grad_parity(shape):
    B, H, W, Cin, C = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[1], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(ks[2], (3, 3, Cin, C), jnp.float32) * 0.1
    s = jax.random.normal(ks[3], (C,)) * 0.5 + 1.0
    t = jax.random.normal(ks[4], (C,)) * 0.1

    y1 = conv3x3_affine_relu(x, w, s, t, backend="pallas")
    y0 = conv3x3_affine_relu_ref(x, w, s, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-5)

    cot = jax.random.normal(ks[1], (B, H, W, C))
    g1 = jax.grad(
        lambda *a: jnp.sum(conv3x3_affine_relu(*a, backend="pallas") * cot),
        (0, 1, 2, 3),
    )(x, w, s, t)
    g0 = jax.grad(
        lambda *a: jnp.sum(conv3x3_affine_relu_ref(*a) * cot), (0, 1, 2, 3)
    )(x, w, s, t)
    for name, a, b in zip("dx dw ds dt".split(), g1, g0):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, (name, rel)


@pytest.mark.parametrize(
    "shape",
    [(1, 16, 32, 64, 64), (2, 10, 20, 64, 128), (1, 8, 14, 4, 8)],
    ids=["c64", "c64to128", "tiny_even"],
)
def test_s2d_value_and_grad_parity(shape):
    """Space-to-depth-by-2 conv == reference conv (values + all grads).

    The s2d backend is OPT-IN (DEEPFEPE_SP_CONV_IMPL=s2d): it wins
    isolated (96.8% vs 22% MXU on the v5e) but the [*,W,64]<->[*,W/2,128]
    layout shuffles erase the win in the full encoder graph on the
    current axon XLA (ROADMAP round-4 compute-floor table), so XLA native
    stays the production default. These parity tests keep the backend
    exact for future XLA layout-assignment versions; the pack is linear
    so autodiff must route dW_s2d back to the exact dW."""
    B, H, W, Cin, C = shape
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[1], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(ks[2], (3, 3, Cin, C), jnp.float32) * 0.1
    s = jax.random.normal(ks[3], (C,)) * 0.5 + 1.0
    t = jax.random.normal(ks[4], (C,)) * 0.1

    y1 = conv3x3_affine_relu(x, w, s, t, backend="s2d")
    y0 = conv3x3_affine_relu_ref(x, w, s, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-5)

    cot = jax.random.normal(ks[1], (B, H, W, C))
    g1 = jax.grad(
        lambda *a: jnp.sum(conv3x3_affine_relu(*a, backend="s2d") * cot),
        (0, 1, 2, 3),
    )(x, w, s, t)
    g0 = jax.grad(
        lambda *a: jnp.sum(conv3x3_affine_relu_ref(*a) * cot), (0, 1, 2, 3)
    )(x, w, s, t)
    for name, a, b in zip("dx dw ds dt".split(), g1, g0):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, (name, rel)


def test_s2d_block_helpers_match_plain_ops(rng):
    """The s2d-native block helpers (conv on pre-s2d tensors, s2d pool,
    to/from reinterpretation) == their plain-layout counterparts — the
    building blocks of the per-block s2d route (kept opt-in; ROADMAP
    round-4 §full-res)."""
    import flax.linen as nn

    from deepfepe_tpu.ops.pallas.conv_pallas import (
        conv3x3_affine_relu_s2d_pre,
        from_s2d,
        max_pool_2x2_s2d,
        to_s2d,
    )

    x = jnp.asarray(rng.rand(2, 16, 24, 64).astype(np.float32))
    # to/from round trip is exact.
    np.testing.assert_array_equal(
        np.asarray(from_s2d(to_s2d(x))), np.asarray(x)
    )
    # s2d pool == plain 2x2 max pool.
    p_ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    p_s2d = from_s2d(max_pool_2x2_s2d(to_s2d(x)))
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_s2d))
    # s2d-native conv == reference conv (values + w/s/b grads).
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    t = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    y_ref = conv3x3_affine_relu_ref(x, w, s, t)
    y_s2d = from_s2d(conv3x3_affine_relu_s2d_pre(to_s2d(x), w, s, t))
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), atol=5e-5
    )
    cot = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
    g_ref = jax.grad(
        lambda *a: jnp.sum(conv3x3_affine_relu_ref(*a) * cot), (1, 2, 3)
    )(x, w, s, t)
    g_s2d = jax.grad(
        lambda x_, w_, s_, t_: jnp.sum(
            from_s2d(conv3x3_affine_relu_s2d_pre(
                to_s2d(x_), w_, s_, t_)) * cot
        ), (1, 2, 3),
    )(x, w, s, t)
    for a, b in zip(g_s2d, g_ref):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4


def test_s2d_odd_width_falls_back():
    """Odd width cannot s2d; the dispatcher must fall back to XLA."""
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[1], (1, 8, 15, 64), jnp.float32)
    w = jax.random.normal(ks[2], (3, 3, 64, 64), jnp.float32) * 0.1
    s = jnp.ones((64,))
    t = jnp.zeros((64,))
    y1 = conv3x3_affine_relu(x, w, s, t, backend="s2d")
    y0 = conv3x3_affine_relu_ref(x, w, s, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-5)


def test_kernel_need_dx_false_zero_input_grad():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (1, 12, 20, 1), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 1, 8), jnp.float32)
    s = jnp.ones((8,))
    t = jnp.zeros((8,))
    g = jax.grad(
        lambda x: jnp.sum(
            conv3x3_affine_relu(x, w, s, t, need_dx=False, backend="pallas")
        )
    )(x)
    assert float(jnp.abs(g).max()) == 0.0
    # and the weight grad is still exact
    gw1 = jax.grad(
        lambda w: jnp.sum(
            conv3x3_affine_relu(x, w, s, t, need_dx=False, backend="pallas")
        )
    )(w)
    gw0 = jax.grad(
        lambda w: jnp.sum(conv3x3_affine_relu_ref(x, w, s, t))
    )(w)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), rtol=1e-5,
                               atol=1e-5)


def _randomized_variables(net, x, seed=2):
    v = net.init(jax.random.PRNGKey(1), x)
    if "batch_stats" in v:
        leaves, treedef = jax.tree_util.tree_flatten(v["batch_stats"])
        ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        leaves = [
            jnp.abs(l + 0.3 * jax.random.normal(kk, l.shape)) + 0.05
            for l, kk in zip(leaves, ks)
        ]
        v = dict(v)
        v["batch_stats"] = jax.tree_util.tree_unflatten(treedef, leaves)
    return v


@pytest.mark.parametrize("cls", [SuperPointNetGauss2, SuperPointNet],
                         ids=["gauss2", "plain"])
def test_fused_forward_matches_flax(cls):
    net = cls(dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 64, 1))
    v = _randomized_variables(net, x)
    o0 = net.apply(v, x)
    o1 = superpoint_forward_fused(net, v, x)
    for k in ("semi", "desc"):
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                   atol=2e-6)


def test_fused_forward_param_grads_match_flax():
    net = SuperPointNetGauss2(dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 48, 1))
    v = _randomized_variables(net, x)
    cot_semi = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 6, 65))
    # Random desc cotangent: sum(desc**2) is CONSTANT for unit-normalized
    # descriptors, which made the desc-head gradients mathematically zero
    # and the relative comparison a roundoff-noise diff.
    cot_desc = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 6, 256))

    def loss_flax(params):
        o = net.apply({"params": params, "batch_stats": v["batch_stats"]}, x)
        return jnp.sum(o["semi"] * cot_semi) + jnp.sum(o["desc"] * cot_desc)

    def loss_fused(params):
        o = superpoint_forward_fused(
            net, {"params": params, "batch_stats": v["batch_stats"]}, x
        )
        return jnp.sum(o["semi"] * cot_semi) + jnp.sum(o["desc"] * cot_desc)

    g0 = jax.grad(loss_flax)(v["params"])
    g1 = jax.grad(loss_fused)(v["params"])
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): l
             for p, l in jax.tree_util.tree_leaves_with_path(g1)}
    for path, a in flat0:
        b = flat1[jax.tree_util.keystr(path)]
        denom = float(jnp.abs(a).max()) + 1e-6
        rel = float(jnp.abs(a - b).max()) / denom
        assert rel < 1e-4, (jax.tree_util.keystr(path), rel)


def test_run_superpoint_fused_routing_matches_flax():
    net = SuperPointNetGauss2(dtype=jnp.float32)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 64))
    v = _randomized_variables(net, imgs[..., None])
    fp0 = FrontendParams(out_num_points=50, conf_thresh=1e-4,
                         conv_backend="flax")
    fp1 = FrontendParams(out_num_points=50, conf_thresh=1e-4,
                         conv_backend="fused")
    k0 = run_superpoint(net, v, imgs, fp0)
    k1 = run_superpoint(net, v, imgs, fp1)
    np.testing.assert_allclose(np.asarray(k1.xy), np.asarray(k0.xy))
    np.testing.assert_allclose(np.asarray(k1.desc), np.asarray(k0.desc),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(k1.valid), np.asarray(k0.valid))
