"""Fused Pallas PointNet-MLP kernel: parity with the flax ErrorEstimator.

Runs in interpret mode on the CPU backend (conftest forces it). All
comparisons are tolerance-based: the kernel is a bfloat16 formulation
(bf16 matmuls, f32 accumulation/statistics, bf16 backward transients), so
it matches the standard path to bf16 rounding, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfepe_tpu.models.error_estimator import ErrorEstimator
from deepfepe_tpu.ops.pallas.mlp_pallas import (
    fused_pointnet_mlp,
    reference_pointnet_mlp,
)

FEATS = (16, 24, 32, 24, 16)


def _params(rng, c_in, feats, out):
    Ws, gammas, betas = [], [], []
    c = c_in
    for f in feats:
        Ws.append(jnp.asarray(rng.randn(c, f) * 0.3, jnp.float32))
        gammas.append(jnp.asarray(rng.rand(f) + 0.5, jnp.float32))
        betas.append(jnp.asarray(rng.randn(f) * 0.1, jnp.float32))
        c = f
    Wf = jnp.asarray(rng.randn(c, out) * 0.3, jnp.float32)
    bf = jnp.asarray(rng.randn(out) * 0.1, jnp.float32)
    return Ws, gammas, betas, (Wf, bf)


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 50, 7), jnp.float32)
    Ws, gammas, betas, Wfbf = _params(rng, 7, FEATS, 1)
    out = fused_pointnet_mlp(x, Ws, gammas, betas, Wfbf)
    ref = reference_pointnet_mlp(x, Ws, gammas, betas, Wfbf)
    assert out.shape[:2] == (3, 50)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out[..., :1] - ref).max()) < 2e-2 * scale


@pytest.mark.slow
def test_gradients_match_reference_autodiff():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 40, 5), jnp.float32)
    Ws, gammas, betas, Wfbf = _params(rng, 5, FEATS, 1)

    def loss(fn, x, Ws, gammas, betas, Wfbf):
        o = fn(x, Ws, gammas, betas, Wfbf)
        return jnp.sum(jnp.sin(o[..., 0]))

    gf = jax.grad(
        lambda *a: loss(fused_pointnet_mlp, *a), argnums=(0, 1, 2, 3, 4)
    )(x, Ws, gammas, betas, Wfbf)
    gr = jax.grad(
        lambda *a: loss(reference_pointnet_mlp, *a), argnums=(0, 1, 2, 3, 4)
    )(x, Ws, gammas, betas, Wfbf)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        d = float(jnp.abs(a - b).max())
        s = float(jnp.abs(b).max()) + 1e-8
        # bf16 backward transients: coarse tolerance at these small dims.
        assert d / s < 1.5e-1, (a.shape, d / s)


def test_module_param_tree_identical_and_forward_close():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 40, 7), jnp.float32)
    m_std = ErrorEstimator(output_size=1, features=FEATS, dtype=jnp.bfloat16)
    m_fus = ErrorEstimator(
        output_size=1, features=FEATS, dtype=jnp.bfloat16, use_pallas=True
    )
    p_std = m_std.init(jax.random.PRNGKey(0), x)
    p_fus = m_fus.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_std) == jax.tree_util.tree_structure(
        p_fus
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.allclose(a, b)),
                               p_std, p_fus)
    )
    o_std = m_std.apply(p_std, x)
    o_fus = m_fus.apply(p_std, x)  # same params: checkpoint interchange
    scale = float(jnp.abs(o_std).max())
    assert float(jnp.abs(o_std - o_fus).max()) < 3e-2 * scale


def test_hidden_bias_gradient_is_exact_zero_in_fused():
    """InstanceNorm cancels hidden Dense biases; the kernel never reads
    them, so their gradient is exactly zero (the std path leaves bf16
    rounding crumbs there — the true mathematical gradient is zero)."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 30, 5), jnp.float32)
    m = ErrorEstimator(
        output_size=1, features=(8, 12), dtype=jnp.bfloat16, use_pallas=True
    )
    p = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda q: jnp.sum(m.apply(q, x)))(p)
    for i in range(2):
        assert float(jnp.abs(g["params"][f"Dense_{i}"]["bias"]).max()) == 0.0
    # The final Dense bias IS used and must receive gradient.
    assert float(jnp.abs(g["params"]["Dense_2"]["bias"]).max()) > 0.0


@pytest.mark.slow
def test_fused_in_deepfnet_trains():
    """One train step of DeepFNet with use_pallas_mlp compiles and yields
    finite loss/gradients (interpret mode)."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = 64
    cfg.model.depth = 2
    cfg.model.if_quality = True
    net = DeepFNet(
        depth=2, image_size=(376, 1241), if_quality=True,
        mlp_dtype=jnp.bfloat16, use_pallas_mlp=True,
    )
    tr = Trainer(net, cfg)
    ds = SyntheticPairs(good_num=64, seed=0)
    batch = ds.batch(8)
    tr.init_state(batch)
    state, m = tr.train_step(tr.state, batch, 0.1, 0.5)
    assert np.isfinite(float(m["loss"]))
