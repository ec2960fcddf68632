"""Numeric-parity tests for the batched eigensolver and weighted 8-point solve.

Oracles: numpy float64 SVD (what the reference's torch.svd computes) and
ground-truth geometry on synthetic pairs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from conftest import synthetic_pair
from deepfepe_tpu import geometry as geo
from deepfepe_tpu import ops
import pytest


def _sym(rng, b, n):
    A = rng.randn(b, n, n)
    return (A + A.transpose(0, 2, 1)) / 2


def test_safe_eigh_matches_numpy(rng):
    A = _sym(rng, 8, 9).astype(np.float32)
    w, V = ops.safe_eigh(jnp.asarray(A))
    w_np, V_np = np.linalg.eigh(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-4)
    # Eigenvectors up to sign; compare |dot| per column.
    dots = np.abs(np.einsum("bij,bij->bj", np.asarray(V, np.float64), V_np))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_safe_eigh_grad_finite_at_degeneracy(rng):
    # Matrix with an exactly repeated eigenvalue — torch.svd's backward NaNs
    # here (the reference's CPU-SVD workaround); ours must stay finite.
    A = np.diag([1.0, 1.0, 2.0]).astype(np.float32)[None]

    def loss(A):
        w, V = ops.safe_eigh(A)
        return jnp.sum(w * w) + jnp.sum(V[..., 0] ** 2 * jnp.arange(3.0))

    g = jax.grad(loss)(jnp.asarray(A))
    assert np.all(np.isfinite(np.asarray(g)))


def test_smallest_singular_vec_matches_svd(rng):
    X = rng.randn(4, 100, 9).astype(np.float32)
    v = ops.smallest_singular_vec_gram(jnp.asarray(X))
    for b in range(4):
        _, _, Vh = np.linalg.svd(X[b].astype(np.float64))
        v_ref = Vh[-1]
        dot = abs(np.dot(np.asarray(v)[b], v_ref))
        assert dot > 1 - 1e-4, dot


def test_rank2_projection(rng):
    F = rng.randn(6, 3, 3).astype(np.float32)
    F2 = np.asarray(ops.rank2_projection(jnp.asarray(F)))
    for b in range(6):
        s = np.linalg.svd(F2[b], compute_uv=False)
        s_ref = np.linalg.svd(F[b], compute_uv=False)
        assert s[2] < 1e-5 * s[0]
        np.testing.assert_allclose(s[:2], s_ref[:2], rtol=1e-4)


def test_project_E_110(rng):
    E = rng.randn(5, 3, 3).astype(np.float32)
    E110 = np.asarray(ops.project_E_110(jnp.asarray(E)))
    for b in range(5):
        s = np.linalg.svd(E110[b], compute_uv=False)
        np.testing.assert_allclose(s, [1.0, 1.0, 0.0], atol=1e-4)


@pytest.mark.slow
def test_weighted_eight_point_recovers_gt_F(rng):
    # Clean correspondences + uniform weights -> F must match gt up to scale.
    batch = []
    for _ in range(4):
        s = synthetic_pair(rng, n=256)
        batch.append(s)
    x1 = np.stack([s["x1"] for s in batch]).astype(np.float32)
    x2 = np.stack([s["x2"] for s in batch]).astype(np.float32)

    pts1_h, _ = geo.normalize_hw(jnp.asarray(x1), (376, 1241))
    pts2_h, _ = geo.normalize_hw(jnp.asarray(x2), (376, 1241))
    w = jnp.full((4, 256), 1.0 / 256)
    fit = ops.weighted_eight_point(pts1_h, pts2_h, w)

    # Check: estimated F (in HW-normalized coords) has ~zero epi distance on
    # the HW-normalized correspondences.
    d = geo.sym_epi_dist(fit.F, pts1_h, pts2_h, if_homo=True)
    assert float(jnp.mean(d)) < 1e-8

    # And the denormalized-back-to-pixels F matches gt direction.
    # f32 Gram-eigh noise floor is ~5e-3 in F direction (condition-number
    # squaring); the f64 eval path below is ~1e-9.
    T = geo.norm_hw_matrix((376, 1241))
    for b in range(4):
        F_pix = np.asarray(T.T @ fit.F[b] @ T, np.float64)
        F_gt = batch[b]["F"]
        F_pix /= np.linalg.norm(F_pix)
        F_gt = F_gt / np.linalg.norm(F_gt)
        err = min(np.linalg.norm(F_pix - F_gt), np.linalg.norm(F_pix + F_gt))
        assert err < 2e-2, err

    # float64 precision path (eval): near-exact recovery (points kept f64
    # end-to-end; the f32 `x1` above already lost ~1e-4 of F direction).
    x1_64 = np.stack([s["x1"] for s in batch])
    x2_64 = np.stack([s["x2"] for s in batch])
    pts1_h64, _ = geo.normalize_hw(jnp.asarray(x1_64, jnp.float64), (376, 1241))
    pts2_h64, _ = geo.normalize_hw(jnp.asarray(x2_64, jnp.float64), (376, 1241))
    fit64 = ops.weighted_eight_point(pts1_h64, pts2_h64, w.astype(jnp.float64))
    T64 = np.asarray(geo.norm_hw_matrix((376, 1241), dtype=jnp.float64))
    for b in range(4):
        F_pix = np.array(T64.T @ fit64.F[b] @ T64)
        F_gt = batch[b]["F"]
        F_pix /= np.linalg.norm(F_pix)
        F_gt = F_gt / np.linalg.norm(F_gt)
        err = min(np.linalg.norm(F_pix - F_gt), np.linalg.norm(F_pix + F_gt))
        assert err < 1e-6, err


def test_weighted_eight_point_downweights_outliers(rng):
    s = synthetic_pair(rng, n=200, noise=0.1, outlier_frac=0.3)
    x1 = s["x1"].astype(np.float32)[None]
    x2 = s["x2"].astype(np.float32)[None]
    pts1_h, _ = geo.normalize_hw(jnp.asarray(x1), (376, 1241))
    pts2_h, _ = geo.normalize_hw(jnp.asarray(x2), (376, 1241))

    # Oracle weights: epipolar distance of gt F in pixel space.
    d = np.asarray(
        geo.epi_distance(
            jnp.asarray(s["F"], jnp.float32),
            jnp.asarray(x1[0], jnp.float32),
            jnp.asarray(x2[0], jnp.float32),
        )[0]
    )
    w_oracle = (d < 1.0).astype(np.float32)
    w_oracle /= w_oracle.sum()
    fit = ops.weighted_eight_point(pts1_h, pts2_h, jnp.asarray(w_oracle)[None])
    T = geo.norm_hw_matrix((376, 1241))
    F_pix = np.asarray(T.T @ fit.F[0] @ T, np.float64)
    F_pix /= np.linalg.norm(F_pix)
    F_gt = s["F"] / np.linalg.norm(s["F"])
    err = min(np.linalg.norm(F_pix - F_gt), np.linalg.norm(F_pix + F_gt))
    assert err < 5e-2, err


@pytest.mark.slow
def test_weighted_eight_point_differentiable(rng):
    s = synthetic_pair(rng, n=64, noise=0.5)
    pts1_h, _ = geo.normalize_hw(jnp.asarray(s["x1"][None], jnp.float32), (376, 1241))
    pts2_h, _ = geo.normalize_hw(jnp.asarray(s["x2"][None], jnp.float32), (376, 1241))

    def loss(logits):
        w = jax.nn.softmax(logits, axis=-1)
        fit = ops.weighted_eight_point(pts1_h, pts2_h, w)
        return jnp.sum(jnp.abs(fit.residual)) + jnp.sum(fit.F**2)

    g = jax.grad(loss)(jnp.zeros((1, 64)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.slow
def test_sample_scores_no_overflow_with_concentrated_weights():
    """prod(w*1000) overflows f32 once the softmax concentrates; the
    log-space score must stay finite and equal the normalized product
    (models/sample_fit.py — NaN observed on the synthetic ablation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepfepe_tpu.models.sample_fit import sample_loss_fits

    rng = np.random.RandomState(0)
    B, N = 2, 100
    pts1 = jnp.asarray(
        np.concatenate([rng.rand(B, N, 2) * 2 - 1, np.ones((B, N, 1))], -1),
        jnp.float32,
    )
    pts2 = jnp.asarray(
        np.concatenate([rng.rand(B, N, 2) * 2 - 1, np.ones((B, N, 1))], -1),
        jnp.float32,
    )
    # Concentrated weights: a few points carry ~0.2 each.
    logits = np.full((B, N), -8.0, np.float32)
    logits[:, :5] = 2.0
    w = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    out = sample_loss_fits(
        pts1, pts2, w, jnp.full((B,), N), jax.random.PRNGKey(0),
        topk=20, selects=16,
    )
    s = np.asarray(out["sample_scores"])
    assert np.all(np.isfinite(s))
    assert np.allclose(s.sum(-1), 1.0, atol=1e-5)
    # Gradient through the scores is finite too.
    def f(w):
        o = sample_loss_fits(
            pts1, pts2, w, jnp.full((B,), N), jax.random.PRNGKey(0),
            topk=20, selects=16,
        )
        return jnp.sum(o["sample_scores"] * jnp.sum(o["F_samples"], (-1, -2)))
    g = jax.grad(f)(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_weighted_eight_point_degenerate_duplicate_subset():
    """A minimal subset collapsed to copies of ONE correspondence (what
    categorical sampling produces once the weight softmax concentrates)
    must keep finite forward values and finite gradients. Regression for
    the sample-loss NaN at ablation iter ~400: sqrt'(0) = inf inside
    Hartley normalization, plus an unbounded 1/meandist scale."""
    p1 = jnp.tile(jnp.array([0.3, -0.2, 1.0]), (1, 20, 1))
    p2 = jnp.tile(jnp.array([0.31, -0.19, 1.0]), (1, 20, 1))
    w = jnp.full((1, 20), 0.05)

    def loss(p1, p2, w):
        fit = ops.weighted_eight_point(p1, p2, w)
        return jnp.sum(fit.F**2) + jnp.sum(fit.residual**2)

    val = loss(p1, p2, w)
    assert np.isfinite(float(val))
    grads = jax.grad(loss, argnums=(0, 1, 2))(p1, p2, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_compute_epi_residual_grad_finite_zero_row_F():
    """A rank-deficient sampled-subset fit can return an F with zero rows
    (only the last row populated), making F·x1 exactly the zero vector.
    norm's VJP at 0 is NaN and survives the clamp's zero cotangent
    (0 * NaN = NaN) — the actual gradient-NaN at sample-loss iter 333.
    compute_epi_residual must use a zero-safe norm."""
    from deepfepe_tpu.geometry.epipolar import compute_epi_residual

    F = jnp.array(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.4e6, 1.3e5, -3.0e5]]
    )
    rng = np.random.RandomState(0)
    p1 = jnp.asarray(np.concatenate([rng.uniform(-1, 1, (50, 2)),
                                     np.ones((50, 1))], -1), jnp.float32)
    p2 = jnp.asarray(np.concatenate([rng.uniform(-1, 1, (50, 2)),
                                     np.ones((50, 1))], -1), jnp.float32)

    def f(F):
        return jnp.mean(compute_epi_residual(p1, p2, F, clamp_at=0.02))

    val = f(F)
    assert np.isfinite(float(val))
    g = jax.grad(f)(F)
    assert np.isfinite(np.asarray(g)).all(), np.asarray(g)


@pytest.mark.slow
def test_sample_loss_fits_grad_finite_one_hot_weights():
    """End-to-end sample-loss fan-out under a near-one-hot weight softmax:
    every sampled subset is ~20 copies of the same point; gradients back to
    the logits must stay finite."""
    from deepfepe_tpu.models.sample_fit import sample_loss_fits

    N = 128
    key = jax.random.PRNGKey(0)
    pts1 = (
        jax.random.uniform(key, (2, N, 3), minval=-1, maxval=1)
        .at[..., 2].set(1.0)
    )
    pts2 = (
        pts1
        + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (2, N, 3))
        .at[..., 2].set(0.0)
    )
    logits = jnp.zeros((2, N)).at[:, 0].set(40.0)
    unique = jnp.full((2,), N)

    def f(logits):
        w = jax.nn.softmax(logits, axis=-1)
        out = sample_loss_fits(
            pts1, pts2, w, unique, jax.random.PRNGKey(2)
        )
        return (
            jnp.sum(jnp.clip(out["F_samples"] ** 2, 0, 1.0))
            + jnp.sum(out["sample_scores"])
        )

    v, g = jax.value_and_grad(f)(logits)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()


def test_eigh_auto_method_resolution(rng, monkeypatch):
    # 'auto' picks the Pallas 9x9 kernel only on TPU at large flattened
    # batch (bench_eigh_shapes.log: 5.5x over jacobi at fan-out shapes);
    # jacobi everywhere else, including CPU test runs like this one.
    from deepfepe_tpu.ops import eigh as eigh_mod

    A9 = jnp.zeros((512, 9, 9))
    assert eigh_mod._resolve_method(A9, "auto") == "jacobi"  # CPU backend
    assert eigh_mod._resolve_method(A9, "xla") == "xla"  # explicit wins

    monkeypatch.setattr(
        eigh_mod.jax, "default_backend", lambda: "tpu", raising=True
    )
    assert eigh_mod._resolve_method(A9, "auto") == "pallas"
    assert eigh_mod._resolve_method(jnp.zeros((8, 9, 9)), "auto") == "jacobi"
    assert eigh_mod._resolve_method(jnp.zeros((512, 3, 3)), "auto") == "jacobi"
    # safe_eigh under the default method stays correct on CPU.
    A = jnp.asarray(rng.randn(4, 9, 9).astype(np.float32))
    A = (A + jnp.swapaxes(A, -1, -2)) / 2
    w, V = ops.safe_eigh(A)
    np.testing.assert_allclose(
        np.asarray(A @ V), np.asarray(V * w[..., None, :]), atol=1e-4
    )
