"""Jacobi eigensolver tests: pure-JAX reference and the Pallas kernel
(interpreter mode on CPU) vs numpy eigh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfepe_tpu.ops.jacobi import jacobi_eigh


def _sym_batch(rng, b, n=9, cond=None):
    A = rng.randn(b, n, n).astype(np.float32)
    A = (A + A.transpose(0, 2, 1)) / 2
    return A


def _check_eigh(w, V, A, atol_w=1e-4, atol_v=2e-3):
    w_np, V_np = np.linalg.eigh(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(w), w_np, atol=atol_w)
    dots = np.abs(np.einsum("bij,bij->bj", np.asarray(V, np.float64), V_np))
    np.testing.assert_allclose(dots, 1.0, atol=atol_v)


def test_jacobi_eigh_matches_numpy(rng):
    A = _sym_batch(rng, 16)
    w, V = jacobi_eigh(jnp.asarray(A))
    _check_eigh(w, V, A)
    # Orthonormality.
    VtV = np.asarray(jnp.swapaxes(V, -1, -2) @ V)
    np.testing.assert_allclose(
        VtV, np.tile(np.eye(9), (16, 1, 1)), atol=1e-5
    )


def test_jacobi_eigh_near_degenerate(rng):
    # Repeated eigenvalues: decomposition must still reconstruct A.
    A = np.stack([np.diag([1.0, 1, 1, 2, 2, 3, 3, 3, 0]).astype(np.float32)])
    Q = np.linalg.qr(rng.randn(9, 9))[0].astype(np.float32)
    A = Q @ A[0] @ Q.T
    w, V = jacobi_eigh(jnp.asarray(A[None]))
    recon = np.asarray(V) @ np.apply_along_axis(np.diag, -1, np.asarray(w)) @ np.asarray(
        jnp.swapaxes(V, -1, -2)
    )
    np.testing.assert_allclose(recon[0], A, atol=1e-4)


@pytest.mark.slow
def test_eigh9_pallas_interpret_matches_jacobi(rng):
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.ops.pallas import eigh9_pallas

    A = _sym_batch(rng, 8)
    with pltpu.force_tpu_interpret_mode():
        w_p, V_p = eigh9_pallas(jnp.asarray(A), sweeps=7, tile=8)
    _check_eigh(w_p, V_p, A)
    w_j, V_j = jacobi_eigh(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_j), atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(V_p)), np.abs(np.asarray(V_j)), atol=1e-4
    )


def test_epi_residual_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.geometry.epipolar import compute_epi_residual
    from deepfepe_tpu.ops.pallas import epi_residual_pallas

    B, N = 2, 64
    p1 = rng.randn(B, N, 3).astype(np.float32)
    p2 = rng.randn(B, N, 3).astype(np.float32)
    p1[..., 2] = 1.0
    p2[..., 2] = 1.0
    F = rng.randn(B, 3, 3).astype(np.float32)
    ref = np.asarray(
        compute_epi_residual(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(F), 0.5)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            epi_residual_pallas(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(F), 0.5)
        )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_matcher_pallas_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.frontend.matching import mutual_nn_match
    from deepfepe_tpu.ops.pallas import mutual_nn_pallas

    B, K, D = 2, 32, 16
    d1 = rng.randn(B, K, D).astype(np.float32)
    d2 = rng.randn(B, K, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = np.ones((B, K), bool)
    with pltpu.force_tpu_interpret_mode():
        nn12, nn21, dist12, mutual = mutual_nn_pallas(
            jnp.asarray(d1), jnp.asarray(d2),
            jnp.asarray(valid), jnp.asarray(valid),
        )
    ref = mutual_nn_match(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid),
        jnp.asarray(valid), nn_thresh=10.0, num_matches=K,
    )
    # Same mutual pair set.
    got_pairs = {
        (b, int(nn12[b, i]), i)
        for b in range(B) for i in range(K) if bool(mutual[b, i])
    }
    ref_pairs = {
        (b, int(ref.idx2[b, j]), int(ref.idx1[b, j]))
        for b in range(B) for j in range(K) if bool(ref.valid[b, j])
    }
    assert got_pairs == ref_pairs


def test_matcher_pallas_negative_similarity_with_invalids(rng):
    """A valid pair whose best similarity is NEGATIVE must survive when
    invalid (padded) keypoints are present.

    Regression: descriptor-zeroing gave invalid rows similarity 0 with
    everything, so an all-negative-dot valid row lost its argmax to an
    invalid column and the mutual mask dropped the match. The kernel now
    applies an additive -1e9 mask in-kernel (matcher_pallas.py)."""
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.frontend.matching import mutual_nn_match

    B, K, D = 1, 16, 8
    # Construct descriptors so every cross dot-product is negative: put
    # d1 in the +e0 half-space and d2 in the -e0 half-space, with a
    # matched pair (0, 0) that is each other's (negative-dot) best.
    d1 = 0.05 * rng.randn(B, K, D).astype(np.float32)
    d1[..., 0] = 1.0
    d2 = 0.05 * rng.randn(B, K, D).astype(np.float32)
    d2[..., 0] = -1.0
    # Make pair (0,0) the clear mutual best: least-negative dot.
    d1[:, 0, 1] = 2.0
    d2[:, 0, 1] = 2.0
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = np.ones((B, K), bool)
    valid[:, K // 2:] = False  # half the keypoints are padding

    args = (jnp.asarray(d1), jnp.asarray(d2),
            jnp.asarray(valid), jnp.asarray(valid))
    ref = mutual_nn_match(*args, nn_thresh=2.0, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = mutual_nn_match(*args, nn_thresh=2.0, backend="pallas")

    def pairs(m):
        return {
            (b, int(m.idx1[b, k]), int(m.idx2[b, k]))
            for b in range(B) for k in range(m.valid.shape[1])
            if bool(m.valid[b, k])
        }

    assert (0, 0, 0) in pairs(ref)  # the scenario produced the pair at all
    assert pairs(got) == pairs(ref)


@pytest.mark.slow
def test_matcher_backend_parity_interpret(rng):
    """mutual_nn_match(backend='pallas') == backend='xla' end to end (match
    sets, indices, scores) at a standard threshold, interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.frontend.matching import mutual_nn_match

    B, K, D = 2, 48, 32
    # Correlated descriptors -> plenty of real mutual matches.
    base = rng.randn(B, K, D).astype(np.float32)
    noise = rng.randn(B, K, D).astype(np.float32) * 0.3
    d1 = base / np.linalg.norm(base, axis=-1, keepdims=True)
    d2p = base + noise
    perm = rng.permutation(K)
    d2 = (d2p / np.linalg.norm(d2p, axis=-1, keepdims=True))[:, perm]
    valid1 = rng.rand(B, K) > 0.1
    valid2 = rng.rand(B, K) > 0.1

    args = (jnp.asarray(d1), jnp.asarray(d2),
            jnp.asarray(valid1), jnp.asarray(valid2))
    ref = mutual_nn_match(*args, nn_thresh=0.9, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = mutual_nn_match(*args, nn_thresh=0.9, backend="pallas")

    def pairs(m):
        return {
            (b, int(m.idx1[b, k]), int(m.idx2[b, k]))
            for b in range(B) for k in range(m.valid.shape[1])
            if bool(m.valid[b, k])
        }

    assert pairs(got) == pairs(ref)
    # Scores agree on the kept matches (both sorted best-first).
    nv = int(np.sum(np.asarray(ref.valid)))
    np.testing.assert_allclose(
        np.sort(np.asarray(got.scores)[np.asarray(got.valid)]),
        np.sort(np.asarray(ref.scores)[np.asarray(ref.valid)]),
        atol=1e-6,
    )
    assert nv > 10  # the scenario actually produced matches


def test_matcher_pallas_scores_differentiable(rng):
    """The pallas backend's scores must carry gradients to the descriptors
    (they feed the joint-training match quality)."""
    from jax.experimental.pallas import tpu as pltpu

    from deepfepe_tpu.frontend.matching import mutual_nn_match

    B, K, D = 1, 16, 8
    d1 = rng.randn(B, K, D).astype(np.float32)
    d2 = d1 + 0.1 * rng.randn(B, K, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = jnp.ones((B, K), bool)

    def loss(a, backend):
        m = mutual_nn_match(
            a, jnp.asarray(d2), valid, valid, nn_thresh=0.9,
            backend=backend,
        )
        return jnp.sum(jnp.where(m.valid, m.scores, 0.0))

    g_x = jax.grad(lambda a: loss(a, "xla"))(jnp.asarray(d1))
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda a: loss(a, "pallas"))(jnp.asarray(d1))
    assert np.any(np.asarray(g_p) != 0)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-3
    )
