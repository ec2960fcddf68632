"""Golden tests for the geometry core against numpy/OpenCV oracles.

This follows the reference's oracle-based verification strategy (SURVEY.md §4):
estimates are checked against ground-truth E/F and OpenCV behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import synthetic_pair
from deepfepe_tpu import geometry as geo

cv2 = pytest.importorskip("cv2")


def test_homo_dehomo_roundtrip(rng):
    x = rng.randn(4, 10, 2).astype(np.float32)
    xh = geo.homo(jnp.asarray(x))
    assert xh.shape == (4, 10, 3)
    np.testing.assert_allclose(np.asarray(geo.dehomo(xh)), x, rtol=1e-6)


def test_skew_cross_equivalence(rng):
    t = rng.randn(5, 3).astype(np.float64)
    v = rng.randn(5, 3).astype(np.float64)
    out = np.asarray(geo.skew(jnp.asarray(t))) @ v[..., None]
    expected = np.cross(t, v)[..., None]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_rt_inverse(rng):
    from conftest import random_pose

    R, t = random_pose(rng)
    Rt = np.hstack([R, t[:, None]])
    inv = np.asarray(geo.rt_inverse(jnp.asarray(Rt)))
    T = np.vstack([Rt, [0, 0, 0, 1]])
    expected = np.linalg.inv(T)[:3]
    np.testing.assert_allclose(inv, expected, atol=1e-6)


def test_gt_F_zero_epipolar_error(rng):
    s = synthetic_pair(rng, n=100)
    d = geo.sym_epi_dist(
        jnp.asarray(s["F"], jnp.float64 if False else jnp.float32),
        jnp.asarray(s["x1"], jnp.float32),
        jnp.asarray(s["x2"], jnp.float32),
    )
    # Sub-pixel^2: gt geometry must give ~0 symmetric epipolar distance.
    assert float(jnp.mean(d)) < 1e-2


def test_epi_distance_matches_reference_numpy(rng):
    s = synthetic_pair(rng, n=50, noise=1.0)
    F, x1, x2 = s["F"], s["x1"], s["x2"]
    # Reference epi_distance_np (utils_F.py:363) single-sample formula.
    X = np.hstack([x1, np.ones((50, 1))])
    Y = np.hstack([x2, np.ones((50, 1))])
    nominator = np.abs(np.diag(Y @ F @ X.T))
    Fx1 = F @ X.T
    Fx2 = F.T @ Y.T
    d1 = nominator / np.sqrt(Fx1[0] ** 2 + Fx1[1] ** 2)
    d2 = nominator / np.sqrt(Fx2[0] ** 2 + Fx2[1] ** 2)
    expected = (d1 + d2) / 2.0

    mean_d, j1, j2 = geo.epi_distance(
        jnp.asarray(F, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(mean_d), expected, rtol=2e-3, atol=1e-4)


def test_R_to_q_roundtrip(rng):
    from conftest import random_pose

    Rs = np.stack([random_pose(rng, max_angle_deg=170)[0] for _ in range(16)])
    q = geo.R_to_q(jnp.asarray(Rs, jnp.float32))
    R_back = geo.q_to_R(q)
    np.testing.assert_allclose(np.asarray(R_back), Rs, atol=1e-5)
    # Unit norm, w >= 0.
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-6)
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_rotation_angle_error_matches_rodrigues(rng):
    from conftest import random_pose

    R0, _ = random_pose(rng, max_angle_deg=100)
    R1, _ = random_pose(rng, max_angle_deg=100)
    r, _ = cv2.Rodrigues(R0 @ R1.T)
    expected = np.linalg.norm(r) / np.pi * 180.0
    got = float(
        geo.rotation_angle_error(jnp.asarray(R0, jnp.float32), jnp.asarray(R1, jnp.float32))
    )
    assert abs(got - expected) < 1e-3


def test_decompose_E_contains_gt(rng):
    s = synthetic_pair(rng, n=64)
    dec = geo.decompose_E(jnp.asarray(s["E"], jnp.float32))
    R_gt, t_gt = s["R"], s["t"] / np.linalg.norm(s["t"])
    errs = [
        float(geo.rotation_angle_error(jnp.asarray(R_gt, jnp.float32), R))
        for R in (dec.R1, dec.R2)
    ]
    assert min(errs) < 0.1, errs
    t_err = min(
        np.linalg.norm(np.asarray(dec.t) - t_gt),
        np.linalg.norm(np.asarray(dec.t) + t_gt),
    )
    assert t_err < 1e-3


def test_recover_pose_picks_gt_candidate(rng):
    s = synthetic_pair(rng, n=128)
    K_inv = np.linalg.inv(s["K"])
    x1n = (np.hstack([s["x1"], np.ones((128, 1))]) @ K_inv.T)[:, :2]
    x2n = (np.hstack([s["x2"], np.ones((128, 1))]) @ K_inv.T)[:, :2]
    rec = geo.recover_pose(
        jnp.asarray(s["E"], jnp.float32),
        jnp.asarray(x1n, jnp.float32),
        jnp.asarray(x2n, jnp.float32),
    )
    err_R = float(
        geo.rotation_angle_error(rec.R, jnp.asarray(s["R"], jnp.float32))
    )
    t_gt = s["t"] / np.linalg.norm(s["t"])
    err_t = float(geo.vector_angle(rec.t, jnp.asarray(t_gt, jnp.float32)))
    assert err_R < 0.5
    assert err_t < 0.5
    assert float(rec.inlier_frac) > 0.95


def test_recover_pose_matches_opencv(rng):
    s = synthetic_pair(rng, n=100, noise=0.5)
    K = s["K"]
    # Estimate E with OpenCV from noisy points, then decompose both ways.
    E_cv, _ = cv2.findEssentialMat(
        s["x1"], s["x2"], focal=K[0, 0], pp=(K[0, 2], K[1, 2]), method=cv2.RANSAC
    )
    E_cv = E_cv[:3]
    _, R_cv, t_cv, _ = cv2.recoverPose(
        E_cv, s["x1"], s["x2"], focal=K[0, 0], pp=(K[0, 2], K[1, 2])
    )
    K_inv = np.linalg.inv(K)
    xh = lambda x: np.hstack([x, np.ones((len(x), 1))]) @ K_inv.T
    rec = geo.recover_pose(
        jnp.asarray(E_cv, jnp.float32),
        jnp.asarray(xh(s["x1"])[:, :2], jnp.float32),
        jnp.asarray(xh(s["x2"])[:, :2], jnp.float32),
    )
    err_R = float(geo.rotation_angle_error(rec.R, jnp.asarray(R_cv, jnp.float32)))
    err_t = float(geo.vector_angle(rec.t, jnp.asarray(t_cv[:, 0], jnp.float32)))
    assert err_R < 0.5
    assert err_t < 1.0


def test_correct_matches_parity_with_opencv(rng):
    s = synthetic_pair(rng, n=0)
    F = s["F"]
    p1, p2 = geo.virtual_grid((376, 1241))
    p1_np = np.asarray(p1, np.float64)
    p2_np = np.asarray(p2, np.float64)
    # OpenCV oracle (args swapped as in the reference get_virt_x1x2 :201:
    # correctMatches(F, pts2, pts1) -> (pts1_virt, pts2_virt)).
    c1_cv, c2_cv = cv2.correctMatches(F, p2_np[None], p1_np[None])
    x1c, x2c = geo.correct_matches(
        jnp.asarray(F, jnp.float32),
        jnp.asarray(p2_np, jnp.float32),
        jnp.asarray(p1_np, jnp.float32),
        iters=10,
    )
    np.testing.assert_allclose(np.asarray(x1c), c1_cv[0], atol=0.15)
    np.testing.assert_allclose(np.asarray(x2c), c2_cv[0], atol=0.15)


def test_virtual_points_satisfy_gt_epipolar_constraint(rng):
    s = synthetic_pair(rng, n=0)
    F32 = jnp.asarray(s["F"], jnp.float32)
    p1v, p2v = geo.get_virtual_points(F32, (376, 1241))
    # Loss sanity invariant of the reference (README "gt should always be 1"):
    # epi residual of virtual points vs gt F must vanish.
    d = geo.compute_epi_residual(p1v, p2v, F32, clamp_at=1e9)
    assert float(jnp.mean(d)) < 5e-2


def test_E_F_from_Rt_consistency(rng):
    s = synthetic_pair(rng, n=32)
    E, F = geo.E_F_from_Rt(
        jnp.asarray(s["R"], jnp.float32),
        jnp.asarray(s["t"], jnp.float32),
        jnp.asarray(s["K"], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(E), s["E"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(F), s["F"], atol=1e-6)


def test_decompose_E_closed_form_matches_svd(rng):
    s = synthetic_pair(rng, n=32)
    E32 = jnp.asarray(s["E"], jnp.float32)
    dec_cf = geo.decompose_E_closed_form(E32)
    dec_ev = geo.decompose_E(E32)
    # Same candidate sets (R1/R2 may swap with t sign conventions; compare
    # as sets via rotation angle).
    def rot_close(A, B):
        return float(geo.rotation_angle_error(A, B)) < 0.1

    assert rot_close(dec_cf.R1, dec_ev.R1) or rot_close(dec_cf.R1, dec_ev.R2)
    assert rot_close(dec_cf.R2, dec_ev.R1) or rot_close(dec_cf.R2, dec_ev.R2)
    t_err = min(
        float(jnp.linalg.norm(dec_cf.t - dec_ev.t)),
        float(jnp.linalg.norm(dec_cf.t + dec_ev.t)),
    )
    assert t_err < 1e-3

    # Exact orthogonality for a valid E.
    for R in (dec_cf.R1, dec_cf.R2):
        RtR = np.asarray(R @ jnp.swapaxes(R, -1, -2))
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)

    # Gradients finite ON the degenerate manifold (the whole point).
    def loss(E):
        d = geo.decompose_E_closed_form(E)
        return jnp.sum(d.R1**2) + jnp.sum(d.t**2)

    g = jax.grad(loss)(E32)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_homography_dlt(rng):
    H_true = np.array(
        [[1.05, 0.02, 8.0], [-0.01, 0.98, -5.0], [1e-4, -5e-5, 1.0]]
    )
    x1 = rng.rand(3, 40, 2) * 200
    x1h = np.concatenate([x1, np.ones((3, 40, 1))], -1)
    x2h = x1h @ H_true.T
    x2 = x2h[..., :2] / x2h[..., 2:3]

    H_est = geo.homography_from_points(
        jnp.asarray(x1, jnp.float64), jnp.asarray(x2, jnp.float64)
    )
    for b in range(3):
        np.testing.assert_allclose(np.asarray(H_est[b]), H_true, atol=1e-6)

    err = geo.homography_transfer_error(
        H_est, jnp.asarray(x1, jnp.float64), jnp.asarray(x2, jnp.float64)
    )
    assert float(jnp.max(err)) < 1e-5

    # Weighted: outliers downweighted to zero recovers H.
    x2_noisy = x2.copy()
    x2_noisy[:, :10] += 50.0
    w = np.ones((3, 40))
    w[:, :10] = 0.0
    H_w = geo.homography_from_points(
        jnp.asarray(x1, jnp.float64), jnp.asarray(x2_noisy, jnp.float64),
        weights=jnp.asarray(w),
    )
    for b in range(3):
        np.testing.assert_allclose(np.asarray(H_w[b]), H_true, atol=1e-5)
