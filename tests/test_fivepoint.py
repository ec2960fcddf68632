"""TPU-native Nister 5-point solver tests (geometry/fivepoint.py).

Oracle strategy per SURVEY.md §4: exact-geometry ground truth; the
reference's counterpart is cv2.findEssentialMat (utils_opencv.py:129).
"""

import numpy as np

import jax
import jax.numpy as jnp

from deepfepe_tpu.eval import ransac_e, ransac_e_batch
from deepfepe_tpu.geometry.fivepoint import five_point_candidates
import pytest


def _random_pose(rng, angle_deg):
    th = angle_deg * np.pi / 180
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
         [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = rng.randn(3)
    t /= np.linalg.norm(t)
    return R, t


def _project_pair(rng, R, t, n):
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)],
        -1,
    )
    X2 = X @ R.T + t
    return X[:, :2] / X[:, 2:], X2[:, :2] / X2[:, 2:]


def _E_gt(R, t):
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
    )
    E = tx @ R
    return E / np.linalg.norm(E)


def _E_err(E, Egt):
    E = E / max(np.linalg.norm(E), 1e-12)
    return min(np.linalg.norm(E - Egt), np.linalg.norm(E + Egt))


@pytest.mark.slow
def test_five_point_exact_recovery():
    rng = np.random.RandomState(3)
    for _ in range(4):
        R, t = _random_pose(rng, rng.uniform(1, 8))
        x1, x2 = _project_pair(rng, R, t, 5)
        Egt = _E_gt(R, t)
        cands = five_point_candidates(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
        E = np.asarray(cands.E)
        v = np.asarray(cands.valid)
        assert v.sum() >= 1
        best = min(_E_err(E[i], Egt) for i in range(10) if v[i])
        assert best < 2e-3


def test_five_point_candidates_satisfy_essential_constraints():
    # Every valid candidate must be (numerically) essential: det E = 0 and
    # 2 E Eᵀ E - tr(E Eᵀ) E = 0 — even the non-gt roots.
    rng = np.random.RandomState(11)
    R, t = _random_pose(rng, 4.0)
    x1, x2 = _project_pair(rng, R, t, 5)
    cands = five_point_candidates(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
    )
    E = np.asarray(cands.E, np.float64)
    for i in range(10):
        if not cands.valid[i]:
            continue
        Ei = E[i]
        assert abs(np.linalg.det(Ei)) < 5e-3
        tr = np.trace(Ei @ Ei.T)
        resid = 2 * Ei @ Ei.T @ Ei - tr * Ei
        assert np.linalg.norm(resid) < 5e-2


@pytest.mark.slow
def test_ransac_e_with_outliers():
    rng = np.random.RandomState(7)
    R, t = _random_pose(rng, 5.0)
    n = 200
    x1, x2 = _project_pair(rng, R, t, n)
    x1 += rng.randn(n, 2) * 5e-4  # ~0.5 px at f=1000
    x2 += rng.randn(n, 2) * 5e-4
    n_out = 60
    x2[:n_out] = np.stack(
        [rng.uniform(-0.5, 0.5, n_out), rng.uniform(-0.5, 0.5, n_out)], -1
    )
    Egt = _E_gt(R, t)
    res = ransac_e(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        jax.random.PRNGKey(0), num_hypotheses=64, threshold=2e-5,
    )
    assert int(res.num_inliers) > 0.5 * (n - n_out)
    assert _E_err(np.asarray(res.F), Egt) < 0.05
    # Inliers found among true inliers, not the corrupted block.
    mask = np.asarray(res.inlier_mask)
    assert mask[:n_out].mean() < 0.2


@pytest.mark.slow
def test_ransac_e_batch_shapes():
    rng = np.random.RandomState(9)
    B, n = 3, 64
    x1 = np.zeros((B, n, 2), np.float32)
    x2 = np.zeros((B, n, 2), np.float32)
    for b in range(B):
        R, t = _random_pose(rng, 3.0)
        x1[b], x2[b] = _project_pair(rng, R, t, n)
    res = ransac_e_batch(
        jnp.asarray(x1), jnp.asarray(x2), jax.random.PRNGKey(1),
        num_hypotheses=16,
    )
    assert res.F.shape == (B, 3, 3)
    assert res.inlier_mask.shape == (B, n)
    assert np.all(np.asarray(res.num_inliers) > 0.9 * n)


@pytest.mark.slow
def test_val_rt_five_point_baseline():
    # exps.five_point=true parity: the 5-pt baseline inside val_rt_batch
    # recovers pose on clean KITTI-scale synthetic pairs.
    from deepfepe_tpu.data.synthetic import SyntheticPairs
    from deepfepe_tpu.eval import val_rt_batch

    ds = SyntheticPairs(good_num=128, noise_px=0.2, outlier_frac=0.1, seed=5)
    b = {k: jnp.asarray(v) for k, v in ds.batch(4).items()}
    out = val_rt_batch(
        b["E_gts"], b["Ks"], b["matches_xy_ori"], b["E_gts"],
        b["delta_Rtijs_4_4"], ransac_key=jax.random.PRNGKey(2),
        ransac_hypotheses=256, five_point=True,
    )
    assert float(jnp.median(out["err_q_base"])) < 0.5
    assert float(jnp.median(out["err_t_base"])) < 5.0
    # gt sanity invariant unchanged.
    assert float(jnp.max(out["err_q_gt"])) < 1e-2
