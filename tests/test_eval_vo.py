"""Eval-stack parity tests.

The strongest oracle available: the reference repo commits both the exported
trajectories (results/*/09.txt, 10.txt) and the metric reports
(results/*/09/result.txt) produced by kitti-odom-eval. Our re-implemented
metrics must reproduce those numbers from the same inputs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import synthetic_pair
from deepfepe_tpu import eval as ev
from deepfepe_tpu import geometry as geo

REF = "/root/reference"
GT_DIR = f"{REF}/deepFEPE/deepFEPE/datasets/kitti_gt_poses"


def _gt_poses_path():
    for cand in (
        f"{REF}/deepFEPE/datasets/kitti_gt_poses",
        f"{REF}/deepFEPE/deepFEPE/datasets/kitti_gt_poses",
    ):
        if os.path.isdir(cand):
            return cand
    pytest.skip("reference gt poses not found")


def _parse_result_txt(path):
    vals = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                key = parts[0].strip().rstrip(":").strip()
                try:
                    vals[key] = float(parts[-1])
                except ValueError:
                    pass
    return vals


@pytest.mark.parametrize("model,seq", [
    ("deepF_kitti", "09"), ("deepF_kitti", "10"),
    ("deepFEPE_kitti", "09"), ("deepFEPE_kitti", "10"),
])
def test_kitti_metrics_reproduce_reference_results(model, seq):
    gt_dir = _gt_poses_path()
    est_path = f"{REF}/results/{model}/{seq}/{seq}.txt"
    res_path = f"{REF}/results/{model}/{seq}/result.txt"
    if not os.path.isfile(est_path):
        pytest.skip("committed trajectory not found")
    gt = ev.load_poses_txt(f"{gt_dir}/{seq}.txt")
    est = ev.load_poses_txt(est_path)
    ref = _parse_result_txt(res_path)

    got = ev.evaluate_sequence(gt, est, align="scale")
    assert abs(got["trans_err_pct"] - ref["Trans. err. (%)"]) < 5e-3, got
    assert abs(got["rot_err_deg_per_100m"] - ref["Rot. err. (deg/100m)"]) < 5e-3, got
    assert abs(got["ATE_m"] - ref["ATE (m)"]) < 5e-3, got
    assert abs(got["RPE_m"] - ref["RPE (m)"]) < 5e-3, got
    assert abs(got["RPE_deg"] - ref["RPE (deg)"]) < 5e-3, got


def test_chain_relative_poses_roundtrip(rng):
    from conftest import random_pose

    # Build a gt trajectory, derive relative poses, chain them back.
    abs_poses = [np.eye(4)]
    for _ in range(10):
        R, t = random_pose(rng, max_angle_deg=5)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        abs_poses.append(abs_poses[-1] @ T)
    abs_poses = np.stack(abs_poses)

    # relative i->i+1 transform in the framework convention:
    # x_{i+1} = T_rel x_i  =>  T_rel = inv(abs_{i+1}) @ abs_i
    rels = np.stack(
        [np.linalg.inv(abs_poses[i + 1]) @ abs_poses[i] for i in range(10)]
    )
    chained = ev.chain_relative_poses(rels)
    np.testing.assert_allclose(chained, abs_poses, atol=1e-8)


def test_snippet_ate_zero_for_perfect(rng):
    from conftest import random_pose

    abs_poses = [np.eye(4)[:3]]
    T_acc = np.eye(4)
    for _ in range(12):
        R, t = random_pose(rng, max_angle_deg=3)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        T_acc = T_acc @ T
        abs_poses.append(T_acc[:3].copy())
    poses = np.stack(abs_poses)
    res = ev.pose_seq_ate(poses, poses, seq_length=5)
    assert res["mean"][0] < 1e-6
    assert res["mean"][1] < 1e-6


def test_ransac_f_rejects_outliers(rng):
    s = synthetic_pair(rng, n=256, noise=0.5, outlier_frac=0.4)
    res = ev.ransac_f(
        jnp.asarray(s["x1"], jnp.float32),
        jnp.asarray(s["x2"], jnp.float32),
        jax.random.PRNGKey(0),
        num_hypotheses=512,
        threshold=1.5,
    )
    # Should find most true inliers (60% of points).
    assert int(res.num_inliers) > 0.45 * 256
    # Estimated F should be closer to gt than chance: check mean epi distance
    # of the true inliers under the estimated F.
    mask_true = np.ones(256, bool)
    d = np.asarray(
        geo.epi_distance(
            res.F,
            jnp.asarray(s["x1"], jnp.float32),
            jnp.asarray(s["x2"], jnp.float32),
        )[0]
    )
    assert np.median(d) < 2.0


def test_val_rt_gt_sanity(rng):
    # The reference invariant: evaluating with gt E must give ~0 errors.
    pairs = [synthetic_pair(rng, n=128, noise=0.2) for _ in range(3)]
    E = jnp.asarray(np.stack([p["E"] for p in pairs]), jnp.float32)
    K = jnp.asarray(np.stack([p["K"] for p in pairs]), jnp.float32)
    matches = jnp.asarray(
        np.stack([np.concatenate([p["x1"], p["x2"]], -1) for p in pairs]),
        jnp.float32,
    )
    T = np.tile(np.eye(4), (3, 1, 1))
    for i, p in enumerate(pairs):
        T[i, :3, :3], T[i, :3, 3] = p["R"], p["t"]
    out = ev.val_rt_batch(
        E, K, matches, E, jnp.asarray(T, jnp.float32),
        ransac_key=jax.random.PRNGKey(1),
    )
    assert float(jnp.max(out["err_q_gt"])) < 0.5
    assert float(jnp.max(out["err_t_gt"])) < 1.0
    # RANSAC baseline close to gt as well on mostly-clean data.
    assert float(jnp.median(out["err_q_base"])) < 1.0
    ratios = ev.inlier_ratios(out["epi_dists_gt"])
    assert float(jnp.min(ratios["ratio@1.0"])) > 0.9
