"""KITTI odometry benchmark metrics (numpy, host-side).

Re-implementation of the metrics the reference reports via the external
`kitti-odom-eval` tool (Huangying-Zhan port of the KITTI devkit; the
reference's published numbers in results/*/result.txt come from it,
README.md:235-242):

- translation error (%) and rotation error (deg/100m) over sub-sequences of
  length 100..800 m, sampled every 10 frames (KITTI devkit definition)
- ATE (m): RMSE of translation after 6-DoF (Umeyama, no scale) alignment
- RPE (m) / RPE (deg): mean frame-to-frame relative pose error

Verified against the committed reference outputs (results/deepF_kitti and
results/deepFEPE_kitti) in tests/test_eval_vo.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
STEP_SIZE = 10


def load_poses_txt(path: str) -> np.ndarray:
    """Load a KITTI 12-col trajectory file -> [N, 4, 4]."""
    data = np.genfromtxt(path).reshape(-1, 3, 4)
    n = data.shape[0]
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :] = data
    return out


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    """Cumulative path length per frame."""
    d = np.zeros(len(poses))
    steps = np.linalg.norm(
        poses[1:, :3, 3] - poses[:-1, :3, 3], axis=-1
    )
    d[1:] = np.cumsum(steps)
    return d


def _last_frame_from_len(dist: np.ndarray, first: int, length: float) -> int:
    idx = np.searchsorted(dist, dist[first] + length)
    return int(idx) if idx < len(dist) else -1


def _rotation_error(R: np.ndarray) -> float:
    return float(np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)))


def calc_sequence_errors(
    poses_gt: np.ndarray, poses_est: np.ndarray,
    lengths: Sequence[float] = LENGTHS, step: int = STEP_SIZE,
) -> List[tuple]:
    """Per-(start, length) rotation/translation errors (KITTI devkit)."""
    dist = trajectory_distances(poses_gt)
    err = []
    n = min(len(poses_gt), len(poses_est))
    for first in range(0, n, step):
        for length in lengths:
            last = _last_frame_from_len(dist, first, length)
            if last == -1 or last >= n:
                continue
            delta_gt = np.linalg.inv(poses_gt[first]) @ poses_gt[last]
            delta_est = np.linalg.inv(poses_est[first]) @ poses_est[last]
            pose_err = np.linalg.inv(delta_est) @ delta_gt
            r_err = _rotation_error(pose_err[:3, :3]) / length
            t_err = np.linalg.norm(pose_err[:3, 3]) / length
            err.append((first, r_err, t_err, length))
    return err


def umeyama_alignment(
    x: np.ndarray, y: np.ndarray, with_scale: bool = False
):
    """Least-squares similarity transform aligning x (3xN) onto y (3xN).

    Returns (R, t, c) with y ≈ c R x + t. (Umeyama, TPAMI 1991 — the same
    alignment kitti-odom-eval uses for ATE.)
    """
    mx = x.mean(axis=1, keepdims=True)
    my = y.mean(axis=1, keepdims=True)
    xc, yc = x - mx, y - my
    n = x.shape[1]
    cov = yc @ xc.T / n
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / n
        c = float(np.trace(np.diag(D) @ S) / var_x)
    else:
        c = 1.0
    t = my - c * R @ mx
    return R, t[:, 0], c


def align_trajectory(
    poses_gt: np.ndarray, poses_est: np.ndarray, align: str = "scale"
) -> np.ndarray:
    """Globally align the estimated trajectory onto gt before evaluation.

    Modes (kitti-odom-eval semantics):
      'none'  — as-is
      'scale' — Umeyama least-squares scale applied to est translations
                (the mode the reference's published results used)
      '6dof'  — rigid Umeyama alignment
      '7dof'  — similarity (rigid + scale) alignment
    """
    n = min(len(poses_gt), len(poses_est))
    est = poses_est.copy()
    gt_xyz = poses_gt[:n, :3, 3].T
    est_xyz = poses_est[:n, :3, 3].T
    if align == "scale":
        _, _, c = umeyama_alignment(est_xyz, gt_xyz, with_scale=True)
        est[:, :3, 3] *= c
    elif align in ("6dof", "7dof"):
        R, t, c = umeyama_alignment(est_xyz, gt_xyz, with_scale=align == "7dof")
        est[:, :3, 3] = (c * R @ est_xyz + t[:, None]).T
        est[:, :3, :3] = R @ est[:, :3, :3]
    return est


def compute_ate(poses_gt: np.ndarray, poses_est: np.ndarray) -> float:
    """RMSE ATE of (already aligned) trajectories."""
    n = min(len(poses_gt), len(poses_est))
    gt_xyz = poses_gt[:n, :3, 3].T
    est_xyz = poses_est[:n, :3, 3].T
    errs = np.linalg.norm(gt_xyz - est_xyz, axis=0)
    return float(np.sqrt(np.mean(errs**2)))


def compute_rpe(poses_gt: np.ndarray, poses_est: np.ndarray):
    """Mean frame-to-frame relative pose error -> (trans m, rot deg)."""
    n = min(len(poses_gt), len(poses_est))
    t_errs, r_errs = [], []
    for i in range(n - 1):
        rel_gt = np.linalg.inv(poses_gt[i]) @ poses_gt[i + 1]
        rel_est = np.linalg.inv(poses_est[i]) @ poses_est[i + 1]
        pe = np.linalg.inv(rel_est) @ rel_gt
        t_errs.append(np.linalg.norm(pe[:3, 3]))
        r_errs.append(_rotation_error(pe[:3, :3]))
    return float(np.mean(t_errs)), float(np.degrees(np.mean(r_errs)))


def evaluate_sequence(
    poses_gt: np.ndarray,
    poses_est: np.ndarray,
    align: str = "scale",
    lengths: Sequence[float] = LENGTHS,
) -> Dict[str, float]:
    """Full kitti-odom-eval style report for one sequence.

    The default align='scale' is the protocol behind the reference's
    published results (verified bit-for-bit in tests/test_eval_vo.py)."""
    poses_est = align_trajectory(poses_gt, poses_est, align)
    errs = calc_sequence_errors(poses_gt, poses_est, lengths=lengths)
    if errs:
        r = np.mean([e[1] for e in errs])
        t = np.mean([e[2] for e in errs])
        trans_pct = float(t * 100.0)
        rot_deg_per_100m = float(np.degrees(r) * 100.0)
    else:
        trans_pct = rot_deg_per_100m = float("nan")
    ate = compute_ate(poses_gt, poses_est)
    rpe_m, rpe_deg = compute_rpe(poses_gt, poses_est)
    return {
        "trans_err_pct": trans_pct,
        "rot_err_deg_per_100m": rot_deg_per_100m,
        "ATE_m": ate,
        "RPE_m": rpe_m,
        "RPE_deg": rpe_deg,
    }
