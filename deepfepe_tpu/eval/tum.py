"""TUM-RGBD benchmark metrics: ATE (Horn alignment) and RPE.

Port of the reference's vendored TUM scripts `evaluations/evaluate_ate.py`
(Horn closed-form alignment + per-frame translational error, :47-110) and
`evaluations/evaluate_rpe.py` (relative pose error over a frame delta,
:204-280), plus `evaluations/associate.py`'s timestamp association.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def horn_align(model: np.ndarray, data: np.ndarray):
    """Horn's closed-form rigid alignment of two 3xN point sets.

    Returns (R, t, trans_error) with data ≈ R @ model + t
    (ref: evaluate_ate.align :47-77).
    """
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean
    W = model_zc @ data_zc.T
    U, d, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    R = U @ S @ Vh
    t = data_mean - R @ model_mean
    aligned = R @ model + t
    err = np.linalg.norm(aligned - data, axis=0)
    return R, t, err


def ate(
    gt_xyz: np.ndarray, est_xyz: np.ndarray
) -> Dict[str, float]:
    """Absolute trajectory error after Horn alignment. Inputs: [N, 3]."""
    _, _, err = horn_align(est_xyz.T, gt_xyz.T)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(np.mean(err)),
        "median": float(np.median(err)),
        "std": float(np.std(err)),
        "min": float(np.min(err)),
        "max": float(np.max(err)),
    }


def rpe(
    gt_poses: np.ndarray, est_poses: np.ndarray, delta: int = 1
) -> Dict[str, float]:
    """Relative pose error over `delta` frames. Inputs: [N, 4, 4]
    (ref: evaluate_rpe.evaluate_trajectory :204)."""
    n = min(len(gt_poses), len(est_poses))
    t_errs, r_errs = [], []
    for i in range(n - delta):
        e = np.linalg.inv(
            np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        ) @ (np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta])
        t_errs.append(np.linalg.norm(e[:3, 3]))
        r_errs.append(
            np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1.0, 1.0))
        )
    return {
        "trans_rmse": float(np.sqrt(np.mean(np.array(t_errs) ** 2))),
        "trans_mean": float(np.mean(t_errs)),
        "rot_rmse_deg": float(np.degrees(np.sqrt(np.mean(np.array(r_errs) ** 2)))),
        "rot_mean_deg": float(np.degrees(np.mean(r_errs))),
    }


def associate(
    stamps_a: Sequence[float],
    stamps_b: Sequence[float],
    max_difference: float = 0.02,
    offset: float = 0.0,
) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp association (ref: evaluations/associate.py)."""
    pairs = []
    for ia, ta in enumerate(stamps_a):
        for ib, tb in enumerate(stamps_b):
            if abs(ta - (tb + offset)) < max_difference:
                pairs.append((abs(ta - (tb + offset)), ia, ib))
    pairs.sort()
    used_a, used_b, out = set(), set(), []
    for _, ia, ib in pairs:
        if ia not in used_a and ib not in used_b:
            used_a.add(ia)
            used_b.add(ib)
            out.append((ia, ib))
    out.sort()
    return out
