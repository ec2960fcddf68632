"""Frontend-quality evaluation: epipolar distance of matches vs gt geometry,
keypoint repeatability, and homography-estimation correctness.

Ports:
- `evaluation_epiDist.py` (:40-250): run the frontend on both frames, match,
  measure match epipolar distance under the GT fundamental matrix, with
  optional keypoint noise injection for robustness studies (:145-170)
- `evaluations/detector_evaluation.py` (:136-220): repeatability /
  localization error of detections under a known homography
- `evaluations/descriptor_evaluation.py` (:54-120): homography estimation
  correctness from matches
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..frontend import FrontendParams, get_matches_from_sp
from ..geometry.epipolar import epi_distance


def frontend_epidist_eval(
    net,
    params,
    imgs_grey: Tuple[jnp.ndarray, jnp.ndarray],
    F_gt: jnp.ndarray,
    fp: FrontendParams,
    noise_std: float = 0.0,
    noise_key: Optional[jax.Array] = None,
    thresholds=(0.1, 0.5, 1.0, 2.0),
) -> Dict[str, np.ndarray]:
    """Match two frames with the frontend, score vs gt F
    (ref: evaluation_epiDist.val_feature / epi_dist_from_matches)."""
    out = get_matches_from_sp(net, params, imgs_grey, fp)
    matches = out["matches_xy_ori"]
    if noise_std > 0.0 and noise_key is not None:
        matches = matches + noise_std * jax.random.normal(
            noise_key, matches.shape
        )
    # epi_distance_np dist3 convention (sum of both one-sided distances)
    # — what the reference's evaluation_epiDist scores against gt F.
    _, d1, d2 = epi_distance(
        F_gt, matches[..., :2], matches[..., 2:4], if_homo=False
    )
    d = d1 + d2
    valid = out["valid"]
    nv = jnp.sum(valid, axis=-1)
    ratios = {
        f"ratio@{t}": np.asarray(
            jnp.sum((d < t) & valid, axis=-1) / jnp.maximum(nv, 1)
        )
        for t in thresholds
    }
    return {
        "epi_dists": np.asarray(jnp.where(valid, d, np.nan)),
        "num_matches": np.asarray(nv),
        **ratios,
    }


def warp_keypoints(kpts_xy: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Apply a homography to [N, 2] points (ref: detector_evaluation
    .warp_keypoints :136)."""
    h = np.concatenate([kpts_xy, np.ones((len(kpts_xy), 1))], axis=1)
    w = h @ H.T
    return w[:, :2] / w[:, 2:3]


def compute_repeatability(
    kpts1: np.ndarray,
    kpts2: np.ndarray,
    H: np.ndarray,
    image_shape: Tuple[int, int],
    distance_thresh: float = 3.0,
) -> Dict[str, float]:
    """Detector repeatability under homography H mapping img1 -> img2
    (ref: detector_evaluation.compute_repeatability :150-220)."""
    Hh, Ww = image_shape

    def in_bounds(p):
        return (
            (p[:, 0] >= 0) & (p[:, 0] < Ww) & (p[:, 1] >= 0) & (p[:, 1] < Hh)
        )

    warped1 = warp_keypoints(kpts1, H)
    k1 = warped1[in_bounds(warped1)]
    back2 = warp_keypoints(kpts2, np.linalg.inv(H))
    k2 = kpts2[in_bounds(back2)]
    n1, n2 = len(k1), len(k2)
    if n1 == 0 or n2 == 0:
        return {"repeatability": 0.0, "localization_error": float("nan"),
                "count1": n1, "count2": n2}
    dists = np.linalg.norm(k1[:, None] - k2[None], axis=-1)
    min1 = dists.min(axis=1)
    min2 = dists.min(axis=0)
    count1 = np.sum(min1 <= distance_thresh)
    count2 = np.sum(min2 <= distance_thresh)
    le = float(np.mean(min1[min1 <= distance_thresh])) if count1 else float("nan")
    return {
        "repeatability": float((count1 + count2) / (n1 + n2)),
        "localization_error": le,
        "count1": int(n1),
        "count2": int(n2),
    }


def homography_correctness(
    matches: np.ndarray,
    H_gt: np.ndarray,
    image_shape: Tuple[int, int],
    thresholds=(1.0, 3.0, 5.0),
) -> Dict[str, float]:
    """Estimate H from matches (DLT + all-inlier least squares) and measure
    mean corner error vs gt (ref: descriptor_evaluation.compute_homography)."""
    x1 = matches[:, :2]
    x2 = matches[:, 2:4]
    if len(x1) < 4:
        return {f"correct@{t}": 0.0 for t in thresholds}
    # Normalized DLT.
    A = []
    for (x, y), (u, v) in zip(x1, x2):
        A.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        A.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    A = np.asarray(A)
    _, _, Vh = np.linalg.svd(A)
    H_est = Vh[-1].reshape(3, 3)
    Hh, Ww = image_shape
    corners = np.array(
        [[0, 0], [Ww - 1, 0], [0, Hh - 1], [Ww - 1, Hh - 1]], np.float64
    )
    w_gt = warp_keypoints(corners, H_gt)
    w_est = warp_keypoints(corners, H_est)
    err = float(np.mean(np.linalg.norm(w_gt - w_est, axis=1)))
    out = {f"correct@{t}": float(err <= t) for t in thresholds}
    out["corner_error"] = err
    return out
