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


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """AP = Σ_n (R_n - R_{n-1}) P_n over the score-ranked matches —
    first-party equivalent of sklearn.average_precision_score as used by
    the reference's computeAP (evaluate_frontend.py:225-232)."""
    labels = np.asarray(labels, np.float64)
    scores = np.asarray(scores, np.float64)
    if labels.size == 0 or labels.sum() == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    l_sorted = labels[order]
    tp = np.cumsum(l_sorted)
    precision = tp / (np.arange(len(l_sorted)) + 1.0)
    recall = tp / l_sorted.sum()
    prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - prev) * precision))


def matching_score_and_map(
    kpts1: np.ndarray,     # [K, 2] (x, y) image-1 keypoints
    desc1: np.ndarray,     # [K, D]
    valid1: np.ndarray,    # [K] bool
    kpts2: np.ndarray,
    desc2: np.ndarray,
    valid2: np.ndarray,
    H_gt: np.ndarray,      # [3, 3] homography img1 -> img2
    image_shape: Tuple[int, int],
    nn_thresh: float = 1.2,
    inlier_px: float = 3.0,
) -> Dict[str, float]:
    """Descriptor matching score + detection mAP under a gt homography
    (ref: evaluate_frontend.eva_mscore :178-276 — the working subset of
    the reference's notebook-extracted file, with inliers_method='gt':
    a match is an inlier iff |H·x1 - x2| < inlier_px).

    - mscore = 2·inliers / (n_kpts1 + n_kpts2_unwarped_in_bounds)
      (the reference's warpLabels-filtered denominator).
    - mAP = AP of inlier labels ranked by flipped match distance
      (flipArr: max(dist) - dist, evaluate_frontend.py:236-267).
    """
    import jax.numpy as jnp

    from ..frontend.matching import mutual_nn_match

    m = mutual_nn_match(
        jnp.asarray(desc1)[None], jnp.asarray(desc2)[None],
        jnp.asarray(valid1)[None], jnp.asarray(valid2)[None],
        nn_thresh=nn_thresh,
    )
    keep = np.asarray(m.valid[0])
    i1 = np.asarray(m.idx1[0])[keep]
    i2 = np.asarray(m.idx2[0])[keep]
    dists = np.asarray(m.scores[0])[keep]
    x1 = np.asarray(kpts1)[i1]
    x2 = np.asarray(kpts2)[i2]
    if len(x1):
        warped = warp_keypoints(x1, np.asarray(H_gt))
        inl = np.linalg.norm(warped - x2, axis=1) < inlier_px
        m_flip = (dists.max() - dists) if len(dists) else dists
        ap = average_precision(inl, m_flip)
        n_inl = int(inl.sum())
    else:
        ap, n_inl = 0.0, 0

    Hh, Ww = image_shape
    k1 = np.asarray(kpts1)[np.asarray(valid1)]
    k2 = np.asarray(kpts2)[np.asarray(valid2)]
    back2 = (
        warp_keypoints(k2, np.linalg.inv(np.asarray(H_gt)))
        if len(k2) else np.zeros((0, 2))
    )
    inb = (
        (back2[:, 0] >= 0) & (back2[:, 0] < Ww)
        & (back2[:, 1] >= 0) & (back2[:, 1] < Hh)
    )
    denom = len(k1) + int(inb.sum())
    return {
        "mscore": float(2.0 * n_inl / denom) if denom else 0.0,
        "mAP": ap,
        "num_matches": int(len(x1)),
        "match_inlier_ratio": float(n_inl / len(x1)) if len(x1) else 0.0,
    }


def evaluate_homography_pair(
    net, params, image: np.ndarray, H_gt: np.ndarray, fp,
    rep_thresh: float = 3.0,
) -> Dict[str, float]:
    """The reference's full evaluate_frontend metric surface for ONE
    (image, warped image) pair: repeatability + localization error +
    homography correctness + matching score + mAP
    (evaluate_frontend.py:26-276).

    The warped view is rendered with the gt homography (cv2 host warp —
    eval path only, matching the reference's HPatches-style inputs).
    """
    import cv2
    import jax.numpy as jnp

    from ..frontend.pipeline import run_superpoint

    Hh, Ww = image.shape[:2]
    warped = cv2.warpPerspective(
        np.asarray(image, np.float32), np.asarray(H_gt, np.float64),
        (Ww, Hh),
    )
    imgs = jnp.asarray(np.stack([image, warped]), jnp.float32)
    k = run_superpoint(net, params, imgs, fp)
    xy = np.asarray(k.xy + k.offsets)
    valid = np.asarray(k.valid)
    desc = np.asarray(k.desc)

    out: Dict[str, float] = {}
    out.update(
        compute_repeatability(
            xy[0][valid[0]], xy[1][valid[1]], np.asarray(H_gt), (Hh, Ww),
            distance_thresh=rep_thresh,
        )
    )
    out.update(
        matching_score_and_map(
            xy[0], desc[0], valid[0], xy[1], desc[1], valid[1],
            H_gt, (Hh, Ww),
        )
    )
    # Correctness needs the matched pairs in [N, 4] form.
    from ..frontend.matching import gather_matches, mutual_nn_match

    m = mutual_nn_match(
        jnp.asarray(desc[:1]), jnp.asarray(desc[1:]),
        jnp.asarray(valid[:1]), jnp.asarray(valid[1:]),
        nn_thresh=1.2,
    )
    matches = np.asarray(
        gather_matches(jnp.asarray(xy[:1]), jnp.asarray(xy[1:]), m)
    )[0][np.asarray(m.valid[0])]
    out.update(homography_correctness(matches, np.asarray(H_gt), (Hh, Ww)))
    return out
