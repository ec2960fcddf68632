"""Per-pair pose validation: est vs gt vs RANSAC baseline (batched, device).

Port of `val_rt` (train_good_utils.py:553-646) — the reference runs it per
sample in a host ProcessPool of OpenCV calls (Train_model_pipeline.py:1048);
here the whole batch is evaluated on device in one call:

  - recover (R, t) from the estimated E by cheirality voting
    (geometry.recover_pose ≡ cv2.recoverPose in goodCorr_eval_nondecompose)
  - err_q / err_t: angular errors of the inverted pose vs inv(delta_Rtij)
    (utils_F.goodCorr_eval_nondecompose :909-955)
  - epipolar distances of the matches under est/gt F (epi_distance_np :363)
  - the same for the 8-point RANSAC baseline (exps.base_name 'opencv_8p')
  - gt-E sanity errors (must be ~0 — the reference's standing invariant)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..geometry.basic import homo, rt_inverse
from ..geometry.decompose import recover_pose
from ..geometry.epipolar import E_to_F, F_to_E, epi_distance
from ..geometry.rotations import rotation_angle_error, vector_angle
from .ransac import ransac_e_batch, ransac_f_batch


def _pose_errors(R_est, t_est, delta_Rtij_inv):
    """err_q/err_t of the inverted recovered pose vs the inverse gt pose."""
    # invert_Rt of (R, t): R12 = Rᵀ, t12 = -Rᵀ t (utils_geo.invert_Rt :192).
    Rt = jnp.concatenate([R_est, t_est[..., None]], axis=-1)
    Rt_inv = rt_inverse(Rt)
    R_cam, t_cam = Rt_inv[..., :3, :3], Rt_inv[..., :3, 3]
    err_q = rotation_angle_error(R_cam, delta_Rtij_inv[..., :3, :3])
    err_t = vector_angle(t_cam, delta_Rtij_inv[..., :3, 3])
    M_cam = jnp.concatenate([R_cam, t_cam[..., None]], axis=-1)
    # Rt (uninverted) is the estimated i->j transform, the form the VO
    # chaining consumes (reference returns hstack(R, t) the same way,
    # goodCorr_eval_nondecompose :955).
    return err_q, err_t, M_cam, Rt


def val_rt_batch(
    E_ests: jnp.ndarray,          # [B, 3, 3] estimated essential matrices
    Ks: jnp.ndarray,              # [B, 3, 3]
    matches: jnp.ndarray,         # [B, N, 4] pixel correspondences
    E_gts: jnp.ndarray,           # [B, 3, 3]
    delta_Rtijs_4_4: jnp.ndarray, # [B, 4, 4] gt relative pose (i -> j)
    ransac_key: jax.Array | None = None,
    ransac_hypotheses: int = 512,
    ransac_threshold_px: float = 1.0,
    five_point: bool = False,
) -> Dict[str, jnp.ndarray]:
    """`five_point=True` switches the baseline to the native Nister 5-point
    RANSAC on K-normalized coords (the reference's exps.five_point flag,
    cv2.findEssentialMat path in val_rt, train_good_utils.py:614-622)."""
    x1 = matches[..., :2]
    x2 = matches[..., 2:4]
    K_inv = jnp.linalg.inv(Ks)
    x1n = homo(x1) @ jnp.swapaxes(K_inv, -1, -2)
    x2n = homo(x2) @ jnp.swapaxes(K_inv, -1, -2)
    delta_inv = jnp.linalg.inv(delta_Rtijs_4_4)

    out: Dict[str, jnp.ndarray] = {}
    for name, E in (("est", E_ests), ("gt", E_gts)):
        rec = recover_pose(E, x1n, x2n)
        err_q, err_t, M_cam, M = _pose_errors(rec.R, rec.t, delta_inv)
        F = E_to_F(E, Ks)
        # Eval convention: the reference's val path scores with
        # epi_distance_np's dist3 = d1 + d2 (the SUM of the two one-sided
        # line distances, utils_F.py:383-386), NOT the torch
        # _epi_distance mean — found by the full-system npz diff
        # (test_full_system_parity).
        _, d1, d2 = epi_distance(F, x1, x2, if_homo=False)
        epi = d1 + d2
        out[f"err_q_{name}"] = err_q
        out[f"err_t_{name}"] = err_t
        out[f"M_cam_{name}"] = M_cam
        out[f"M_{name}"] = M
        out[f"epi_dists_{name}"] = epi

    if ransac_key is not None:
        if five_point:
            # Sampson threshold in normalized units: px / focal, squared.
            f_mean = 0.5 * (Ks[:, 0, 0] + Ks[:, 1, 1])
            thr = jnp.mean((ransac_threshold_px / f_mean) ** 2)
            rr = ransac_e_batch(
                x1n[..., :2], x2n[..., :2], ransac_key,
                num_hypotheses=max(ransac_hypotheses // 8, 16),
                threshold=thr,
            )
            E_base = rr.F
            F_base = E_to_F(E_base, Ks)
        else:
            rr = ransac_f_batch(
                x1, x2, ransac_key,
                num_hypotheses=ransac_hypotheses,
                threshold=ransac_threshold_px,
            )
            F_base = rr.F
            E_base = F_to_E(rr.F, Ks)
        rec = recover_pose(E_base, x1n, x2n)
        err_q, err_t, M_cam, M = _pose_errors(rec.R, rec.t, delta_inv)
        _, d1, d2 = epi_distance(F_base, x1, x2, if_homo=False)
        epi = d1 + d2  # epi_distance_np dist3 convention (see above)
        out.update(
            {
                "err_q_base": err_q,
                "err_t_base": err_t,
                "M_cam_base": M_cam,
                "M_base": M,
                "epi_dists_base": epi,
                "base_inliers": rr.num_inliers,
            }
        )
    return out


def inlier_ratios(
    epi_dists: jnp.ndarray, thresholds=(0.1, 1.0)
) -> Dict[str, jnp.ndarray]:
    """Fraction of correspondences under each epipolar-distance threshold
    (Train_model_pipeline.py:1201-1223 eval ratios)."""
    return {
        f"ratio@{th}": jnp.mean((epi_dists < th).astype(jnp.float32), axis=-1)
        for th in thresholds
    }
