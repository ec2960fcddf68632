"""Host-side OpenCV camera-pose baseline (parity: dsac_tools/utils_opencv).

The reference validates every estimate against cv2's 5-point/8-point RANSAC
(`recover_camera_opencv` :129-208). This module reproduces that exact
baseline for cross-implementation parity checks on the host; the on-device
native baseline is `eval.ransac` (vmapped 8-point). If OpenCV is absent the
wrapper falls back to the native path (8-point only).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def recover_camera_opencv(
    K: np.ndarray,
    x1: np.ndarray,
    x2: np.ndarray,
    delta_Rtij_inv: np.ndarray,
    five_point: bool = False,
    threshold: float = 0.1,
    if_normalized: bool = False,
    E_given: Optional[np.ndarray] = None,
    ransac: bool = True,
):
    """Estimate the relative pose with cv2 and score vs gt.

    Returns (M [3,4] = [R|t], (err_R_deg, err_t_deg), inlier_mask, E_return)
    exactly as the reference (utils_opencv.py:129-208); E_return is E for
    the 5-point path and (E, F) for the 8-point path.
    """
    try:
        import cv2
    except ImportError:
        return _native_fallback(K, x1, x2, delta_Rtij_inv, threshold)

    method = cv2.RANSAC if ransac else 0
    x1 = np.ascontiguousarray(x1, np.float64)
    x2 = np.ascontiguousarray(x2, np.float64)
    F_8point = None
    if E_given is not None:
        E_recover = np.asarray(E_given, np.float64)
        mask1 = np.ones((len(x1), 1), np.uint8)
    elif five_point:
        if if_normalized:
            E_recover, mask1 = cv2.findEssentialMat(
                x1, x2, method=method, threshold=threshold
            )
        else:
            E_recover, mask1 = cv2.findEssentialMat(
                x1, x2, focal=K[0, 0], pp=(K[0, 2], K[1, 2]),
                method=method, threshold=threshold,
            )
        E_recover = E_recover[:3]
    else:
        F_8point, mask1 = cv2.findFundamentalMat(x1, x2, cv2.FM_RANSAC, 0.1)
        E_8 = K.T @ F_8point @ K
        U, S, Vt = np.linalg.svd(E_8)
        E_recover = U @ np.diag([1.0, 1.0, 0.0]) @ Vt

    if if_normalized:
        _, R, t, mask2 = cv2.recoverPose(
            E_recover.astype(np.float64), x1, x2,
            mask=None if E_given is not None else mask1.copy(),
        )
    else:
        _, R, t, mask2 = cv2.recoverPose(
            E_recover.astype(np.float64), x1, x2,
            focal=K[0, 0], pp=(K[0, 2], K[1, 2]),
            mask=None if E_given is not None else mask1.copy(),
        )

    # invert_Rt + angle errors (utils_geo :150-192).
    T = np.eye(4)
    T[:3, :3], T[:3, 3:4] = R, t
    T_inv = np.linalg.inv(T)
    R_cam, t_cam = T_inv[:3, :3], T_inv[:3, 3]
    cos = np.clip(
        (np.trace(R_cam @ delta_Rtij_inv[:3, :3].T) - 1) / 2, -1, 1
    )
    err_R = float(np.degrees(np.arccos(cos)))
    tg = delta_Rtij_inv[:3, 3]
    cos_t = np.clip(
        np.dot(t_cam, tg)
        / (np.linalg.norm(t_cam) * np.linalg.norm(tg) + 1e-10),
        -1, 1,
    )
    err_t = float(np.degrees(np.arccos(cos_t)))

    E_return = E_recover if five_point else (E_recover, F_8point)
    return (
        np.hstack((R, t)),
        (err_R, err_t),
        mask2.flatten() > 0,
        E_return,
    )


def _native_fallback(K, x1, x2, delta_Rtij_inv, threshold_px=1.0):
    """8-point-only fallback via the on-device RANSAC."""
    import jax
    import jax.numpy as jnp

    from ..geometry.basic import homo
    from ..geometry.decompose import recover_pose
    from ..geometry.epipolar import F_to_E
    from .ransac import ransac_f

    res = ransac_f(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jax.random.PRNGKey(0),
        threshold=max(threshold_px, 1.0),
    )
    E = F_to_E(res.F, jnp.asarray(K, jnp.float32))
    K_inv = np.linalg.inv(K)
    xh = lambda x: (np.hstack([x, np.ones((len(x), 1))]) @ K_inv.T)[:, :2]
    rec = recover_pose(
        E, jnp.asarray(xh(x1), jnp.float32), jnp.asarray(xh(x2), jnp.float32)
    )
    R = np.asarray(rec.R, np.float64)
    t = np.asarray(rec.t, np.float64)[:, None]
    T = np.eye(4)
    T[:3, :3], T[:3, 3:4] = R, t
    T_inv = np.linalg.inv(T)
    cos = np.clip(
        (np.trace(T_inv[:3, :3] @ delta_Rtij_inv[:3, :3].T) - 1) / 2, -1, 1
    )
    err_R = float(np.degrees(np.arccos(cos)))
    tg = delta_Rtij_inv[:3, 3]
    tc = T_inv[:3, 3]
    cos_t = np.clip(
        np.dot(tc, tg) / (np.linalg.norm(tc) * np.linalg.norm(tg) + 1e-10),
        -1, 1,
    )
    err_t = float(np.degrees(np.arccos(cos_t)))
    F_np = np.asarray(res.F, np.float64)
    return (
        np.hstack((R, t)),
        (err_R, err_t),
        np.asarray(res.inlier_mask),
        (np.asarray(E, np.float64), F_np),
    )
