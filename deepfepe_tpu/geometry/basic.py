"""Basic homogeneous-coordinate and SE(3) helpers (pure JAX, batched).

Capability parity with the reference `dsac_tools/utils_misc.py`
(homo/de-homo :;  skew-symmetric :; Rt pad/depad/inverse) — re-designed as
shape-polymorphic pure functions: every op works on arbitrary leading batch
dimensions, so the same code path serves single pairs, batches, and
vmapped/pjit-sharded calls.

Conventions:
- points are `[..., N, 2]` (pixel or normalized image coordinates);
  homogeneous points are `[..., N, 3]`.
- rigid transforms are `[..., 3, 4]` (`Rt`) or `[..., 4, 4]` padded.
- the relative pose `T_ij` maps frame-i coordinates into frame j:
  `x_j = R @ x_i + t`.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a zero gradient at exactly-zero input.

    jnp.linalg.norm's VJP at 0 is 0/0 = NaN, and a NaN survives even a zero
    upstream cotangent (0 * NaN = NaN) — so one exactly-zero vector anywhere
    on a differentiated path poisons the whole gradient. Exactly-zero inputs
    DO occur here: a rank-deficient sampled-subset fit can return an F with
    zero rows, making F·x1 ≡ 0 inside compute_epi_residual.
    """
    d2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.where(d2 > 0, jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)


def homo(pts: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous 1: [..., N, 2] -> [..., N, 3] (ref: utils_misc._homo)."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def dehomo(pts_h: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Divide by the last coordinate: [..., N, 3] -> [..., N, 2]."""
    return pts_h[..., :-1] / (pts_h[..., -1:] + eps)


def skew(t: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of [..., 3] or [..., 3, 1] vectors.

    Ref: utils_misc._skew_symmetric / skew_symmetric_np.
    """
    if t.shape[-1] == 1:
        t = t[..., 0]
    z = jnp.zeros_like(t[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([z, -t[..., 2], t[..., 1]], axis=-1),
            jnp.stack([t[..., 2], z, -t[..., 0]], axis=-1),
            jnp.stack([-t[..., 1], t[..., 0], z], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rt_pad(Rt: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] by appending [0,0,0,1] (ref: utils_misc.Rt_pad)."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=Rt.dtype), Rt.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([Rt, bottom], axis=-2)


def rt_depad(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 3, 4] (ref: utils_misc.Rt_depad)."""
    return T[..., :3, :]


def rt_inverse(Rt: jnp.ndarray) -> jnp.ndarray:
    """Invert a [..., 3, 4] rigid transform in closed form.

    inv([R | t]) = [Rᵀ | -Rᵀ t]  — avoids a 4x4 linear solve.
    """
    R = Rt[..., :3, :3]
    t = Rt[..., :3, 3:4]
    R_T = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([R_T, -R_T @ t], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 4, 4] SE(3) matrices in closed form."""
    return rt_pad(rt_inverse(rt_depad(T)))


def se3_compose(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Compose two [..., 4, 4] transforms: result maps like T_a ∘ T_b."""
    return T_a @ T_b
