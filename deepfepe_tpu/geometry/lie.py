"""SO(3)/SE(3) exponential & logarithm maps (batched, Taylor-safe).

Foundation for the pose-graph / bundle-adjustment subsystem (new capability
relative to the reference, anchored to its pose conventions — SURVEY.md
§5.7): local tangent-space updates for Gauss-Newton on poses. All ops accept
arbitrary leading batch dims and are differentiable, with series expansions
near theta=0 so jit/grad never sees a 0/0.
"""

from __future__ import annotations

import jax.numpy as jnp

from .basic import skew

_EPS = 1e-8


def _sinc_taylor(theta2):
    """sin(θ)/θ with Taylor fallback (θ² input)."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)


def _cosc_taylor(theta2):
    """(1 - cos θ)/θ² with Taylor fallback."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    A = _sinc_taylor(theta2)[..., None, None]
    B = _cosc_taylor(theta2)[..., None, None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A * W + B * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (theta < pi).

    Differentiable at the identity: the scale factor θ/(2 sin θ) is computed
    as a series in (1 - cos θ) near θ=0, and the arccos input in the exact
    branch is clamped strictly inside (-1, 1) so its (unselected) gradient
    stays finite under `where` (reverse-mode evaluates both branches).
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    # vee of the antisymmetric part: v = 2 sin(theta) * axis.
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    near_id = cos > 1.0 - 1e-5
    cos_safe = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-6)
    theta_safe = jnp.arccos(cos_safe)
    exact = theta_safe / (2.0 * jnp.sin(theta_safe) + _EPS)
    # θ²≈2(1-c):  θ/(2sinθ) = 1/2 + θ²/12 + ... = 1/2 + (1-c)/6 + ...
    series = 0.5 + (1.0 - cos) / 6.0 + (1.0 - cos) ** 2 * (7.0 / 90.0)
    scale = jnp.where(near_id, series, exact)
    return v * scale[..., None]


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): se3_exp translation factor."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    B = _cosc_taylor(theta2)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (1.0 - jnp.sin(theta) / theta) / (theta2 + _EPS),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * (W @ W)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist [..., 6] (v, w) -> SE(3) matrix [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    J = _so3_left_jacobian(w)
    t = (J @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) matrix [..., 4, 4] -> twist [..., 6] (v, w)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    J = _so3_left_jacobian(w)
    v = jnp.linalg.solve(J, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)
