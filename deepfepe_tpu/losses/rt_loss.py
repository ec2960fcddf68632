"""Pose (q, t) loss from essential-matrix decomposition (batched, on-device).

Port of `get_Rt_loss` (train_good_utils.py:64-296). The reference loops over
layers and batch items on the host, decomposing each Eᵀ with `torch.svd` and
picking the min-error candidate; here the whole [L, B] grid is decomposed in
one batched call with degenerate-safe gradients, keeping the
selection-through-gradients semantics (the reference's `q12_who_is_small`
blend, :153-168) via `jnp.where`.

Conventions follow the reference: the essential matrices are decomposed
*transposed* (train_good_utils.py:106: `E_ests.cpu().transpose(1, 2)`), so
the recovered (R, t) live in the same frame as the dataset's
`q_cam`/`t_cam` ground truth (the inverse relative pose
`delta_Rtijs_4_4_inv`); translations are compared after unit normalization.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..geometry.decompose import decompose_E_closed_form
from ..geometry.rotations import R_to_q, rotation_angle_error, vector_angle


def rt_loss(
    E_ests_layers: jnp.ndarray,  # [L, B, 3, 3]
    q_gt: jnp.ndarray,           # [B, 4] (w,x,y,z) of the inverse rel. pose
    t_gt: jnp.ndarray,           # [B, 3] translation of the inverse rel. pose
    R_gt: jnp.ndarray,           # [B, 3, 3] rotation of the inverse rel. pose
    loss_q_clamp: float = 0.1,
    loss_t_clamp: float = 0.5,
    decomp_gap_eps: float = 1e-4,
) -> Dict[str, jnp.ndarray]:
    """Returns per-layer/batch q & t l2 losses (clamped means) and angle
    error metrics.

    `decomp_gap_eps` broadens the null-space eigengap in the backward pass:
    near-rank-1 E estimates otherwise emit t-gradients 1/gap ~ 1e4-1e6 that
    destroy training (measured; the F-loss gradient norm is ~0.1, the
    unbroadened t-term spikes to 50+ per batch and the qt stage diverges).
    1e-4 bounds the t-term at F-loss-comparable norms while leaving
    well-conditioned items' gradients untouched."""
    # Decompose transposed estimates (see module docstring). The closed-form
    # path keeps gradients well-defined at the (s, s, 0) singular-value
    # degeneracy that every valid essential matrix sits on.
    dec = decompose_E_closed_form(
        jnp.swapaxes(E_ests_layers, -1, -2), gap_eps=decomp_gap_eps
    )
    q1 = R_to_q(dec.R1)  # [L, B, 4]
    q2 = R_to_q(dec.R2)

    t_gt_n = t_gt / (jnp.linalg.norm(t_gt, axis=-1, keepdims=True) + 1e-10)
    q_gt_b = jnp.broadcast_to(q_gt, q1.shape)
    t_gt_b = jnp.broadcast_to(t_gt_n, dec.t.shape)

    q_err1 = jnp.linalg.norm(q1 - q_gt_b, axis=-1)  # [L, B]
    q_err2 = jnp.linalg.norm(q2 - q_gt_b, axis=-1)
    t_err1 = jnp.linalg.norm(dec.t - t_gt_b, axis=-1)
    t_err2 = jnp.linalg.norm(-dec.t - t_gt_b, axis=-1)

    q_pick1 = q_err1 < q_err2
    t_pick1 = t_err1 < t_err2
    q_l2 = jnp.where(q_pick1, q_err1, q_err2)          # [L, B]
    t_l2 = jnp.where(t_pick1, t_err1, t_err2)
    R_est = jnp.where(q_pick1[..., None, None], dec.R1, dec.R2)
    t_est = jnp.where(t_pick1[..., None], dec.t, -dec.t)

    # Angle-error metrics (not on the gradient path in the reference either).
    R_angle = rotation_angle_error(
        jax.lax.stop_gradient(R_est), jnp.broadcast_to(R_gt, R_est.shape)
    )
    t_angle = vector_angle(t_est, t_gt_b)

    loss_q = jnp.mean(jnp.clip(q_l2, 0.0, loss_q_clamp))
    loss_t = jnp.mean(jnp.clip(t_l2, 0.0, loss_t_clamp))

    return {
        "loss_q": loss_q,
        "loss_t": loss_t,
        "q_l2_layers": q_l2,
        "t_l2_layers": t_l2,
        "q_l2_error_mean": jnp.mean(q_l2),
        "t_l2_error_mean": jnp.mean(t_l2),
        "R_angle_error_layers": R_angle,        # [L, B] degrees
        "t_angle_error_layers": t_angle,        # [L, B] degrees
        "R_angle_error_mean": jnp.mean(R_angle),
        "t_angle_error_mean": jnp.mean(t_angle),
    }
