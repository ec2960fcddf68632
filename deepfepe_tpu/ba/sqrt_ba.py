"""Square-root bundle adjustment: QR nullspace marginalization, f32-stable.

The Schur path (ba/bundle_adjustment.py) forms normal equations JᵀJ, which
squares the conditioning — fine in f64 on a host, hostile on TPUs where
f64 is emulated. Square-root BA (Demmel et al., CVPR 2021, "Square Root
Bundle Adjustment for Large-Scale Reconstruction" — PAPERS.md) never forms
JᵀJ: each landmark's Jacobian block is QR-decomposed and the landmark is
eliminated by projecting its rows onto the nullspace, leaving a pose-only
LEAST-SQUARES problem solved by another QR. Working precision f32 then
suffices at condition numbers where the f32 Schur solve loses the descent
direction (validated in tests/test_ba.py).

Solves the SAME damped GN system as the Schur step (Levenberg damping
enters as sqrt(λ)·I residual rows for both parameter groups), so the two
paths agree to solver precision — parity-tested against the f64 Schur
step.

Batched dense [C, P] masked structure like the rest of ba/: the per-
landmark QR is [2C+3, 3] — one small batched factorization over the
landmark axis, the TPU-friendly shape. The per-landmark pose Jacobian is
materialized densely ([P, 2C, 6C]); at the framework's keyframe-window
scale (C ≲ 16) that is small, and the landmark axis stays shardable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp
from .bundle_adjustment import BAProblem, _jacobians, reprojection_residuals


def _stacked_jacobians(p: BAProblem):
    """Landmark-major residuals/Jacobians.

    Returns r [P, 2C], J_l [P, 2C, 3], J_p [P, 2C, 6C] (block structure:
    row pair of camera c only touches columns 6c:6c+6)."""
    r, Xc = reprojection_residuals(p)  # r: [C, P, 2]
    J_cam, J_pt = _jacobians(p, Xc)    # [C,P,2,6], [C,P,2,3]
    C, P = r.shape[:2]
    r_l = r.transpose(1, 0, 2).reshape(P, 2 * C)
    J_l = J_pt.transpose(1, 0, 2, 3).reshape(P, 2 * C, 3)
    eyeC = jnp.eye(C, dtype=r.dtype)
    # [P, C(row), 2, C(col), 6] with the camera block diagonal.
    J_p = jnp.einsum("cpkj,cd->pckdj", J_cam, eyeC).reshape(
        P, 2 * C, 6 * C
    )
    return r_l, J_l, J_p, 0.5 * jnp.sum(r * r)


def sqrt_ba_step(
    p: BAProblem,
    damping: float = 1e-4,
    fix_cameras: int = 1,
    dof_mask: jnp.ndarray | None = None,
) -> Tuple[BAProblem, Dict[str, jnp.ndarray]]:
    """One damped-GN step via QR marginalization (no normal equations).

    `dof_mask` [C, 6] (translation xyz, rotation xyz per camera; 0 freezes
    a DoF) composes with `fix_cameras` — e.g. freezing the rotation block
    gives the translation-only refinement of the two-stage pose-graph
    philosophy (rotations from the solver are often already better than
    what noisy points can support)."""
    C = p.poses.shape[0]
    P = p.points.shape[0]
    dtype = p.points.dtype
    sqrt_l = jnp.sqrt(jnp.asarray(damping, dtype))

    r_l, J_l, J_p, cost = _stacked_jacobians(p)

    # Landmark damping as sqrt(λ) I3 residual rows (exactly Levenberg's
    # H_pp + λI after squaring).
    pad_l = jnp.broadcast_to(
        sqrt_l * jnp.eye(3, dtype=dtype), (P, 3, 3)
    )
    J_l_aug = jnp.concatenate([J_l, pad_l], axis=1)       # [P, 2C+3, 3]
    J_p_aug = jnp.concatenate(
        [J_p, jnp.zeros((P, 3, 6 * C), dtype)], axis=1
    )
    r_aug = jnp.concatenate([r_l, jnp.zeros((P, 3), dtype)], axis=1)

    # Batched complete QR of the landmark blocks.
    Q, R_full = jnp.linalg.qr(J_l_aug, mode="complete")   # [P,m,m],[P,m,3]
    R_l = R_full[:, :3, :]                                 # [P, 3, 3]
    Jp_rot = jnp.einsum("pmi,pmk->pik", Q, J_p_aug)        # QᵀJ_p [P,m,6C]
    r_rot = jnp.einsum("pmi,pm->pi", Q, r_aug)             # Qᵀr   [P, m]

    # Nullspace rows (landmark eliminated) -> pose-only least squares.
    A = Jp_rot[:, 3:, :].reshape(-1, 6 * C)
    b = r_rot[:, 3:].reshape(-1)

    # Pose damping rows + gauge fixing (drop the fixed cameras' columns).
    free = (jnp.arange(6 * C) >= 6 * fix_cameras).astype(dtype)
    if dof_mask is not None:
        free = free * dof_mask.reshape(-1).astype(dtype)
    A = A * free[None, :]
    A = jnp.concatenate(
        [A, sqrt_l * jnp.eye(6 * C, dtype=dtype)], axis=0
    )
    b = jnp.concatenate([b, jnp.zeros(6 * C, dtype)], axis=0)

    # min ||A dp + b|| via QR (reduced): dp = -R⁻¹ Qᵀ b.
    Qp, Rp = jnp.linalg.qr(A, mode="reduced")
    delta_c = -jax.scipy.linalg.solve_triangular(
        Rp, Qp.T @ b, lower=False
    )
    delta_c = (delta_c * free).reshape(C, 6)

    # Landmark back-substitution from the top-3 rotated rows:
    # R_l δX = -(r̃[:3] + J̃_p[:3] δp).
    rhs = -(
        r_rot[:, :3]
        + jnp.einsum("pik,k->pi", Jp_rot[:, :3, :], delta_c.reshape(-1))
    )
    delta_p = jax.scipy.linalg.solve_triangular(
        R_l, rhs[..., None], lower=False
    )[..., 0]

    new_poses = jax.vmap(se3_exp)(delta_c) @ p.poses
    new_points = p.points + delta_p
    new_p = p._replace(poses=new_poses, points=new_points)
    new_r, _ = reprojection_residuals(new_p)
    new_cost = 0.5 * jnp.sum(new_r * new_r)

    improved = new_cost < cost
    out = BAProblem(
        poses=jnp.where(improved, new_poses, p.poses),
        points=jnp.where(improved, new_points, p.points),
        obs=p.obs,
        vis=p.vis,
        K=p.K,
    )
    return out, {"cost": cost, "new_cost": new_cost, "accepted": improved}


def optimize_sqrt_ba(
    p: BAProblem, iters: int = 10, damping: float = 1e-4,
    fix_cameras: int = 1,
):
    costs = []
    for _ in range(iters):
        p, info = sqrt_ba_step(p, damping, fix_cameras)
        costs.append(info["cost"])
    return p, jnp.stack(costs)
