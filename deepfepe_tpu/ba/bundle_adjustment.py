"""Bundle adjustment with Schur-complement reduction (batched, analytic).

New capability per the north star (SURVEY.md §7.1 item 9): refine keyframe
camera poses and 3D points by minimizing reprojection error. Built TPU-first:

- static observation structure [C, P] with a visibility mask (no sparse
  indexing; masked terms contribute zero),
- analytic Jacobian blocks (J_cam [C,P,2,6], J_pt [C,P,2,3]) assembled with
  einsums on the MXU,
- the point system is eliminated in closed form (batched 3x3 inverses) and
  the reduced camera system S = H_cc − W H_pp⁻¹ Wᵀ is solved densely —
  exactly the Schur trick of large-scale BA, shaped so the point dimension
  is the shardable axis (see ba/distributed.py).

Pose convention: T_c maps world -> camera (x_cam = R_c X + t_c), matching
the rest of the framework. Local updates are left-multiplicative se(3).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.basic import skew
from ..geometry.lie import se3_exp


class BAProblem(NamedTuple):
    poses: jnp.ndarray   # [C, 4, 4] world->camera
    points: jnp.ndarray  # [P, 3]
    obs: jnp.ndarray     # [C, P, 2] pixel observations
    vis: jnp.ndarray     # [C, P] float {0,1} visibility
    K: jnp.ndarray       # [3, 3] shared intrinsics


def project(poses, points, K):
    """[C, P, 2] projections and [C, P, 3] camera-frame points."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Xc = jnp.einsum("cij,pj->cpi", R, points) + t[:, None, :]
    uv_h = jnp.einsum("ij,cpj->cpi", K, Xc)
    uv = uv_h[..., :2] / (uv_h[..., 2:3] + 1e-12)
    return uv, Xc


def reprojection_residuals(p: BAProblem):
    uv, Xc = project(p.poses, p.points, p.K)
    r = (uv - p.obs) * p.vis[..., None]
    return r, Xc


def _jacobians(p: BAProblem, Xc: jnp.ndarray):
    """Analytic per-observation Jacobians.

    J_proj = d(uv)/d(Xc): [C,P,2,3];  d(Xc)/d(δcam) = [I | -skew(Xc)];
    d(Xc)/d(X) = R.
    """
    fx = p.K[0, 0]
    fy = p.K[1, 1]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zi = 1.0 / (z + 1e-12)
    zeros = jnp.zeros_like(x)
    Jp = jnp.stack(
        [
            jnp.stack([fx * zi, zeros, -fx * x * zi * zi], axis=-1),
            jnp.stack([zeros, fy * zi, -fy * y * zi * zi], axis=-1),
        ],
        axis=-2,
    )  # [C, P, 2, 3]
    # Camera: [C,P,3,6] = [I | -skew(Xc)] then project.
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    dX_dcam = jnp.concatenate([I3, -skew(Xc)], axis=-1)  # [C,P,3,6]
    J_cam = Jp @ dX_dcam  # [C,P,2,6]
    R = p.poses[:, :3, :3]
    J_pt = jnp.einsum("cpij,cjk->cpik", Jp, R)  # [C,P,2,3]
    mask = p.vis[..., None, None]
    return J_cam * mask, J_pt * mask


def build_normal_blocks(p: BAProblem):
    """All GN blocks: H_cc [C,6,6], H_pp [P,3,3], W [C,P,6,3], b_c, b_p."""
    r, Xc = reprojection_residuals(p)
    J_cam, J_pt = _jacobians(p, Xc)
    H_cc = jnp.einsum("cpki,cpkj->cij", J_cam, J_cam)
    H_pp = jnp.einsum("cpki,cpkj->pij", J_pt, J_pt)
    W = jnp.einsum("cpki,cpkj->cpij", J_cam, J_pt)
    b_c = jnp.einsum("cpki,cpk->ci", J_cam, r)
    b_p = jnp.einsum("cpki,cpk->pi", J_pt, r)
    cost = 0.5 * jnp.sum(r * r)
    return H_cc, H_pp, W, b_c, b_p, cost


def schur_reduce(H_cc, H_pp, W, b_c, b_p, damping: float):
    """Reduced camera system (S, g) after eliminating points."""
    C = H_cc.shape[0]
    Hpp_d = H_pp + damping * jnp.eye(3, dtype=H_pp.dtype)
    Hpp_inv = jnp.linalg.inv(Hpp_d)  # [P, 3, 3] batched
    # S = blockdiag(H_cc) - W Hpp_inv Wᵀ  (coupled across cameras).
    WH = jnp.einsum("cpij,pjk->cpik", W, Hpp_inv)  # [C,P,6,3]
    S_coupling = jnp.einsum("apik,bpjk->abij", WH, W)  # [C,C,6,6]
    S = -S_coupling
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        H_cc + damping * jnp.eye(6, dtype=H_cc.dtype)
    )
    g = b_c - jnp.einsum("cpik,pk->ci", WH, b_p)
    return S, g, Hpp_inv


def ba_step(
    p: BAProblem,
    damping: float = 1e-4,
    fix_cameras: int = 1,
) -> Tuple[BAProblem, Dict[str, jnp.ndarray]]:
    """One damped Gauss-Newton step with Schur elimination.

    `fix_cameras` clamps the first k cameras (gauge freedom).
    """
    C = p.poses.shape[0]
    H_cc, H_pp, W, b_c, b_p, cost = build_normal_blocks(p)
    S, g, Hpp_inv = schur_reduce(H_cc, H_pp, W, b_c, b_p, damping)

    # Gauge fixing: zero rows/cols of the fixed cameras, identity diagonal.
    S_full = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    g_full = g.reshape(C * 6)
    mask = (jnp.arange(C * 6) >= fix_cameras * 6).astype(S_full.dtype)
    S_full = S_full * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    g_full = g_full * mask

    delta_c = -jnp.linalg.solve(S_full, g_full).reshape(C, 6)
    # Back-substitute points: δX = -Hpp⁻¹ (b_p + Wᵀ δc).
    Wt_dc = jnp.einsum("cpij,ci->pj", W, delta_c)
    delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, b_p + Wt_dc)

    new_poses = jax.vmap(se3_exp)(delta_c) @ p.poses
    new_points = p.points + delta_p
    new_p = p._replace(poses=new_poses, points=new_points)
    _, _, _, _, _, new_cost = build_normal_blocks(new_p)

    # Plain damped-GN accept/reject (scalar select keeps it jit-able).
    improved = new_cost < cost
    out = BAProblem(
        poses=jnp.where(improved, new_poses, p.poses),
        points=jnp.where(improved, new_points, p.points),
        obs=p.obs,
        vis=p.vis,
        K=p.K,
    )
    return out, {"cost": cost, "new_cost": new_cost, "accepted": improved}


def optimize_ba(
    p: BAProblem, iters: int = 10, damping: float = 1e-4, fix_cameras: int = 1
):
    costs = []
    for _ in range(iters):
        p, info = ba_step(p, damping, fix_cameras)
        costs.append(info["cost"])
    return p, jnp.stack(costs)
