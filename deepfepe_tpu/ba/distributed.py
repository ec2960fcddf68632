"""Distributed bundle adjustment: points sharded over the mesh, Schur
complement all-reduced over ICI.

The sequence-parallel analogue identified in SURVEY.md §5.7: the point
(landmark) axis is the scalable dimension of BA. Each device holds a shard
of the points + their observation columns, computes its partial normal
blocks and its partial Schur contribution, and the reduced camera system is
summed with one `psum` over the `data` axis (XLA lowers it to an ICI
all-reduce). The dense camera solve is replicated (cameras are few);
point back-substitution stays local to each shard. Numerics match the
single-device `ba_step` exactly up to reduction order.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..geometry.lie import se3_exp
from ..parallel.mesh import DATA_AXIS
from .bundle_adjustment import BAProblem, _jacobians, project


def _local_blocks(poses, points_l, obs_l, vis_l, K):
    """Normal blocks for a local point shard (same math as
    build_normal_blocks, point axis local)."""
    p = BAProblem(poses=poses, points=points_l, obs=obs_l, vis=vis_l, K=K)
    uv, Xc = project(poses, points_l, K)
    r = (uv - obs_l) * vis_l[..., None]
    J_cam, J_pt = _jacobians(p, Xc)
    H_cc = jnp.einsum("cpki,cpkj->cij", J_cam, J_cam)
    H_pp = jnp.einsum("cpki,cpkj->pij", J_pt, J_pt)
    W = jnp.einsum("cpki,cpkj->cpij", J_cam, J_pt)
    b_c = jnp.einsum("cpki,cpk->ci", J_cam, r)
    b_p = jnp.einsum("cpki,cpk->pi", J_pt, r)
    cost = 0.5 * jnp.sum(r * r)
    return H_cc, H_pp, W, b_c, b_p, cost


def make_distributed_ba_step(
    mesh: Mesh, damping: float = 1e-4, fix_cameras: int = 1
):
    """Build a jitted sharded BA step.

    Inputs (global shapes): poses [C,4,4] replicated; points [P,3], obs
    [C,P,2], vis [C,P] sharded on P over the mesh's data axis. P must divide
    by the axis size.
    """

    def step(poses, points, obs, vis, K):
        C = poses.shape[0]

        def shard_fn(poses, points_l, obs_l, vis_l, K):
            H_cc_l, H_pp_l, W_l, b_c_l, b_p_l, cost_l = _local_blocks(
                poses, points_l, obs_l, vis_l, K
            )
            Hpp_d = H_pp_l + damping * jnp.eye(3, dtype=H_pp_l.dtype)
            Hpp_inv = jnp.linalg.inv(Hpp_d)
            WH = jnp.einsum("cpij,pjk->cpik", W_l, Hpp_inv)
            S_part = -jnp.einsum("apik,bpjk->abij", WH, W_l)
            g_part = b_c_l - jnp.einsum("cpik,pk->ci", WH, b_p_l)

            # Global reductions over the point shards (ICI all-reduce).
            H_cc = jax.lax.psum(H_cc_l, DATA_AXIS)
            S_coupling = jax.lax.psum(S_part, DATA_AXIS)
            g = jax.lax.psum(g_part, DATA_AXIS)
            cost = jax.lax.psum(cost_l, DATA_AXIS)

            S = S_coupling
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                H_cc + damping * jnp.eye(6, dtype=H_cc.dtype)
            )
            S_full = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
            g_full = g.reshape(C * 6)
            mask = (jnp.arange(C * 6) >= fix_cameras * 6).astype(S_full.dtype)
            S_full = S_full * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            g_full = g_full * mask
            delta_c = -jnp.linalg.solve(S_full, g_full).reshape(C, 6)

            # Local point back-substitution on this shard only.
            Wt_dc = jnp.einsum("cpij,ci->pj", W_l, delta_c)
            delta_p = -jnp.einsum("pij,pj->pi", Hpp_inv, b_p_l + Wt_dc)

            new_poses = jax.vmap(se3_exp)(delta_c) @ poses
            new_points_l = points_l + delta_p
            return new_poses, new_points_l, cost

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS), P()),
            out_specs=(P(), P(DATA_AXIS), P()),
        )
        return fn(poses, points, obs, vis, K)

    return jax.jit(step)


def shard_ba_inputs(mesh: Mesh, points, obs, vis):
    """Device-put BA arrays with the point axis sharded."""
    s_p = NamedSharding(mesh, P(DATA_AXIS))
    s_cp = NamedSharding(mesh, P(None, DATA_AXIS))
    return (
        jax.device_put(points, s_p),
        jax.device_put(obs, s_cp),
        jax.device_put(vis, s_cp),
    )


def make_distributed_pose_graph_step(
    mesh: Mesh, damping: float = 1e-6, fix_first: bool = True,
    huber_delta: float | None = None,
):
    """Edge-sharded pose-graph Gauss-Newton step.

    The edge set is the scalable axis of a pose graph (keyframe count
    stays modest; loop-closure / skip edges grow superlinearly). Each
    device holds an edge shard, computes its residuals + Jacobian blocks
    and partial normal equations, and the [6N, 6N] camera system is
    summed with one psum over the mesh's data axis — same math as
    pose_graph.gauss_newton_step (parity-tested), same collective
    pattern as the Schur BA above.

    Inputs: poses [N,4,4] replicated; edges [E,2], measurements [E,4,4],
    weights [E,6] sharded on E over the data axis (E must divide by the
    axis size — pad with zero-weight (0,0) self-edges, which contribute
    exactly nothing). `dof_mask` [6] (se(3) order (v, w)) freezes update
    DoF for the two-stage rotation/translation split.
    """

    def step(poses, edges, measurements, weights, dof_mask):
        N = poses.shape[0]

        def shard_fn(poses, edges_l, meas_l, w_l):
            from .pose_graph import _apply_delta, edge_residuals

            w = w_l
            if huber_delta is not None:
                r_now = edge_residuals(poses, edges_l, meas_l)
                rnorm = jnp.linalg.norm(r_now, axis=-1)
                w = w * jnp.minimum(
                    1.0, huber_delta / (rnorm + 1e-12)
                )[:, None]
            sqrt_w = jnp.sqrt(w)

            def residual_of_delta(delta):
                p = _apply_delta(poses, delta.reshape(N, 6))
                r = edge_residuals(p, edges_l, meas_l)
                return (r * sqrt_w).ravel()

            delta0 = jnp.zeros(N * 6, poses.dtype)
            r0 = residual_of_delta(delta0)
            J = jax.jacfwd(residual_of_delta)(delta0)  # [El*6, N*6]
            H = jax.lax.psum(J.T @ J, DATA_AXIS)
            g = jax.lax.psum(J.T @ r0, DATA_AXIS)
            cost = jax.lax.psum(jnp.sum(r0 * r0), DATA_AXIS)

            mask = jnp.ones(N * 6, dtype=bool)
            if fix_first:
                mask = mask & (jnp.arange(N * 6) >= 6)
            mask = mask & jnp.tile(dof_mask.astype(bool), N)
            H = H * mask[:, None] * mask[None, :] + jnp.diag(
                jnp.where(mask, 0.0, 1.0)
            )
            g = g * mask
            H = H + damping * jnp.eye(N * 6, dtype=H.dtype)
            delta = -jnp.linalg.solve(H, g)
            new_poses = _apply_delta(poses, delta.reshape(N, 6))
            return new_poses, cost

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            # The solve consumes psum-reduced (replicated) values; the
            # checker can't prove that through jnp.linalg.solve.
            check_vma=False,
        )
        return fn(poses, edges, measurements, weights)

    return jax.jit(step)


def pad_pose_graph_edges(edges, measurements, weights, multiple: int):
    """Pad the edge axis to a multiple with zero-weight (0,0) identity
    self-edges (residual == 0 and weight == 0: exact no-ops)."""
    E = edges.shape[0]
    En = -(-E // multiple) * multiple
    if En == E:
        return edges, measurements, weights
    pad = En - E
    edges_p = jnp.concatenate(
        [edges, jnp.zeros((pad, 2), edges.dtype)], axis=0
    )
    meas_p = jnp.concatenate(
        [measurements,
         jnp.broadcast_to(jnp.eye(4, dtype=measurements.dtype),
                          (pad, 4, 4))], axis=0
    )
    w6 = weights[:, None] * jnp.ones((1, 6), weights.dtype) \
        if weights.ndim == 1 else weights
    w_p = jnp.concatenate(
        [w6, jnp.zeros((pad, 6), w6.dtype)], axis=0
    )
    return edges_p, meas_p, w_p


def optimize_pose_graph_two_stage_distributed(
    mesh: Mesh, graph, rot_iters: int = 10, trans_iters: int = 10,
    damping: float = 1e-6, huber_delta: float | None = None,
):
    """Two-stage (rotation averaging -> frozen-R translation) pose-graph
    solve with edge-sharded GN steps — the distributed flavor of
    pose_graph.optimize_pose_graph_two_stage. Returns (poses, costs)."""
    axis = mesh.shape[DATA_AXIS]
    w = graph.weights
    w6 = w[:, None] * jnp.ones((1, 6), w.dtype) if w.ndim == 1 else w
    edges, meas, w6 = pad_pose_graph_edges(
        graph.edges, graph.measurements, w6, axis
    )
    step = make_distributed_pose_graph_step(
        mesh, damping=damping, huber_delta=huber_delta
    )
    rot_only = jnp.asarray([0.0, 0, 0, 1, 1, 1], w6.dtype)
    poses = graph.poses
    costs = []
    for _ in range(rot_iters):
        poses, c = step(poses, edges, meas, w6 * rot_only,
                        jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        costs.append(c)
    for _ in range(trans_iters):
        poses, c = step(poses, edges, meas, w6,
                        jnp.asarray([1.0, 1, 1, 0, 0, 0]))
        costs.append(c)
    return poses, jnp.stack(costs)


def make_distributed_sqrt_ba_step(
    mesh: Mesh, damping: float = 1e-4, fix_cameras: int = 1
):
    """Distributed SQUARE-ROOT BA step: landmark shards eliminated by local
    QR, pose system combined by TSQR (tall-skinny QR) over ICI.

    Normal equations are never formed anywhere — each shard reduces its
    nullspace-projected rows to one [6C+1, 6C+1] triangular factor of the
    augmented system [A | b]; the factors are all-gathered (the only
    collective: D*(6C+1)^2 floats over ICI), stacked with the sqrt(λ)
    damping rows and re-factorized, and the triangular pose solve is
    replicated. Same f32-stable math as ba/sqrt_ba.py (Demmel et al. 2021,
    distributed TSQR flavor); landmark back-substitution stays local.
    """

    def step(poses, points, obs, vis, K):
        C = poses.shape[0]
        dtype = points.dtype
        sqrt_l = jnp.sqrt(jnp.asarray(damping, dtype))
        free = (jnp.arange(6 * C) >= 6 * fix_cameras).astype(dtype)

        def shard_fn(poses, points_l, obs_l, vis_l, K):
            p_l = BAProblem(
                poses=poses, points=points_l, obs=obs_l, vis=vis_l, K=K
            )
            from .sqrt_ba import _stacked_jacobians

            r_l, J_l, J_p, cost_l = _stacked_jacobians(p_l)
            Pl = points_l.shape[0]
            pad_l = jnp.broadcast_to(
                sqrt_l * jnp.eye(3, dtype=dtype), (Pl, 3, 3)
            )
            J_l_aug = jnp.concatenate([J_l, pad_l], axis=1)
            J_p_aug = jnp.concatenate(
                [J_p, jnp.zeros((Pl, 3, 6 * C), dtype)], axis=1
            )
            r_aug = jnp.concatenate(
                [r_l, jnp.zeros((Pl, 3), dtype)], axis=1
            )
            Q, R_full = jnp.linalg.qr(J_l_aug, mode="complete")
            R_land = R_full[:, :3, :]
            Jp_rot = jnp.einsum("pmi,pmk->pik", Q, J_p_aug)
            r_rot = jnp.einsum("pmi,pm->pi", Q, r_aug)

            # Local nullspace rows, gauge-masked, with b as an extra column.
            A_loc = Jp_rot[:, 3:, :].reshape(-1, 6 * C) * free[None, :]
            b_loc = r_rot[:, 3:].reshape(-1, 1)
            Ab = jnp.concatenate([A_loc, b_loc], axis=1)

            # Local TSQR reduction to one triangular factor.
            R_loc = jnp.linalg.qr(Ab, mode="r")  # [6C+1, 6C+1]

            # Combine factors across shards (the only communication).
            R_all = jax.lax.all_gather(R_loc, DATA_AXIS)  # [D, 6C+1, 6C+1]
            stacked = R_all.reshape(-1, 6 * C + 1)
            damp_rows = jnp.concatenate(
                [
                    sqrt_l * jnp.eye(6 * C, dtype=dtype),
                    jnp.zeros((6 * C, 1), dtype),
                ],
                axis=1,
            )
            R_fin = jnp.linalg.qr(
                jnp.concatenate([stacked, damp_rows], axis=0), mode="r"
            )
            Rp = R_fin[: 6 * C, : 6 * C]
            c = R_fin[: 6 * C, 6 * C]
            delta_c = -jax.scipy.linalg.solve_triangular(
                Rp, c, lower=False
            )
            delta_c = (delta_c * free).reshape(C, 6)

            rhs = -(
                r_rot[:, :3]
                + jnp.einsum(
                    "pik,k->pi", Jp_rot[:, :3, :], delta_c.reshape(-1)
                )
            )
            delta_p = jax.scipy.linalg.solve_triangular(
                R_land, rhs[..., None], lower=False
            )[..., 0]

            new_poses = jax.vmap(se3_exp)(delta_c) @ poses
            new_points_l = points_l + delta_p
            cost = jax.lax.psum(cost_l, DATA_AXIS)
            return new_poses, new_points_l, cost

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(None, DATA_AXIS),
                      P(None, DATA_AXIS), P()),
            out_specs=(P(), P(DATA_AXIS), P()),
            # The pose update is value-replicated (it derives from the
            # all-gathered TSQR factors), but the checker can't prove
            # replication through qr/solve_triangular.
            check_vma=False,
        )
        return fn(poses, points, obs, vis, K)

    return jax.jit(step)
