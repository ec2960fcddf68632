"""Pose-graph optimization over SE(3) (batched Gauss-Newton, jit-able).

Downstream refinement of the two-view pipeline's relative poses (new
capability per the north star; anchored to the reference's pose chaining
semantics, eval_tools.get_abs_poses :268): nodes are keyframe world poses
T_i (world -> frame-i, the same convention chained by eval.vo), edges are
measured relative transforms T_ij with x_j = T_ij x_i.

Residual per edge: r = log(T_ij_meas⁻¹ · T_j · T_i⁻¹) ∈ se(3). Gauss-Newton
with analytic-free Jacobians via jax.jacfwd over the (static-size) edge set,
normal equations assembled by scatter-add and solved densely — fine to a few
hundred keyframes; the distributed Schur machinery (ba/bundle_adjustment)
covers the large-scale case.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp, se3_log


class PoseGraph(NamedTuple):
    poses: jnp.ndarray     # [N, 4, 4] current world->frame estimates
    edges: jnp.ndarray     # [E, 2] int (i, j)
    measurements: jnp.ndarray  # [E, 4, 4] measured T_ij
    weights: jnp.ndarray   # [E] scalar or [E, 6] per-component (v, w)
    #                        information weights — per-component lets
    #                        translation-reliable / rotation-noisy edges
    #                        (e.g. wide-baseline skip edges) contribute
    #                        only the part they measure well


def edge_residuals(
    poses: jnp.ndarray, edges: jnp.ndarray, measurements: jnp.ndarray
) -> jnp.ndarray:
    """se(3) residuals [E, 6] of all edges."""
    Ti = poses[edges[:, 0]]
    Tj = poses[edges[:, 1]]
    T_rel = Tj @ jnp.linalg.inv(Ti)
    err = jnp.linalg.inv(measurements) @ T_rel
    return jax.vmap(se3_log)(err)


def _apply_delta(poses: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative local update: T_i <- exp(δ_i) T_i. δ: [N, 6]."""
    return jax.vmap(se3_exp)(delta) @ poses


def gauss_newton_step(
    graph: PoseGraph,
    damping: float = 1e-6,
    fix_first: bool = True,
    huber_delta: float | None = None,
    dof_mask: jnp.ndarray | None = None,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """One (Levenberg-damped) Gauss-Newton step. Returns (graph, mean |r|²).

    `huber_delta` enables an IRLS Huber kernel on the per-edge residual
    norm: edges with ||r|| > delta get down-weighted by delta/||r||, so a
    few catastrophic measurements (e.g. failed wide-baseline skip edges)
    cannot corrupt the whole trajectory — without it GN is quadratic and
    outlier edges dominate.

    `dof_mask` (6-vector of 0/1, se(3) order (v, w)) freezes per-node
    update DoF: entries with 0 receive no update. This enables staged
    solves (rotation-only averaging, then translation-only refinement)
    where full 6-DoF GN would let translation misfit bend rotations.
    """
    N = graph.poses.shape[0]

    w = graph.weights
    w = w[:, None] if w.ndim == 1 else w  # [E, 1] or [E, 6]
    if huber_delta is not None:
        r_now = edge_residuals(
            graph.poses, graph.edges, graph.measurements
        )
        rnorm = jnp.linalg.norm(r_now, axis=-1)
        w = w * jnp.minimum(1.0, huber_delta / (rnorm + 1e-12))[:, None]
    sqrt_w = jnp.sqrt(w)

    def residual_of_delta(delta):
        poses = _apply_delta(graph.poses, delta.reshape(N, 6))
        r = edge_residuals(poses, graph.edges, graph.measurements)
        return (r * sqrt_w).ravel()

    delta0 = jnp.zeros(N * 6, graph.poses.dtype)
    r0 = residual_of_delta(delta0)
    J = jax.jacfwd(residual_of_delta)(delta0)  # [E*6, N*6]

    H = J.T @ J
    g = J.T @ r0
    mask = jnp.ones(N * 6, dtype=bool)
    if fix_first:
        # Gauge fixing: clamp the first pose.
        mask = mask & (jnp.arange(N * 6) >= 6)
    if dof_mask is not None:
        mask = mask & jnp.tile(
            jnp.asarray(dof_mask).astype(bool), N
        )
    # Frozen DoF: zero their rows/cols and put identity on the diagonal so
    # the dense solve leaves them exactly at zero update.
    H = H * mask[:, None] * mask[None, :] + jnp.diag(
        jnp.where(mask, 0.0, 1.0)
    )
    g = g * mask
    H = H + damping * jnp.eye(N * 6, dtype=H.dtype)
    delta = -jnp.linalg.solve(H, g)
    new_poses = _apply_delta(graph.poses, delta.reshape(N, 6))
    return graph._replace(poses=new_poses), jnp.mean(r0 * r0)


def _edge_jacobians(graph: PoseGraph, sqrt_w: jnp.ndarray):
    """Per-edge residual + analytic-width Jacobian blocks.

    Each edge couples exactly two poses, so its weighted residual
    r_e(δ_i, δ_j) has a [6, 6] Jacobian per endpoint — jacfwd over 12
    local variables vmapped across edges, instead of the dense
    [6E, 6N] jacobian of gauss_newton_step. Returns (r [E,6],
    Ji [E,6,6], Jj [E,6,6])."""
    Ti = graph.poses[graph.edges[:, 0]]
    Tj = graph.poses[graph.edges[:, 1]]
    M = graph.measurements

    def res(di, dj, Ti_e, Tj_e, M_e, sw_e):
        T_rel = (se3_exp(dj) @ Tj_e) @ jnp.linalg.inv(se3_exp(di) @ Ti_e)
        return sw_e * se3_log(jnp.linalg.inv(M_e) @ T_rel)

    zero = jnp.zeros((graph.edges.shape[0], 6), graph.poses.dtype)
    r = jax.vmap(res)(zero, zero, Ti, Tj, M, sqrt_w)
    Ji = jax.vmap(jax.jacfwd(res, argnums=0))(zero, zero, Ti, Tj, M, sqrt_w)
    Jj = jax.vmap(jax.jacfwd(res, argnums=1))(zero, zero, Ti, Tj, M, sqrt_w)
    return r, Ji, Jj


def gauss_newton_step_cg(
    graph: PoseGraph,
    damping: float = 1e-6,
    fix_first: bool = True,
    huber_delta: float | None = None,
    dof_mask: jnp.ndarray | None = None,
    cg_iters: int = 200,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Matrix-free Gauss-Newton step: never materializes H.

    The normal-equation matvec Hx = Σ_e J_eᵀ(J_e x_e) is two gathers, a
    batched [6,6] matmul pair, and a segment-sum scatter per application
    — O(E) memory and work, so 10k-100k-frame graphs fit where the dense
    [6N, 6N] assembly of `gauss_newton_step` cannot (that path stays the
    exact reference for N ≤ a few hundred). Solved with block-Jacobi
    preconditioned CG; chain-dominated graphs are ill-conditioned
    (condition ~ N²) so `cg_iters` should grow with diameter — the
    per-iteration cost on TPU is microseconds (one fused segment-sum).
    Gauge fixing and `dof_mask` are projections applied inside the
    matvec/preconditioner, keeping frozen DoF exactly at zero update."""
    N = graph.poses.shape[0]
    E = graph.edges.shape[0]
    dtype = graph.poses.dtype

    w = graph.weights
    w = w[:, None] * jnp.ones((1, 6), dtype) if w.ndim == 1 else w
    if huber_delta is not None:
        r_now = edge_residuals(graph.poses, graph.edges, graph.measurements)
        rnorm = jnp.linalg.norm(r_now, axis=-1)
        w = w * jnp.minimum(1.0, huber_delta / (rnorm + 1e-12))[:, None]
    sqrt_w = jnp.sqrt(w)

    r, Ji, Jj = _edge_jacobians(graph, sqrt_w)
    ei, ej = graph.edges[:, 0], graph.edges[:, 1]

    free = jnp.ones((N, 6), dtype)
    if fix_first:
        free = free.at[0].set(0.0)
    if dof_mask is not None:
        free = free * jnp.asarray(dof_mask, dtype)[None, :]

    def scatter(vals_i, vals_j):
        return jax.ops.segment_sum(
            jnp.concatenate([vals_i, vals_j], axis=0),
            jnp.concatenate([ei, ej], axis=0),
            num_segments=N,
        )

    def matvec(x):  # x: [N, 6]
        x = x * free
        y = jnp.einsum("eab,eb->ea", Ji, x[ei]) + jnp.einsum(
            "eab,eb->ea", Jj, x[ej]
        )  # [E, 6]
        out = scatter(
            jnp.einsum("eab,ea->eb", Ji, y),
            jnp.einsum("eab,ea->eb", Jj, y),
        )
        return (out + damping * x) * free

    g = scatter(
        jnp.einsum("eab,ea->eb", Ji, r), jnp.einsum("eab,ea->eb", Jj, r)
    ) * free

    # Block-Jacobi preconditioner: per-node 6x6 diagonal blocks of H.
    B = jax.ops.segment_sum(
        jnp.concatenate(
            [jnp.einsum("eab,eac->ebc", Ji, Ji),
             jnp.einsum("eab,eac->ebc", Jj, Jj)], axis=0
        ),
        jnp.concatenate([ei, ej], axis=0),
        num_segments=N,
    ) + (damping + 1e-12) * jnp.eye(6, dtype=dtype)
    # Frozen DoF -> zero rows/cols, 1 on the diagonal (block inverse
    # stays well-posed and frozen components map to zero).
    fm = free[:, :, None] * free[:, None, :]
    B = B * fm + jnp.einsum(
        "nd,de->nde", 1.0 - free, jnp.eye(6, dtype=dtype)
    )
    B_inv = jnp.linalg.inv(B)

    def precond(x):
        return jnp.einsum("nab,nb->na", B_inv, x) * free

    # Preconditioned CG on H delta = -g.
    b = -g

    def cg_body(_, state):
        x, p, rr, rz = state
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(denom > 0, rz / (denom + 1e-30), 0.0)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = precond(rr)
        rz_new = jnp.sum(rr * z)
        beta = jnp.where(rz > 0, rz_new / (rz + 1e-30), 0.0)
        p = z + beta * p
        return x, p, rr, rz_new

    x0 = jnp.zeros((N, 6), dtype)
    z0 = precond(b)
    state = (x0, z0, b, jnp.sum(b * z0))
    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, state)

    new_poses = _apply_delta(graph.poses, x * free)
    return graph._replace(poses=new_poses), jnp.mean(r * r)


def optimize_pose_graph(
    graph: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float | None = None,
    dof_mask: jnp.ndarray | None = None,
    solver: str = "auto",
    cg_iters: int = 200,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Run `iters` GN steps; returns (graph, per-iter mean residual²).

    solver: 'dense' (exact normal equations — N ≤ a few hundred),
    'cg' (matrix-free, scales to 10k+ frames), or 'auto' (dense below
    512 nodes)."""
    if solver == "auto":
        solver = "dense" if graph.poses.shape[0] <= 512 else "cg"
    errs = []
    for _ in range(iters):
        if solver == "cg":
            graph, e = gauss_newton_step_cg(
                graph, damping, huber_delta=huber_delta,
                dof_mask=dof_mask, cg_iters=cg_iters,
            )
        else:
            graph, e = gauss_newton_step(
                graph, damping, huber_delta=huber_delta, dof_mask=dof_mask
            )
        errs.append(e)
    return graph, jnp.stack(errs)


def optimize_pose_graph_two_stage(
    graph: PoseGraph,
    rot_iters: int = 10,
    trans_iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float | None = None,
    solver: str = "auto",
    cg_iters: int = 200,
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Rotation averaging, then translation refinement with rotations frozen.

    Monocular two-view edges measure rotation well but translation only up
    to scale/noise; joint 6-DoF GN lets skip-edge translation misfit bend
    rotations (measured: rot drift 24.7 -> ~192 deg/100m on the vo_sp_ft
    sequence, experiments/vo_pose_graph_ft*). The classical global-SfM cure
    (rotation averaging + translation averaging, cf. Govindu/1DSfM) splits
    the solve:

      1. SO(3) stage: residual weights keep only the ω components and the
         update is masked to rotation DoF — pure multi-edge rotation
         averaging, translation misfit cannot touch R.
      2. Translation stage: rotations frozen (update masked to v DoF),
         full edge weights — skip edges now only average down translation
         noise.

    Returns (graph, concat per-iter residuals of both stages).
    """
    w = graph.weights
    w6 = w[:, None] * jnp.ones((1, 6), w.dtype) if w.ndim == 1 else w
    rot_only = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], w6.dtype)
    g_rot = graph._replace(weights=w6 * rot_only)
    g_rot, errs_r = optimize_pose_graph(
        g_rot, iters=rot_iters, damping=damping, huber_delta=huber_delta,
        dof_mask=jnp.asarray([0, 0, 0, 1, 1, 1]),
        solver=solver, cg_iters=cg_iters,
    )
    g_trans = graph._replace(poses=g_rot.poses)
    g_trans, errs_t = optimize_pose_graph(
        g_trans, iters=trans_iters, damping=damping, huber_delta=huber_delta,
        dof_mask=jnp.asarray([1, 1, 1, 0, 0, 0]),
        solver=solver, cg_iters=cg_iters,
    )
    return g_trans, jnp.concatenate([errs_r, errs_t])


def graph_from_odometry(
    rel_poses: jnp.ndarray,
    loop_edges: jnp.ndarray | None = None,
    loop_measurements: jnp.ndarray | None = None,
    odo_weight=1.0,
    loop_weight=1.0,
) -> PoseGraph:
    """Build a graph from sequential relative poses (+ optional loop
    closures). rel_poses: [N-1, 4, 4] frame i -> i+1; initial poses chained.
    `odo_weight` / `loop_weight` may be scalars or 6-vectors (v, w) for
    per-component information (see PoseGraph.weights).
    """
    n = rel_poses.shape[0] + 1
    poses = [jnp.eye(4, dtype=rel_poses.dtype)]
    for k in range(n - 1):
        poses.append(rel_poses[k] @ poses[-1])
    poses = jnp.stack(poses)

    def _tile_w(w, count):
        w = jnp.asarray(w, rel_poses.dtype)
        if w.ndim == 0:
            return jnp.full((count,), w, rel_poses.dtype)
        return jnp.tile(w[None, :], (count, 1))

    edges = jnp.stack(
        [jnp.arange(n - 1), jnp.arange(1, n)], axis=-1
    ).astype(jnp.int32)
    meas = rel_poses
    weights = _tile_w(odo_weight, n - 1)
    if loop_edges is not None:
        edges = jnp.concatenate([edges, loop_edges.astype(jnp.int32)])
        meas = jnp.concatenate([meas, loop_measurements])
        lw = _tile_w(loop_weight, len(loop_edges))
        if weights.ndim != lw.ndim:  # mixed scalar / per-component
            if weights.ndim == 1:
                weights = weights[:, None] * jnp.ones((1, 6), rel_poses.dtype)
            if lw.ndim == 1:
                lw = lw[:, None] * jnp.ones((1, 6), rel_poses.dtype)
        weights = jnp.concatenate([weights, lw])
    return PoseGraph(poses=poses, edges=edges, measurements=meas, weights=weights)
