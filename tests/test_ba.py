"""Pose-graph + bundle-adjustment tests, incl. the 8-device sharded path.

Correctness is established against oracles we control (SURVEY.md §7.3):
synthetic scenes with exact gt, noise-perturbed initializations, and the
single-device dense implementation as reference for the distributed one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_pose
from deepfepe_tpu import ba
from deepfepe_tpu.geometry.lie import se3_exp, se3_log, so3_exp, so3_log
from deepfepe_tpu.parallel import make_mesh


def test_lie_roundtrips(rng):
    w = rng.randn(32, 3).astype(np.float32) * 0.8
    R = so3_exp(jnp.asarray(w))
    w_back = so3_log(R)
    np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-4)

    xi = rng.randn(16, 6).astype(np.float32) * 0.5
    T = se3_exp(jnp.asarray(xi))
    xi_back = jax.vmap(se3_log)(T)
    np.testing.assert_allclose(np.asarray(xi_back), xi, atol=1e-4)
    # Valid SE(3): orthonormal rotation, unit bottom row.
    RtR = np.asarray(jnp.swapaxes(T[:, :3, :3], -1, -2) @ T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)


def _make_trajectory(rng, n, drift=0.02):
    """Ground-truth world->frame poses + noisy odometry measurements."""
    gt = [np.eye(4)]
    rels = []
    for _ in range(n - 1):
        R, t = random_pose(rng, max_angle_deg=10, t_scale=1.0)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        rels.append(T)
        gt.append(T @ gt[-1])
    return np.stack(gt), np.stack(rels)


@pytest.mark.slow
def test_pose_graph_recovers_from_drift(rng):
    gt, rels = _make_trajectory(rng, 8)
    # Perturb odometry measurements -> drifting initial chain.
    noise = [np.asarray(se3_exp(jnp.asarray(
        rng.randn(6).astype(np.float32) * 0.03))) for _ in rels]
    rels_noisy = np.stack([n @ r for n, r in zip(noise, rels)])
    # Loop closure: exact measurement between first and last frame.
    T_0n = jnp.asarray((gt[-1] @ np.linalg.inv(gt[0])).astype(np.float32))
    graph = ba.graph_from_odometry(
        jnp.asarray(rels_noisy, jnp.float32),
        loop_edges=jnp.asarray([[0, 7]]),
        loop_measurements=T_0n[None],
        loop_weight=10.0,
    )
    r0 = ba.edge_residuals(graph.poses, graph.edges, graph.measurements)
    graph2, errs = ba.optimize_pose_graph(graph, iters=8)
    r1 = ba.edge_residuals(graph2.poses, graph2.edges, graph2.measurements)
    assert float(jnp.mean(r1**2)) < float(jnp.mean(r0**2)) * 0.5
    # End pose closer to gt after optimization.
    end_err0 = np.linalg.norm(np.asarray(graph.poses[-1]) - gt[-1])
    end_err1 = np.linalg.norm(np.asarray(graph2.poses[-1]) - gt[-1])
    assert end_err1 < end_err0


@pytest.mark.slow
def test_pose_graph_dof_mask_freezes_rotations(rng):
    gt, rels = _make_trajectory(rng, 6)
    rels_noisy = rels.copy()
    rels_noisy[:, :3, 3] += rng.randn(len(rels), 3) * 0.05
    graph = ba.graph_from_odometry(jnp.asarray(rels_noisy, jnp.float32))
    graph2, _ = ba.gauss_newton_step(
        graph, dof_mask=jnp.asarray([1, 1, 1, 0, 0, 0])
    )
    np.testing.assert_allclose(
        np.asarray(graph2.poses[:, :3, :3]),
        np.asarray(graph.poses[:, :3, :3]),
        atol=1e-6,
    )


@pytest.mark.slow
def test_pose_graph_two_stage_preserves_rotations(rng):
    """Regression for the skip-edge trade-off (ROADMAP: vo_pose_graph_ft*).

    Skip edges with informative translation but noisy rotation: joint 6-DoF
    GN absorbs translation misfit by bending rotations; the two-stage solve
    (rotation averaging, then frozen-R translation refinement) must keep
    rotations at least as accurate while still improving translation over
    the drifting initial chain.
    """
    gt, rels = _make_trajectory(rng, 10)
    # Monocular-like odometry: accurate rotations, noisy translations.
    rels_noisy = rels.copy()
    rels_noisy[:, :3, 3] += rng.randn(len(rels), 3) * 0.08
    # Skip edges i -> i+2: exact translation, heavily corrupted rotation.
    skip_edges, skip_meas = [], []
    for i in range(len(gt) - 2):
        T = (gt[i + 2] @ np.linalg.inv(gt[i])).copy()
        Rn = np.asarray(
            so3_exp(jnp.asarray(rng.randn(3).astype(np.float32) * 0.3))
        )
        T[:3, :3] = Rn @ T[:3, :3]
        skip_edges.append([i, i + 2])
        skip_meas.append(T)
    graph = ba.graph_from_odometry(
        jnp.asarray(rels_noisy, jnp.float32),
        loop_edges=jnp.asarray(skip_edges),
        loop_measurements=jnp.asarray(np.stack(skip_meas), jnp.float32),
        odo_weight=1.0,
        # Rotation weight exactly 0: safe under the two-stage solve (frozen
        # R in stage 2), while joint GN turns the unconstrained rotations
        # into free DoF that absorb skip-edge translation misfit.
        loop_weight=jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0]),
    )
    joint, _ = ba.optimize_pose_graph(graph, iters=10)
    staged, _ = ba.optimize_pose_graph_two_stage(
        graph, rot_iters=10, trans_iters=10
    )

    def rot_err_deg(poses):
        d = np.asarray(poses)[:, :3, :3] @ gt[:, :3, :3].transpose(0, 2, 1)
        tr = np.clip((np.trace(d, axis1=1, axis2=2) - 1) / 2, -1, 1)
        return float(np.mean(np.degrees(np.arccos(tr))))

    def trans_err(poses):
        return float(np.mean(np.linalg.norm(
            np.asarray(poses)[:, :3, 3] - gt[:, :3, 3], axis=1
        )))

    assert rot_err_deg(staged.poses) <= rot_err_deg(joint.poses) + 1e-6, (
        rot_err_deg(staged.poses), rot_err_deg(joint.poses)
    )
    assert trans_err(staged.poses) < trans_err(graph.poses), (
        trans_err(staged.poses), trans_err(graph.poses)
    )


def _make_ba_problem(rng, C=4, P=64, noise_px=0.0, perturb=0.0):
    f = 300.0
    K = np.array([[f, 0, 160.0], [0, f, 120.0], [0, 0, 1.0]])
    X = np.stack(
        [rng.uniform(-5, 5, P), rng.uniform(-3, 3, P), rng.uniform(8, 20, P)],
        -1,
    )
    poses = [np.eye(4)]
    for _ in range(C - 1):
        R, t = random_pose(rng, max_angle_deg=5, t_scale=0.5)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        poses.append(T @ poses[-1])
    poses = np.stack(poses)
    obs = np.zeros((C, P, 2))
    vis = np.ones((C, P))
    for c in range(C):
        Xc = X @ poses[c][:3, :3].T + poses[c][:3, 3]
        uv = (Xc / Xc[:, 2:3]) @ K.T
        obs[c] = uv[:, :2] + rng.randn(P, 2) * noise_px
    # Perturb initial estimates.
    poses_init = poses.copy()
    X_init = X + rng.randn(P, 3) * perturb
    for c in range(1, C):
        xi = rng.randn(6).astype(np.float32) * perturb * 0.1
        poses_init[c] = np.asarray(se3_exp(jnp.asarray(xi))) @ poses_init[c]
    prob = ba.BAProblem(
        poses=jnp.asarray(poses_init, jnp.float32),
        points=jnp.asarray(X_init, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        vis=jnp.asarray(vis, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
    )
    return prob, poses, X


def test_ba_converges_to_gt(rng):
    prob, poses_gt, X_gt = _make_ba_problem(rng, perturb=0.3)
    r0, _ = ba.reprojection_residuals(prob)
    cost0 = float(jnp.sum(r0**2))
    prob2, costs = ba.optimize_ba(prob, iters=12, damping=1e-4)
    r1, _ = ba.reprojection_residuals(prob2)
    cost1 = float(jnp.sum(r1**2))
    assert cost1 < cost0 * 1e-3, (cost0, cost1)


def test_ba_jacobians_match_autodiff(rng):
    prob, _, _ = _make_ba_problem(rng, C=3, P=16, perturb=0.1)
    H_cc, H_pp, W, b_c, b_p, cost = ba.build_normal_blocks(prob)

    # Autodiff oracle: full J via jacfwd on flattened (cam tangents, points).
    C, P = prob.obs.shape[:2]

    def residual(delta_and_points):
        d_c = delta_and_points[: C * 6].reshape(C, 6)
        d_p = delta_and_points[C * 6 :].reshape(P, 3)
        poses = jax.vmap(se3_exp)(d_c) @ prob.poses
        pts = prob.points + d_p
        uv, _ = ba.project(poses, pts, prob.K)
        return ((uv - prob.obs) * prob.vis[..., None]).ravel()

    z = jnp.zeros(C * 6 + P * 3)
    J = jax.jacfwd(residual)(z)
    r = residual(z)
    H = J.T @ J
    b = J.T @ r
    H_cc_ref = H[: C * 6, : C * 6].reshape(C, 6, C, 6)
    H_pp_ref = H[C * 6 :, C * 6 :].reshape(P, 3, P, 3)
    W_ref = H[: C * 6, C * 6 :].reshape(C, 6, P, 3)

    for c in range(C):
        np.testing.assert_allclose(
            np.asarray(H_cc[c]), np.asarray(H_cc_ref[c, :, c]), rtol=2e-2,
            atol=1e-2,
        )
    for p_i in range(P):
        np.testing.assert_allclose(
            np.asarray(H_pp[p_i]), np.asarray(H_pp_ref[p_i, :, p_i]),
            rtol=2e-2, atol=1e-2,
        )
    np.testing.assert_allclose(
        np.asarray(W), np.asarray(W_ref.transpose(0, 2, 1, 3)), rtol=2e-2,
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(b_c), np.asarray(b[: C * 6]).reshape(C, 6), rtol=2e-2,
        atol=1e-2,
    )


def test_distributed_ba_matches_single_device(rng):
    prob, _, _ = _make_ba_problem(rng, C=3, P=64, perturb=0.2)
    mesh = make_mesh(n_data=8)
    step = ba.make_distributed_ba_step(mesh, damping=1e-4, fix_cameras=1)
    pts_s, obs_s, vis_s = ba.shard_ba_inputs(
        mesh, prob.points, prob.obs, prob.vis
    )
    poses_d, points_d, cost_d = step(prob.poses, pts_s, obs_s, vis_s, prob.K)

    ref, info = ba.ba_step(prob, damping=1e-4, fix_cameras=1)
    np.testing.assert_allclose(
        float(cost_d), float(info["cost"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(poses_d), np.asarray(ref.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(points_d), np.asarray(ref.points), rtol=2e-3, atol=2e-2
    )

    # And it converges when iterated.
    poses, pts = prob.poses, pts_s
    obs, vis = obs_s, vis_s
    costs = []
    for _ in range(8):
        poses, pts, c = step(poses, pts, obs, vis, prob.K)
        costs.append(float(c))
    assert costs[-1] < costs[0] * 1e-2, costs


def test_sqrt_ba_step_matches_schur(rng):
    """One damped-GN step via QR marginalization == the Schur step (both
    solve the same Levenberg system; f64)."""
    from deepfepe_tpu.ba.sqrt_ba import sqrt_ba_step

    prob, _, _ = _make_ba_problem(rng, C=4, P=48, perturb=0.2)
    prob = ba.BAProblem(*[jnp.asarray(a, jnp.float64) for a in prob])

    p_schur, info_s = ba.ba_step(prob, damping=1e-3)
    p_sqrt, info_q = sqrt_ba_step(prob, damping=1e-3)

    assert bool(info_s["accepted"]) and bool(info_q["accepted"])
    np.testing.assert_allclose(
        np.asarray(p_sqrt.poses), np.asarray(p_schur.poses),
        rtol=0, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(p_sqrt.points), np.asarray(p_schur.points),
        rtol=0, atol=1e-7,
    )
    assert abs(float(info_q["new_cost"]) - float(info_s["new_cost"])) < 1e-8


def test_sqrt_ba_converges_in_f32(rng):
    """The square-root path keeps full convergence in pure float32 — the
    working precision the Schur normal equations squander (the point of
    sqrt-BA on TPUs, PAPERS.md Demmel et al. 2021)."""
    from deepfepe_tpu.ba.sqrt_ba import optimize_sqrt_ba

    prob, _, _ = _make_ba_problem(rng, C=4, P=64, perturb=0.3)
    prob32 = ba.BAProblem(*[jnp.asarray(a, jnp.float32) for a in prob])

    r0, _ = ba.reprojection_residuals(prob32)
    cost0 = float(jnp.sum(r0**2))
    out, costs = optimize_sqrt_ba(prob32, iters=12, damping=1e-4)
    assert out.points.dtype == jnp.float32
    r1, _ = ba.reprojection_residuals(out)
    cost1 = float(jnp.sum(r1**2))
    assert cost1 < cost0 * 1e-3, (cost0, cost1)

    # And it matches the f64 Schur optimum's cost to f32 precision.
    prob64 = ba.BAProblem(*[jnp.asarray(a, jnp.float64) for a in prob])
    ref, _ = ba.optimize_ba(prob64, iters=12, damping=1e-4)
    rr, _ = ba.reprojection_residuals(ref)
    ref_cost = float(jnp.sum(rr**2))
    assert cost1 <= ref_cost * 1.5 + 1e-6, (cost1, ref_cost)


def test_distributed_sqrt_ba_matches_single_device(rng):
    """TSQR-distributed sqrt-BA step == single-device sqrt_ba_step on an
    8-shard landmark axis."""
    from deepfepe_tpu.ba.distributed import (
        make_distributed_sqrt_ba_step,
        shard_ba_inputs,
    )
    from deepfepe_tpu.ba.sqrt_ba import sqrt_ba_step
    from deepfepe_tpu.parallel import make_mesh

    prob, _, _ = _make_ba_problem(rng, C=4, P=64, perturb=0.2)
    prob = ba.BAProblem(*[jnp.asarray(a, jnp.float64) for a in prob])

    ref, _ = sqrt_ba_step(prob, damping=1e-3)

    mesh = make_mesh(n_data=8)
    step = make_distributed_sqrt_ba_step(mesh, damping=1e-3)
    pts_s, obs_s, vis_s = shard_ba_inputs(
        mesh, prob.points, prob.obs, prob.vis
    )
    new_poses, new_points, cost = step(
        prob.poses, pts_s, obs_s, vis_s, prob.K
    )
    np.testing.assert_allclose(
        np.asarray(new_poses), np.asarray(ref.poses), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(new_points), np.asarray(ref.points), atol=1e-8
    )


def test_distributed_pose_graph_matches_single_device(rng):
    """Edge-sharded GN step + two-stage solve == the single-device
    pose_graph implementation on an 8-shard edge axis (incl. zero-weight
    self-edge padding)."""
    from deepfepe_tpu.ba.distributed import (
        make_distributed_pose_graph_step,
        optimize_pose_graph_two_stage_distributed,
        pad_pose_graph_edges,
    )

    gt, rels = _make_trajectory(rng, 7)
    noise = [np.asarray(se3_exp(jnp.asarray(
        rng.randn(6).astype(np.float32) * 0.05))) for _ in rels]
    rels_noisy = np.stack([n @ r for n, r in zip(noise, rels)])
    T_0n = jnp.asarray((gt[-1] @ np.linalg.inv(gt[0])).astype(np.float32))
    graph = ba.graph_from_odometry(
        jnp.asarray(rels_noisy, jnp.float32),
        loop_edges=jnp.asarray([[0, 6]]),
        loop_measurements=T_0n[None],
        loop_weight=5.0,
    )  # 7 edges -> pads to 8
    mesh = make_mesh(n_data=8)

    # Single GN step parity (full 6-DoF mask).
    ref_g, ref_cost = ba.gauss_newton_step(graph, damping=1e-6)
    w6 = graph.weights[:, None] * jnp.ones((1, 6), jnp.float32)
    edges, meas, w6p = pad_pose_graph_edges(
        graph.edges, graph.measurements, w6, 8
    )
    step = make_distributed_pose_graph_step(mesh, damping=1e-6)
    poses_d, cost_d = step(graph.poses, edges, meas, w6p,
                           jnp.ones(6))
    np.testing.assert_allclose(
        np.asarray(poses_d), np.asarray(ref_g.poses), atol=2e-5
    )
    # Single-device reports the mean weighted r^2; distributed the sum.
    np.testing.assert_allclose(
        float(cost_d),
        float(ref_cost) * graph.edges.shape[0] * 6, rtol=1e-5
    )

    # Two-stage solve parity.
    ref2, _ = ba.optimize_pose_graph_two_stage(
        graph, rot_iters=4, trans_iters=4, damping=1e-6
    )
    poses2, costs = optimize_pose_graph_two_stage_distributed(
        mesh, graph, rot_iters=4, trans_iters=4, damping=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(poses2), np.asarray(ref2.poses), atol=5e-5
    )
    assert float(costs[-1]) < float(costs[0])


def test_two_view_sqrt_refinement_improves_pose(rng):
    """BA polish on a noisy two-view estimate cuts rotation AND translation
    angle error (batched over pairs)."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import synthetic_pair

    from deepfepe_tpu.eval.refine import refine_two_view_batch
    from deepfepe_tpu.geometry.rotations import rotation_angle_error
    from deepfepe_tpu.geometry.rotations import vector_angle

    B, N = 6, 200
    ms, ws, Ks, R0s, t0s, Rg, tg = [], [], [], [], [], [], []
    for _ in range(B):
        d = synthetic_pair(rng, n=N, noise=0.8, outlier_frac=0.15)
        ms.append(np.concatenate([d["x1"], d["x2"]], -1))
        # Inlier-ish weights: outliers get small weight (the solver's
        # learned weights play this role in the pipeline).
        from deepfepe_tpu.geometry import epi_distance
        dist, _, _ = epi_distance(
            jnp.asarray(d["F"]), jnp.asarray(d["x1"]), jnp.asarray(d["x2"])
        )
        w = np.asarray(jnp.exp(-np.asarray(dist)))
        ws.append(w)
        Ks.append(d["K"])
        # Perturb gt pose for the init (solver-quality estimate).
        ax = rng.randn(3); ax /= np.linalg.norm(ax)
        a = np.deg2rad(1.5)
        Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                       [-ax[1], ax[0], 0]])
        dR = np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * Kx @ Kx
        R0s.append(dR @ d["R"])
        tp = d["t"] + 0.08 * rng.randn(3)
        t0s.append(tp / np.linalg.norm(tp))
        Rg.append(d["R"]); tg.append(d["t"] / np.linalg.norm(d["t"]))

    to = lambda x: jnp.asarray(np.stack(x), jnp.float64)
    R_ref, t_ref, info = refine_two_view_batch(
        to(ms), to(ws), to(Ks), to(R0s), to(t0s), iters=6
    )

    def errs(Rs, ts):
        eR = np.asarray(rotation_angle_error(jnp.asarray(Rs), to(Rg)))
        et = np.asarray(vector_angle(jnp.asarray(ts), to(tg)))
        et = np.minimum(et, 180.0 - et)  # sign-invariant
        return eR, et

    eR0, et0 = errs(to(R0s), to(t0s))
    eR1, et1 = errs(R_ref, t_ref)
    # Median errors drop substantially.
    assert np.median(eR1) < 0.6 * np.median(eR0), (np.median(eR0),
                                                   np.median(eR1))
    assert np.median(et1) < 0.6 * np.median(et0), (np.median(et0),
                                                   np.median(et1))
    assert np.all(np.isfinite(np.asarray(info["final_rms_px"])))


def test_refine_acceptance_guard(rng):
    """--refine_ba safety (VERDICT r2 weak #3): the per-pair acceptance
    keeps the INPUT pose when (a) too few effective matches support the
    solve (the measured sparse qt-trained-SP regression domain, ~140
    matches/pair) or (b) the refinement failed to reduce its own robust
    cost; dense well-supported pairs still get the full polish."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import synthetic_pair

    from deepfepe_tpu.eval.refine import refine_two_view_batch

    # Sparse scenario: 140 noisy matches, init pose = gt (the solver
    # 'knows more' than the matches support — refinement would regress).
    B, N = 2, 140
    ms, ws, Ks, R0s, t0s = [], [], [], [], []
    for _ in range(B):
        d = synthetic_pair(rng, n=N, noise=2.0)
        ms.append(np.concatenate([d["x1"], d["x2"]], -1))
        ws.append(np.ones(N))
        Ks.append(d["K"])
        R0s.append(d["R"])
        t0s.append(d["t"] / np.linalg.norm(d["t"]))
    to = lambda x: jnp.asarray(np.stack(x), jnp.float64)

    R_ref, t_ref, info = refine_two_view_batch(
        to(ms), to(ws), to(Ks), to(R0s), to(t0s), iters=6,
        min_matches=200,  # the CLI default
    )
    assert not np.any(np.asarray(info["accepted"]))
    np.testing.assert_allclose(np.asarray(R_ref), np.stack(R0s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_ref), np.stack(t0s), atol=1e-12)

    # Same pairs with the guard threshold below N: the refinement engages
    # (cost decreases — these are zero-mean-noise pairs).
    R2, t2, info2 = refine_two_view_batch(
        to(ms), to(ws), to(Ks), to(R0s), to(t0s), iters=6, min_matches=50,
    )
    assert np.all(np.asarray(info2["accepted"]))
    assert np.any(np.abs(np.asarray(R2) - np.stack(R0s)) > 1e-9)
    assert np.all(
        np.asarray(info2["cost_after"]) <= np.asarray(info2["cost_before"])
    )


def test_pose_graph_cg_matches_dense(rng):
    """The matrix-free CG Gauss-Newton step (block-Jacobi PCG over
    per-edge [6,6] Jacobian blocks) must reproduce the dense
    normal-equation step — same H, different solve — on a chain+skip
    graph, including gauge fixing, per-component weights, and dof
    masks."""
    from deepfepe_tpu.ba.pose_graph import (
        gauss_newton_step,
        gauss_newton_step_cg,
        graph_from_odometry,
    )
    from deepfepe_tpu.geometry.lie import se3_exp

    N = 40
    poses_gt = [np.eye(4)]
    for _ in range(N - 1):
        T = np.eye(4)
        T[:3, 3] = [0.1, 0, -1.0]
        poses_gt.append(T @ poses_gt[-1])
    poses_gt = np.stack(poses_gt)
    rels, rels2 = [], []
    for i in range(N - 1):
        noise = np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.01)))
        rels.append(noise @ poses_gt[i + 1] @ np.linalg.inv(poses_gt[i]))
    skip = np.stack([np.arange(N - 2), np.arange(2, N)], -1).astype(np.int32)
    for i in range(N - 2):
        noise = np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.008)))
        rels2.append(noise @ poses_gt[i + 2] @ np.linalg.inv(poses_gt[i]))
    g = graph_from_odometry(
        jnp.asarray(np.stack(rels), jnp.float64),
        loop_edges=jnp.asarray(skip),
        loop_measurements=jnp.asarray(np.stack(rels2), jnp.float64),
        odo_weight=jnp.asarray([1.0, 1.0, 1.0, 2.0, 2.0, 2.0]),
        loop_weight=0.5,
    )

    for dof in (None, jnp.asarray([1, 1, 1, 0, 0, 0])):
        gd, e_dense = gauss_newton_step(g, damping=1e-6, dof_mask=dof)
        gc, e_cg = gauss_newton_step_cg(
            g, damping=1e-6, dof_mask=dof, cg_iters=400
        )
        np.testing.assert_allclose(
            float(e_dense), float(e_cg), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(gc.poses), np.asarray(gd.poses), atol=5e-6
        )
        # Gauge + frozen DoF: first pose untouched in both.
        np.testing.assert_allclose(
            np.asarray(gc.poses[0]), np.asarray(g.poses[0]), atol=1e-12
        )


@pytest.mark.slow
def test_pose_graph_cg_scales_and_converges(rng):
    """CG path on a 2,000-frame chain+skip graph (where the dense path's
    [12k, 12k] H would be prohibitive): two-stage optimization reduces
    the residual and stays finite."""
    from deepfepe_tpu.ba.pose_graph import (
        graph_from_odometry,
        optimize_pose_graph_two_stage,
    )
    from deepfepe_tpu.geometry.lie import se3_exp

    N = 2000
    poses_gt = [np.eye(4)]
    for _ in range(N - 1):
        T = np.eye(4)
        T[:3, 3] = [0, 0, -1.0]
        poses_gt.append(T @ poses_gt[-1])
    poses_gt = np.stack(poses_gt)
    rels, rels2 = [], []
    for i in range(N - 1):
        noise = np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.005)))
        rels.append(noise @ poses_gt[i + 1] @ np.linalg.inv(poses_gt[i]))
    skip = np.stack([np.arange(N - 2), np.arange(2, N)], -1).astype(np.int32)
    for i in range(N - 2):
        noise = np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.004)))
        rels2.append(noise @ poses_gt[i + 2] @ np.linalg.inv(poses_gt[i]))
    g = graph_from_odometry(
        jnp.asarray(np.stack(rels), jnp.float32),
        loop_edges=jnp.asarray(skip),
        loop_measurements=jnp.asarray(np.stack(rels2), jnp.float32),
    )
    g2, errs = optimize_pose_graph_two_stage(
        g, rot_iters=3, trans_iters=3, solver="cg", cg_iters=150
    )
    errs = np.asarray(errs)
    assert np.all(np.isfinite(errs))
    assert errs[2] <= errs[0]  # rotation stage descends
    # Chained drift shrinks vs the raw odometry chain.
    t_opt = np.asarray(g2.poses)[:, :3, 3]
    t_chain = np.asarray(g.poses)[:, :3, 3]
    gt = poses_gt[:, :3, 3]
    assert np.linalg.norm(t_opt - gt, axis=-1).mean() < \
        np.linalg.norm(t_chain - gt, axis=-1).mean()
