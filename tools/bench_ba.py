"""North-star BA at realistic SfM sizes on the v5e (VERDICT r4 #4).

Runs the Schur-complement bundle adjuster, the square-root (QR
marginalization) BA, and the two-stage pose-graph solver on synthetic
SfM problems at production scales (C>=100 keyframes, P up to 100k
landmarks; windowed visibility), reporting convergence, ms/iter, and the
XLA-estimated peak temp memory per compiled step.

Timing uses the repo's marginal-cost protocol (median of k of
(t[2n]-t[n])/n with a forced host transfer as the sync — the axon
tunnel's block_until_ready does not synchronize; bench.py round-4
estimator analysis).

Usage:
  python tools/bench_ba.py [--points 1000 10000 100000] [--cams 100]
      [--out experiments/ba_scale]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


from deepfepe_tpu.ba.synthetic import make_sfm_problem  # noqa: E402


def timed_ms(step_fn, arg, iters=10, k=5):
    """Median marginal cost in ms/iter: run n and 2n chained iterations,
    (t2-t1)/n, k times; the closing sync is a scalar host transfer."""

    def run(n, x):
        for _ in range(n):
            x = step_fn(x)
        # Scalar sync through the tunnel.
        return float(np.asarray(jnp.sum(x.points[0]))), x

    _ = run(2, arg)  # warmup/compile
    vals = []
    for _ in range(k):
        t0 = time.time()
        _, _ = run(iters, arg)
        t1 = time.time()
        _, _ = run(2 * iters, arg)
        t2 = time.time()
        vals.append(((t2 - t1) - (t1 - t0)) / iters * 1000.0)
    return float(np.median(vals)), float(np.std(vals) / max(np.median(vals), 1e-9))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, nargs="+",
                    default=[1000, 10000, 100000])
    ap.add_argument("--cams", type=int, default=100)
    ap.add_argument("--sqrt_cams", type=int, default=32,
                    help="camera count for the sqrt-BA rows (its QR "
                         "system is dense in C; Schur covers the "
                         "dense-C=100 rows)")
    ap.add_argument("--pg_frames", type=int, nargs="+",
                    default=[1000, 10000])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="experiments/ba_scale")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    outf = open(os.path.join(args.out, "results.jsonl"), "a")

    from deepfepe_tpu import ba

    def log(rec):
        print(json.dumps(rec), flush=True)
        outf.write(json.dumps(rec) + "\n")
        outf.flush()

    rng = np.random.RandomState(0)
    rows = []

    # --- Schur-complement BA scaling table ------------------------------
    for P in args.points:
        C = args.cams
        prob, gt_poses, gt_X, _ = make_sfm_problem(rng, C=C, P=P)
        damping = 1e-3

        def one(p):
            p2, _ = ba.ba_step(p, damping=damping)
            return p2

        step = jax.jit(one)
        # XLA peak-memory estimate for the compiled step.
        mem_mb = None
        try:
            ma = step.lower(prob).compile().memory_analysis()
            mem_mb = round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes)
                / 1e6, 1,
            )
        except Exception:
            pass
        # Convergence: run 15 steps, track cost.
        p = prob
        costs = []
        for _ in range(15):
            p, aux = ba.ba_step(p, damping=damping)
            costs.append(float(np.asarray(aux["cost"])))
        ms, spread = timed_ms(step, prob, iters=args.iters)
        n_obs = int(np.asarray(prob.vis).sum())
        rec = {
            "solver": "schur_ba", "C": C, "P": P, "obs": n_obs,
            "ms_per_iter": round(ms, 2), "spread": round(spread, 3),
            "obs_per_s": round(n_obs / (ms / 1e3), 0),
            "mem_mb_est": mem_mb,
            "cost_first": round(costs[0], 4),
            "cost_last": round(costs[-1], 6),
            "converged": costs[-1] < 0.05 * costs[0],
        }
        log(rec)
        rows.append(rec)

    # --- sqrt-BA (QR marginalization) rows ------------------------------
    for P in [p for p in args.points if p <= 10000]:
        C = args.sqrt_cams
        prob, _, _, _ = make_sfm_problem(rng, C=C, P=P, window=10)

        def one_s(p):
            p2, _ = ba.sqrt_ba_step(p, damping=1e-3)
            return p2

        step_s = jax.jit(one_s)
        mem_mb = None
        try:
            ma = step_s.lower(prob).compile().memory_analysis()
            mem_mb = round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes)
                / 1e6, 1,
            )
        except Exception:
            pass
        p = prob
        costs = []
        for _ in range(15):
            p, aux = ba.sqrt_ba_step(p, damping=1e-3)
            costs.append(float(np.asarray(aux["cost"])))
        ms, spread = timed_ms(step_s, prob, iters=max(args.iters // 2, 3))
        n_obs = int(np.asarray(prob.vis).sum())
        rec = {
            "solver": "sqrt_ba", "C": C, "P": P, "obs": n_obs,
            "ms_per_iter": round(ms, 2), "spread": round(spread, 3),
            "obs_per_s": round(n_obs / (ms / 1e3), 0),
            "mem_mb_est": mem_mb,
            "cost_first": round(costs[0], 4),
            "cost_last": round(costs[-1], 6),
            "converged": costs[-1] < 0.05 * costs[0],
        }
        log(rec)
        rows.append(rec)

    # --- two-stage pose graph at sequence scale -------------------------
    from deepfepe_tpu.ba.pose_graph import (
        graph_from_odometry,
        optimize_pose_graph_two_stage,
    )
    from deepfepe_tpu.geometry.lie import se3_exp

    for N in args.pg_frames:
        # Drifty odometry chain + delta-2 skip edges.
        poses_gt = [np.eye(4)]
        for _ in range(N - 1):
            T = np.eye(4)
            T[:3, 3] = [0, 0, -1.0]
            poses_gt.append(T @ poses_gt[-1])
        poses_gt = np.stack(poses_gt)
        rels1 = []
        for i in range(N - 1):
            xi = rng.randn(6) * 0.005
            noise = np.asarray(se3_exp(jnp.asarray(xi)))
            rels1.append(noise @ poses_gt[i + 1] @ np.linalg.inv(poses_gt[i]))
        skip_edges = np.stack(
            [np.arange(N - 2), np.arange(2, N)], -1
        ).astype(np.int32)
        rels2 = []
        for i in range(N - 2):
            xi = rng.randn(6) * 0.004
            noise = np.asarray(se3_exp(jnp.asarray(xi)))
            rels2.append(noise @ poses_gt[i + 2] @ np.linalg.inv(poses_gt[i]))
        g = graph_from_odometry(
            jnp.asarray(np.stack(rels1), jnp.float32),
            loop_edges=jnp.asarray(skip_edges),
            loop_measurements=jnp.asarray(np.stack(rels2), jnp.float32),
        )

        def run_pg():
            t0 = time.time()
            g2, errs = optimize_pose_graph_two_stage(
                g, rot_iters=8, trans_iters=8
            )
            _ = float(np.asarray(jnp.sum(g2.poses[-1])))
            return time.time() - t0, g2, errs

        wall, _, _ = run_pg()
        wall_hot, g2, errs = run_pg()
        ate = float(np.sqrt(np.mean(np.sum((
            np.asarray(g2.poses)[:, :3, 3] - poses_gt[:, :3, 3]
        ) ** 2, -1))))
        rec = {
            "solver": "pose_graph_two_stage", "frames": N,
            "edges": int(np.asarray(g.edges).shape[0]),
            "wall_s_cold": round(wall, 2),
            "wall_s_hot": round(wall_hot, 3),
            "resid_first": round(float(np.asarray(errs[0])), 6),
            "resid_last": round(float(np.asarray(errs[-1])), 6),
            "ate_vs_gt_m": round(ate, 3),
        }
        log(rec)
        rows.append(rec)

    # Markdown table for the experiment README.
    md = ["| solver | C/frames | P | obs/edges | ms/iter | obs/s | mem MB | cost first->last |",
          "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        if r["solver"] == "pose_graph_two_stage":
            md.append(
                f"| {r['solver']} | {r['frames']} | - | {r['edges']} | "
                f"hot {r['wall_s_hot'] * 1000:.0f} ms total | - | - | - |"
            )
        else:
            md.append(
                f"| {r['solver']} | {r['C']} | {r['P']} | {r['obs']} | "
                f"{r['ms_per_iter']} | {r['obs_per_s']:.0f} | "
                f"{r['mem_mb_est']} | {r['cost_first']} -> "
                f"{r['cost_last']} ({'ok' if r['converged'] else 'NOT CONVERGED'}) |"
            )
    with open(os.path.join(args.out, "TABLE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))
    outf.close()


if __name__ == "__main__":
    main()
