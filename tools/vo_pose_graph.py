"""Multi-frame VO: fuse delta-1 and delta-2 solver estimates in a pose graph.

The reference is strictly two-view (SURVEY.md §5.7); its VO simply chains
per-pair poses (eval_tools.get_abs_poses). This demo exercises the new
multi-frame capability end-to-end: the SP->DeepF pipeline estimates relative
poses for frame gaps delta=1 (odometry edges) AND delta=2 (skip edges — the
reference's dumps expose the same delta_ij knob), and `ba/pose_graph.py`
fuses them with Gauss-Newton on se(3). Skip edges constrain the composition
of two odometry edges, averaging down independent per-pair noise — chained
VO drift drops without any new training.

Per-edge translation magnitude uses the gt scale (t_scene_scale), the
standard monocular-VO convention the reference also relies on for its
exported trajectories.

Usage:
  python tools/vo_pose_graph.py --sp <sp.msgpack> --deepf <deepf.msgpack> \
      [--n_frames 30] [--image 240 320] [--n_corners 60] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import serialization


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", required=True)
    ap.add_argument("--deepf", default="")
    ap.add_argument("--out", default="experiments/vo_pose_graph")
    ap.add_argument("--n_frames", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--image", type=int, nargs=2, default=[240, 320])
    ap.add_argument("--npts", type=int, default=300)
    ap.add_argument("--n_corners", type=int, default=60)
    ap.add_argument("--step_scale", type=float, default=2.0)
    ap.add_argument("--skip_weight", type=float, default=0.5,
                    help="translation information of skip edges")
    ap.add_argument("--skip_rot_weight", type=float, default=1.0,
                    help="rotation information of skip edges. Keep it >= "
                         "the translation weight: weakly-constrained "
                         "rotations become free DoF that absorb skip-edge "
                         "translation misfit (measured: rot drift 100 vs "
                         "69 deg/100m at 0.1 vs 1.0, vo_pose_graph{2,3})")
    ap.add_argument("--gn_iters", type=int, default=15)
    ap.add_argument("--two_stage", action="store_true",
                    help="rotation averaging then frozen-R translation "
                         "refinement (optimize_pose_graph_two_stage) — "
                         "skip edges improve translation without bending "
                         "rotations; with this flag the skip rotation "
                         "weight can safely be 0")
    ap.add_argument("--huber", type=float, default=0.05,
                    help="Huber delta on the se(3) edge-residual norm "
                         "(0 disables); robustifies against failed "
                         "wide-baseline skip edges")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)
    IMG = tuple(args.image)

    from deepfepe_tpu.ba.pose_graph import (
        graph_from_odometry,
        optimize_pose_graph,
        optimize_pose_graph_two_stage,
    )
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence
    from deepfepe_tpu.eval import (
        chain_relative_poses,
        evaluate_sequence,
        export_poses_kitti,
        val_rt_batch,
    )
    from deepfepe_tpu.frontend import (
        FrontendParams,
        SuperPointNet,
        get_matches_from_sp,
    )
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config
    from deepfepe_tpu.train.joint import build_solver_batch, make_joint_eval_step

    seq = SyntheticImageSequence(
        n_frames=args.n_frames, image_size=IMG,
        focal=140.0 * IMG[1] / 160.0,
        step_length=args.step_scale * min(0.12, 0.6 * 12.0 / args.n_frames),
        n_corners=args.n_corners, seed=args.seed,
    )

    cfg = Config()
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.data.good_num = args.npts
    cfg.data.batch_size = args.batch

    sp_net = SuperPointNet()
    deepf_net = DeepFNet(
        depth=5, image_size=IMG, if_quality=True, mlp_dtype=jnp.bfloat16
    )
    fp = FrontendParams(out_num_points=args.npts, conf_thresh=0.010,
                        nn_thresh=0.9)

    first = next(seq.pair_batches(args.batch))
    first = {k: jnp.asarray(v) for k, v in first.items()}
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), first["imgs_grey"][:, 0][..., None]
    )
    with open(args.sp, "rb") as f:
        sp_params = serialization.from_bytes(sp_params, f.read())
    sp_out = get_matches_from_sp(
        sp_net, sp_params,
        (first["imgs_grey"][:, 0], first["imgs_grey"][:, 1]), fp,
    )
    deepf_params = deepf_net.init(
        jax.random.PRNGKey(1), build_solver_batch(sp_out, first)
    )
    if args.deepf:
        with open(args.deepf, "rb") as f:
            deepf_params = serialization.from_bytes(deepf_params, f.read())

    ev = make_joint_eval_step(deepf_net, sp_net, fp, cfg)
    key = jax.random.PRNGKey(5)

    def estimate_rels(delta):
        """Per-(i, i+delta) [4,4] relative poses, gt-scaled translations."""
        rels = {}
        nonlocal key
        for batch in seq.pair_batches(args.batch, delta=delta):
            b = {k: jnp.asarray(v) for k, v in batch.items()}
            m = ev(deepf_params, sp_params, b)
            key, sub = jax.random.split(key)
            rt = val_rt_batch(
                m["E_ests"], b["Ks"], m["matches_xy"], b["E_gts"],
                b["delta_Rtijs_4_4"], ransac_key=None,
            )
            Me = np.asarray(rt["M_est"])
            scale = np.asarray(batch["t_scene_scale"])
            for i in range(Me.shape[0]):
                fidx = int(batch["frame_i"][i])
                if fidx not in rels:
                    M = np.eye(4)
                    M[:3, :3] = Me[i, :3, :3]
                    tn = Me[i, :3, 3]
                    tn = tn / max(np.linalg.norm(tn), 1e-9)
                    M[:3, 3] = tn * scale[i]
                    rels[fidx] = M
        return np.stack([rels[i] for i in sorted(rels)])

    rel1 = estimate_rels(1)
    rel2 = estimate_rels(2)

    n = args.n_frames
    loop_edges = jnp.asarray(
        np.stack([np.arange(n - 2), np.arange(2, n)], -1), jnp.int32
    )
    sw, srw = args.skip_weight, args.skip_rot_weight
    graph = graph_from_odometry(
        jnp.asarray(rel1, jnp.float32),
        loop_edges=loop_edges,
        loop_measurements=jnp.asarray(rel2, jnp.float32),
        odo_weight=1.0,
        loop_weight=jnp.asarray([sw, sw, sw, srw, srw, srw]),
    )
    if args.two_stage:
        graph_opt, errs = optimize_pose_graph_two_stage(
            graph, rot_iters=args.gn_iters, trans_iters=args.gn_iters,
            huber_delta=args.huber if args.huber > 0 else None,
        )
    else:
        graph_opt, errs = optimize_pose_graph(
            graph, iters=args.gn_iters,
            huber_delta=args.huber if args.huber > 0 else None,
        )

    gt_traj = seq.gt_trajectory()
    total = float(np.linalg.norm(np.diff(gt_traj[:, :3, 3], axis=0),
                                 axis=1).sum())
    lengths = tuple(round(total * f, 1) for f in (0.2, 0.4, 0.6))

    summary = {
        "n_frames": n, "traj_len": round(total, 2),
        "gn_residual_first_last": [
            round(float(errs[0]), 6), round(float(errs[-1]), 6)
        ],
    }
    chained = chain_relative_poses(rel1[:, :3, :])
    fused = np.asarray(jnp.linalg.inv(graph_opt.poses))
    for name, traj in (("chained", chained), ("pose_graph", fused)):
        export_poses_kitti(
            traj, os.path.join(args.out, f"trajectory_{name}.txt")
        )
        rep = evaluate_sequence(gt_traj, traj, align="scale",
                                lengths=lengths)
        summary[name] = {k: round(v, 4) for k, v in rep.items()}
    export_poses_kitti(gt_traj, os.path.join(args.out, "trajectory_gt.txt"))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
