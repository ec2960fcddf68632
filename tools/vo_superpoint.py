"""Full-pipeline (SuperPoint frontend -> DeepF solver) sequence VO.

The BASELINE.md "DeepFEPE" row's path: images -> SP detector/descriptor ->
mutual-NN matches -> learned solver E -> recover pose -> chain -> KITTI-style
trajectory metrics, compared against the RANSAC-8pt baseline run on the SAME
SuperPoint matches (so the comparison isolates the solver, as the reference's
val_rt does) — over a persistent-scene synthetic sequence with exact gt.

Usage:
  python tools/vo_superpoint.py --sp experiments/sp_full/sp_final.msgpack \
      [--deepf ckpt.msgpack] [--n_frames 60] [--out experiments/vo_sp]
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

IMG = (120, 160)
NPTS = 200


def main():
    global IMG, NPTS
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", required=True)
    ap.add_argument("--deepf", default="")
    ap.add_argument("--out", default="experiments/vo_sp")
    ap.add_argument("--n_frames", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--conf", type=float, default=0.010)
    ap.add_argument("--nn_thresh", type=float, default=0.9)
    ap.add_argument("--image", type=int, nargs=2, default=list(IMG))
    ap.add_argument("--npts", type=int, default=NPTS)
    ap.add_argument("--step_scale", type=float, default=1.0,
                    help="multiplier on the auto-chosen step_length")
    ap.add_argument("--n_corners", type=int, default=0,
                    help="corner stamps per plane texture (match density)")
    ap.add_argument("--refine_ba", action="store_true",
                    help="two-view sqrt-BA polish of each pair's solver "
                         "pose (eval/refine.py)")
    ap.add_argument("--refine_huber", type=float, default=0.0,
                    help="Huber IRLS scale in px for the polish (robust "
                         "against outlier matches; 0 = off)")
    ap.add_argument("--refine_t_only", action="store_true",
                    help="freeze rotations during the polish (the solver's "
                         "rotations often beat what noisy points support)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    IMG = tuple(args.image)
    NPTS = args.npts
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

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

    # step_length sized so the trajectory stays within the scene depth.
    seq = SyntheticImageSequence(
        n_frames=args.n_frames, image_size=IMG,
        focal=140.0 * IMG[1] / 160.0,
        step_length=args.step_scale * min(0.12, 0.6 * 12.0 / args.n_frames),
        n_corners=args.n_corners,
        seed=args.seed,
    )

    cfg = Config()
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.data.good_num = NPTS
    cfg.data.batch_size = args.batch

    sp_net = SuperPointNet()
    deepf_net = DeepFNet(
        depth=5, image_size=IMG, if_quality=True, mlp_dtype=jnp.bfloat16
    )
    fp = FrontendParams(
        out_num_points=NPTS, conf_thresh=args.conf, nn_thresh=args.nn_thresh
    )

    first = next(seq.pair_batches(args.batch))
    first = {k: jnp.asarray(v) for k, v in first.items()}
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), first["imgs_grey"][:, 0][..., None]
    )
    with open(args.sp, "rb") as f:
        sp_params = serialization.from_bytes(sp_params, f.read())
    sp_out = get_matches_from_sp(
        sp_net, sp_params, (first["imgs_grey"][:, 0], first["imgs_grey"][:, 1]),
        fp,
    )
    deepf_params = deepf_net.init(
        jax.random.PRNGKey(1), build_solver_batch(sp_out, first)
    )
    if args.deepf:
        with open(args.deepf, "rb") as f:
            deepf_params = serialization.from_bytes(deepf_params, f.read())

    ev = make_joint_eval_step(deepf_net, sp_net, fp, cfg)
    refine_fn = None
    if args.refine_ba or args.refine_t_only:
        from deepfepe_tpu.eval.refine import refine_two_view_batch

        refine_fn = jax.jit(
            lambda m_, w_, K_, R_, t_: refine_two_view_batch(
                m_, w_, K_, R_, t_, iters=5,
                refine_rotation=not args.refine_t_only,
                huber_px=args.refine_huber,
            )
        )
    key = jax.random.PRNGKey(5)
    rels = {"est": [], "base": [], "gt": []}
    errs = {"q_est": [], "t_est": [], "q_base": [], "t_base": []}
    nmatches = []
    for batch in seq.pair_batches(args.batch):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        m = ev(deepf_params, sp_params, b)
        key, sub = jax.random.split(key)
        rt = val_rt_batch(
            m["E_ests"], b["Ks"], m["matches_xy"], b["E_gts"],
            b["delta_Rtijs_4_4"], ransac_key=sub,
        )
        Me = np.asarray(rt["M_est"])
        Mb = np.asarray(rt["M_base"])
        if refine_fn is not None:
            R_ref, t_ref, _ = refine_fn(
                jnp.asarray(m["matches_xy"], jnp.float32),
                jnp.asarray(m["weights"], jnp.float32),
                jnp.asarray(b["Ks"], jnp.float32),
                jnp.asarray(Me[:, :3, :3], jnp.float32),
                jnp.asarray(Me[:, :3, 3], jnp.float32),
            )
            Me = np.concatenate(
                [np.asarray(R_ref), np.asarray(t_ref)[..., None]], -1
            ).astype(np.float32)
            from deepfepe_tpu.geometry.rotations import (
                rotation_angle_error,
                vector_angle,
            )

            gt44 = np.asarray(b["delta_Rtijs_4_4"])
            eq_r = np.asarray(rotation_angle_error(
                R_ref, jnp.asarray(gt44[:, :3, :3])))
            et_raw = np.asarray(vector_angle(
                t_ref, jnp.asarray(gt44[:, :3, 3])))
            et_r = np.minimum(et_raw, 180.0 - et_raw)
            rt = dict(rt)
            rt["err_q_est"] = jnp.asarray(eq_r)
            rt["err_t_est"] = jnp.asarray(et_r)
        for i in range(Me.shape[0]):
            fidx = int(batch["frame_i"][i])
            if fidx == len(rels["est"]):  # skip padded duplicates
                rels["est"].append(Me[i])
                rels["base"].append(Mb[i])
                rels["gt"].append(np.asarray(batch["delta_Rtijs_4_4"][i]))
                errs["q_est"].append(float(np.asarray(rt["err_q_est"][i])))
                errs["t_est"].append(float(np.asarray(rt["err_t_est"][i])))
                errs["q_base"].append(float(np.asarray(rt["err_q_base"][i])))
                errs["t_base"].append(float(np.asarray(rt["err_t_base"][i])))
        if "num_matches" in m:
            nmatches.append(float(np.asarray(m["num_matches"])))

    gt_traj = seq.gt_trajectory()
    total = float(np.linalg.norm(np.diff(gt_traj[:, :3, 3], axis=0),
                                 axis=1).sum())
    lengths = tuple(round(total * f, 1) for f in (0.2, 0.4, 0.6))
    summary = {"n_pairs": len(rels["est"]),
               "mean_num_matches": round(float(np.mean(nmatches)), 1)
               if nmatches else None,
               "traj_len": round(total, 2)}
    for name in ("est", "base"):
        traj = chain_relative_poses(np.stack(rels[name]))
        export_poses_kitti(
            traj, os.path.join(args.out, f"trajectory_{name}.txt")
        )
        rep = evaluate_sequence(gt_traj, traj, align="scale",
                                lengths=lengths)
        rep["median_err_q"] = float(np.median(errs[f"q_{name}"]))
        rep["median_err_t"] = float(np.median(errs[f"t_{name}"]))
        summary[name] = {k: round(v, 4) for k, v in rep.items()}
    export_poses_kitti(gt_traj, os.path.join(args.out, "trajectory_gt.txt"))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
