"""The reference's full SIFT-dump workflow, end-to-end in one driver:

  render gt sequences -> SIFT dump tree (deepFEPE_data layout) ->
  CLI train_good on the train scene -> CLI eval_good on the test scene ->
  CLI eval_vo (net + RANSAC baseline) -> result.txt trajectory metrics.

This is the BASELINE.md "deepF" row's production path (SIFT frontend +
learned solver, no SuperPoint), exercised through the real CLI surfaces on
a persistent-scene synthetic sequence with exact gt (SyntheticImageSequence).

Usage:
  python tools/dump_workflow.py --out experiments/dump_workflow \
      [--train_frames 120] [--test_frames 60] [--train_iter 800] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_platform(cpu: bool):
    if cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        import jax

        jax.config.update("jax_platforms", "cpu")


CONFIG_TMPL = """\
name: 'dump_workflow'
desc: 'SIFT-dump workflow on synthetic persistent-scene sequences'
data:
    dataset: 'kitti_odo_corr'
    dump_root: '{root}'
    train_scenes: ['00', '01', '02']
    val_scenes: ['09']
    test_scenes: ['09']
    sequence_length: 2
    delta_ij: 1
    batch_size: 8
    good_num: {good_num}
    read_what:
        with_quality: true
        with_pose: true
    image:
        size: [{h}, {w}, 3]
    preprocessing:
        resize: [{h}, {w}]
model:
    name: 'GoodCorresNet_layers_deepF'
    depth: 5
    clamp_at: 0.02
    if_quality: true
    quality_size: 1
exps:
    five_point: false
    base_name: 'ransac_8p'
    our_name: 'DeepF'
    filename: 'err_ratio.npz'
training:
    learning_rate: 0.0001
    lr_decay_rate: 1
    train_iter: {train_iter}
    val_interval: -1
    save_interval: {train_iter}
    seed: 0
"""


def render_and_dump(out_root, scene, n_frames, seed, image_size,
                    n_corners=0):
    import cv2
    import numpy as np

    from deepfepe_tpu.data.dump_kitti import dump_sequence
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence

    seq = SyntheticImageSequence(
        n_frames=n_frames, image_size=image_size, seed=seed,
        n_corners=n_corners,
    )
    img_dir = os.path.join(out_root, scene)
    os.makedirs(img_dir, exist_ok=True)
    files = []
    for k in range(n_frames):
        f = os.path.join(img_dir, f"{k:06d}.jpg")
        cv2.imwrite(f, (seq.frame(k) * 255).astype(np.uint8))
        files.append(f)
    dump_sequence(files, seq.cam2world_poses(), seq.K, img_dir,
                  delta_ijs=(1,))
    return seq


def run_cli(argv):
    from deepfepe_tpu.cli import main

    print(f"\n$ cli {' '.join(argv)}", flush=True)
    return main(argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/dump_workflow")
    ap.add_argument("--train_frames", type=int, default=120)
    ap.add_argument("--test_frames", type=int, default=60)
    ap.add_argument("--train_iter", type=int, default=800)
    ap.add_argument("--qt_iter", type=int, default=0,
                    help="stage-2 qt-loss iters after the F stage "
                         "(the reference's staged recipe)")
    ap.add_argument("--good_num", type=int, default=300)
    ap.add_argument("--image", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--n_corners", type=int, default=0,
                    help="hard-edged corner stamps per plane texture "
                         "(sharper SIFT keypoints than pure blobs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_render", action="store_true")
    args = ap.parse_args()
    setup_platform(args.cpu)

    out = os.path.abspath(args.out)
    root = os.path.join(out, "dump")
    os.makedirs(root, exist_ok=True)
    H, W = args.image

    if not args.skip_render:
        import time

        t0 = time.time()
        # Several short train scenes (scene diversity; also keeps each
        # trajectory within its scene's plane depths) + one test scene.
        per_scene = max(args.train_frames // 3, 4)
        for scene, seed in (("00", 0), ("01", 1), ("02", 2)):
            render_and_dump(root, scene, per_scene, seed=seed,
                            image_size=(H, W), n_corners=args.n_corners)
        render_and_dump(root, "09", args.test_frames, seed=7,
                        image_size=(H, W), n_corners=args.n_corners)
        print(f"rendered+dumped in {time.time() - t0:.1f}s", flush=True)

    cfg_path = os.path.join(out, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.format(root=root, good_num=args.good_num,
                                   h=H, w=W, train_iter=args.train_iter))

    exp = "dump_workflow"
    run_cli(["train_good", cfg_path, exp, "--train_iter",
             str(args.train_iter)])
    ckpt = os.path.join(
        "logs", exp, "checkpoints",
        f"deepFNet_{args.train_iter}_checkpoint.msgpack",
    )
    summary = {"ckpt": ckpt}
    if args.qt_iter:
        # Stage 2: pose (q, t) loss from the F-stage checkpoint
        # (balance_t 1.0 per the synthetic_qt.yaml finding).
        qt_cfg_path = os.path.join(out, "config_qt.yaml")
        with open(qt_cfg_path, "w") as f:
            f.write(
                CONFIG_TMPL.format(
                    root=root, good_num=args.good_num, h=H, w=W,
                    train_iter=args.qt_iter,
                ).replace(
                    "    if_quality: true",
                    "    if_quality: true\n    if_qt_loss: true\n"
                    "    balance_q: 1\n    balance_t: 1.0",
                )
            )
        # The restored state resumes at n_iter=train_iter, so the stage-2
        # budget is expressed as the TOTAL iteration count.
        total = args.train_iter + args.qt_iter
        run_cli(["train_good", qt_cfg_path, exp + "_qt", "--pretrained",
                 ckpt, "--train_iter", str(total)])
        ckpt = os.path.join(
            "logs", exp + "_qt", "checkpoints",
            f"deepFNet_{total}_checkpoint.msgpack",
        )
        summary["ckpt_qt"] = ckpt
    summary["eval_good"] = run_cli(
        ["eval_good", cfg_path, exp + "_eval", "--pretrained", ckpt]
    )
    # Segment lengths sized to the synthetic trajectory (~0.12/frame).
    seg = ",".join(
        str(round(args.test_frames * 0.12 * f, 1)) for f in (0.2, 0.4, 0.6)
    )
    summary["vo_net"] = run_cli(
        ["eval_vo", cfg_path, exp + "_vo_net", "--pretrained", ckpt,
         "--scene", "09", "--lengths", seg]
    )
    summary["vo_base"] = run_cli(
        ["eval_vo", cfg_path, exp + "_vo_base", "--pretrained", ckpt,
         "--scene", "09", "--baseline", "--lengths", seg]
    )
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
