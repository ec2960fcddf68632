"""Sweep joint (deepF, superPoint) checkpoint pairs over one fixed eval set.

Post-hoc selector for runs trained with `train_joint_full.py
--save_every N`: evaluates every saved pair on the IDENTICAL held-out
stream (same generator seed, same RANSAC key), so the numbers are
comparable row to row and to the run's own eval_init /
eval_after_stage2 lines. One process, one compile — the jitted eval
step is shape-stable across checkpoints.

Mirrors the reference's practice of picking the eval-best iteration
from periodic checkpoints (run_eval_good.py's per-(deepF iter, SP iter)
ablation cells) rather than trusting the last one.

Usage:
  python tools/eval_joint_ckpts.py --dir experiments/r5_frozen_qsched \
      --gauss2 --image 376 1240 --npts 1000 [--tags it500 it1000 ...]
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import serialization

from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
from deepfepe_tpu.frontend import (
    FrontendParams,
    SuperPointNet,
    SuperPointNetGauss2,
    get_matches_from_sp,
)
from deepfepe_tpu.models import DeepFNet
from deepfepe_tpu.train import Config
from deepfepe_tpu.train.joint import JointTrainState, build_solver_batch

from train_joint_full import evaluate  # noqa: E402  (same tools/ dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True,
                    help="experiment dir holding deepF_*/superPoint_* pairs")
    ap.add_argument("--tags", nargs="*", default=None,
                    help="explicit tag list (default: every deepF_*.msgpack)")
    ap.add_argument("--image", type=int, nargs=2, default=(120, 160))
    ap.add_argument("--npts", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t_scale", type=float, default=0.15)
    ap.add_argument("--depths", type=float, nargs="+", default=[6.0, 12.0])
    ap.add_argument("--depth_jitter", type=float, default=0.2)
    ap.add_argument("--n_blobs", type=int, default=120)
    ap.add_argument("--n_corners", type=int, default=0)
    ap.add_argument("--conf", type=float, default=0.015)
    ap.add_argument("--nn_thresh", type=float, default=0.7)
    ap.add_argument("--eval_batches", type=int, default=6)
    ap.add_argument("--gauss2", action="store_true")
    ap.add_argument("--seed", type=int, default=777,
                    help="eval-stream seed (777 = train_joint_full's)")
    args = ap.parse_args()

    IMG = tuple(args.image)
    cfg = Config()
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.data.good_num = args.npts
    cfg.data.batch_size = args.batch

    focal = 140.0 * IMG[1] / 160.0
    mk = dict(image_size=IMG, focal=focal, t_scale=args.t_scale,
              depths=tuple(args.depths), depth_jitter=args.depth_jitter,
              n_blobs=args.n_blobs, n_corners=args.n_corners)

    sp_net = SuperPointNetGauss2(dtype=jnp.bfloat16) if args.gauss2 \
        else SuperPointNet()
    deepf_net = DeepFNet(
        depth=5, image_size=IMG, if_quality=True, mlp_dtype=jnp.bfloat16
    )
    fp = FrontendParams(out_num_points=args.npts, conf_thresh=args.conf,
                        nn_thresh=args.nn_thresh)

    ds0 = SyntheticImagePairs(**mk, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds0.batch(args.batch).items()}
    sp_tmpl = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    sp_out = get_matches_from_sp(
        sp_net, sp_tmpl,
        (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]), fp,
    )
    deepf_tmpl = deepf_net.init(
        jax.random.PRNGKey(1), build_solver_batch(sp_out, batch)
    )

    if args.tags is None:
        tags = []
        for p in sorted(glob.glob(os.path.join(args.dir, "deepF_*.msgpack"))):
            tags.append(re.sub(r"^deepF_|\.msgpack$", "",
                               os.path.basename(p)))
    else:
        tags = args.tags

    def it_key(t):
        m = re.search(r"it(\d+)$", t)
        return (0, int(m.group(1))) if m else (1, 0)

    for tag in sorted(tags, key=it_key):
        dp = os.path.join(args.dir, f"deepF_{tag}.msgpack")
        sp = os.path.join(args.dir, f"superPoint_{tag}.msgpack")
        if not (os.path.exists(dp) and os.path.exists(sp)):
            print(json.dumps({"tag": tag, "error": "missing pair"}))
            continue
        with open(dp, "rb") as f:
            deepf_params = serialization.from_bytes(deepf_tmpl, f.read())
        with open(sp, "rb") as f:
            sp_params = serialization.from_bytes(sp_tmpl, f.read())
        state = JointTrainState(
            deepf_params=deepf_params, deepf_opt=None,
            sp_params=sp_params, sp_opt=None,
            n_iter=jnp.zeros((), jnp.int32),
        )
        # Fresh eval stream + fixed key per checkpoint: rows comparable.
        ds_eval = SyntheticImagePairs(**mk, seed=args.seed)
        rec = {"tag": tag,
               **evaluate(deepf_net, sp_net, fp, cfg, state, ds_eval,
                          args.eval_batches, jax.random.PRNGKey(99))}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
