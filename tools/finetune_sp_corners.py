"""Fine-tune the pretrained SuperPoint on exactly-labeled corner textures.

The joint SP+DeepF data domain (blob+rectangle textures,
data/synthetic_images.py) differs from the polygon-shapes pretraining
domain; its match precision (gt_epi_inlier_1px ~0.3, experiments/joint_geo)
bounds everything downstream. This driver runs the warped-joint train step
(detector CE on both views + descriptor loss) on `CornerTextures` — same
texture family WITH exact corner labels — then reports the frontend
match-quality eval before/after on corner-rich SyntheticImagePairs.

Usage:
  python tools/finetune_sp_corners.py --sp <pretrained.msgpack> \
      --out experiments/sp_corners [--iters 2000]
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
import optax
from flax import serialization

from deepfepe_tpu.frontend import SuperPointNet, SuperPointNetGauss2
from deepfepe_tpu.frontend.train_sp import (
    CornerTextures,
    make_warped_joint_train_step,
    sample_homography,
    warp_labels,
)

IMG = (120, 160)


def make_batch(ds, rng, batch_size):
    imgs, cells, Hs, cells2 = [], [], [], []
    for _ in range(batch_size):
        img, corners = ds.sample()
        Hm = sample_homography(rng, (ds.H, ds.W))
        imgs.append(img)
        cells.append(ds.corners_to_cells(corners))
        Hs.append(Hm)
        cells2.append(
            ds.corners_to_cells(warp_labels(corners, Hm, (ds.H, ds.W)))
        )
    return {
        "image": np.stack(imgs),
        "cells": np.stack(cells),
        "H": np.stack(Hs),
        "cells2": np.stack(cells2),
    }


def eval_frontend(net, params, n_corners, seed=5):
    # (works for SuperPointNet and SuperPointNetGauss2 alike — both
    # return {'semi','desc'} through run_superpoint)
    """Match-quality eval on corner-rich pairs (train_sp_full.final_eval
    protocol, on the joint data domain)."""
    from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
    from deepfepe_tpu.eval.frontend_eval import frontend_epidist_eval
    from deepfepe_tpu.frontend import FrontendParams

    ds = SyntheticImagePairs(image_size=IMG, n_corners=n_corners, seed=seed)
    fp = FrontendParams(out_num_points=200, conf_thresh=0.010, nn_thresh=0.9)
    accum = {}
    for _ in range(4):
        s = ds.batch(8)
        imgs = jnp.asarray(s["imgs_grey"])
        r = frontend_epidist_eval(
            net, params, (imgs[:, 0], imgs[:, 1]), jnp.asarray(s["F_gts"]),
            fp,
        )
        for k, v in r.items():
            if k == "num_matches" or k.startswith("ratio"):
                accum.setdefault(k, []).append(float(np.mean(v)))
    return {k: float(np.mean(v)) for k, v in accum.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", default="",
                    help="pretrained msgpack ('' = from-scratch init)")
    ap.add_argument("--out", default="experiments/sp_corners")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--eval_corners", type=int, default=60)
    ap.add_argument("--image", type=int, nargs=2, default=[120, 160])
    ap.add_argument("--n_blobs", type=int, default=40)
    ap.add_argument("--n_rects", type=int, default=14)
    ap.add_argument("--gauss2", action="store_true",
                    help="train SuperPointNetGauss2 (BN variant, the "
                         "reference production net) instead of the plain "
                         "SuperPointNet; BN runs on running stats "
                         "(inference-mode fine-tune), from-scratch init "
                         "when --sp is ''")
    args = ap.parse_args()
    global IMG
    IMG = tuple(args.image)
    os.makedirs(args.out, exist_ok=True)
    mf = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        print(json.dumps(rec), flush=True)
        mf.write(json.dumps(rec) + "\n")
        mf.flush()

    net = SuperPointNetGauss2() if args.gauss2 else SuperPointNet()
    ds = CornerTextures(image_size=IMG, n_blobs=args.n_blobs,
                        n_rects=args.n_rects, seed=0)
    rng = np.random.RandomState(1)
    b = make_batch(ds, rng, args.batch)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(b["image"])[..., None])
    if args.sp:
        with open(args.sp, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    log({"stage": "eval_before",
         **{k: round(float(v), 4)
            for k, v in eval_frontend(net, params, args.eval_corners).items()}})

    tx = optax.adam(args.lr)
    step = make_warped_joint_train_step(net, tx)
    opt = tx.init(params)
    t0 = time.time()
    for it in range(args.iters):
        b = {k: jnp.asarray(v) for k, v in make_batch(ds, rng, args.batch).items()}
        params, opt, m = step(params, opt, b)
        if it % 200 == 0 or it == args.iters - 1:
            log({"stage": "train", "iter": it,
                 "loss": round(float(np.asarray(m["loss"])), 5),
                 "det_ce": round(float(np.asarray(m["det"])), 5),
                 "elapsed_s": round(time.time() - t0, 1)})

    path = os.path.join(
        args.out, "sp_corners_gauss2.msgpack" if args.gauss2
        else "sp_corners.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    log({"stage": "saved", "path": path})
    log({"stage": "eval_after",
         **{k: round(float(v), 4)
            for k, v in eval_frontend(net, params, args.eval_corners).items()}})
    mf.close()


if __name__ == "__main__":
    main()
