"""Full SuperPoint pretraining driver: detector stage (MagicPoint recipe)
then joint detector+descriptor stage on homography-warped pairs.

Rebuilds the external `pytorch-superpoint` training capability the
reference depends on (SURVEY.md §2.2, `Train_model_frontend`). All image
warping is batched and jitted on device (make_warped_joint_train_step).

Usage:
  python tools/train_sp_full.py --out experiments/sp_full \
      --det_iters 4000 --joint_iters 16000 [--resume ckpt.msgpack]

Writes metrics.jsonl, periodic checkpoints, and a final frontend
match-quality eval vs gt epipolar geometry on synthetic image pairs.
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

from deepfepe_tpu.frontend import SuperPointNet
from deepfepe_tpu.frontend.train_sp import (
    SyntheticShapes,
    heatmap_to_cells,
    homographic_adaptation,
    make_detector_train_step,
    make_warped_joint_train_step,
    sample_homography,
    warp_labels,
)


def build_pool(ds: SyntheticShapes, n: int):
    t0 = time.time()
    pool = ds.pool(n)
    print(f"rendered pool of {n} images in {time.time() - t0:.1f}s", flush=True)
    return pool


def batch_from_pool(ds, pool, rng, batch_size, with_warp):
    """pool=None -> fresh renders every batch (no reuse; a 4000-image pool
    reused for 64 epochs measurably overfits the detector to the shape
    rendering style — experiments/sp_full vs superpoint_pretrain)."""
    if pool is None:
        items = [ds.sample() for _ in range(batch_size)]
    else:
        items = [pool[i] for i in rng.randint(0, len(pool), batch_size)]
    imgs = np.stack([it[0] for it in items])
    cells = np.stack([ds.corners_to_cells(it[1]) for it in items])
    out = {"image": imgs, "cells": cells}
    if with_warp:
        Hs, cells2 = [], []
        for it in items:
            Hm = sample_homography(rng, (ds.H, ds.W))
            Hs.append(Hm)
            c2 = warp_labels(it[1], Hm, (ds.H, ds.W))
            cells2.append(ds.corners_to_cells(c2))
        out["H"] = np.stack(Hs)
        out["cells2"] = np.stack(cells2)
    return out


def final_eval(net, params, seed=5):
    """Frontend match quality vs gt epipolar geometry (same protocol as the
    round-1 table in experiments/superpoint_pretrain/README.md)."""
    from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
    from deepfepe_tpu.eval.frontend_eval import frontend_epidist_eval
    from deepfepe_tpu.frontend import FrontendParams

    ds = SyntheticImagePairs(image_size=(120, 160), seed=seed)
    s = ds.batch(8)
    imgs = jnp.asarray(s["imgs_grey"])  # [B, 2, H, W]
    fp = FrontendParams(out_num_points=200, conf_thresh=0.010, nn_thresh=0.8)
    r = frontend_epidist_eval(
        net, params, (imgs[:, 0], imgs[:, 1]), jnp.asarray(s["F_gts"]), fp,
    )
    return {
        "num_matches": float(np.mean(r["num_matches"])),
        **{k: float(np.mean(v)) for k, v in r.items() if k.startswith("ratio")},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/sp_full")
    ap.add_argument("--det_iters", type=int, default=4000)
    ap.add_argument("--joint_iters", type=int, default=16000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pool", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--desc_weight", type=float, default=1e-4)
    ap.add_argument("--ha_iters", type=int, default=0)
    ap.add_argument("--ha_images", type=int, default=256)
    ap.add_argument("--ha_homographies", type=int, default=24)
    ap.add_argument("--ha_conf", type=float, default=0.015)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--save_every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    mf = open(metrics_path, "a")

    net = SuperPointNet()
    rng = np.random.RandomState(args.seed)
    ds = SyntheticShapes(seed=args.seed + 1)
    params = net.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, 120, 160, 1)))
    if args.resume:
        with open(args.resume, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"resumed from {args.resume}", flush=True)

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    pool = build_pool(ds, args.pool) if args.pool > 0 else None

    def save(tag):
        p = os.path.join(args.out, f"sp_{tag}.msgpack")
        with open(p, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        return p

    det_step = make_detector_train_step(net, tx)
    t0 = time.time()
    for it in range(args.det_iters):
        b = batch_from_pool(ds, pool, rng, args.batch, with_warp=False)
        params, opt_state, loss = det_step(params, opt_state, b)
        if it % 100 == 0 or it == args.det_iters - 1:
            rec = {
                "stage": "det", "iter": it, "loss": float(loss),
                "elapsed_s": round(time.time() - t0, 1),
            }
            print(json.dumps(rec), flush=True)
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
        if it and it % args.save_every == 0:
            save(f"det_{it}")
    if args.det_iters:
        save("det_final")

    joint_step = make_warped_joint_train_step(net, tx, args.desc_weight)
    t0 = time.time()
    for it in range(args.joint_iters):
        b = batch_from_pool(ds, pool, rng, args.batch, with_warp=True)
        params, opt_state, m = joint_step(params, opt_state, b)
        if it % 100 == 0 or it == args.joint_iters - 1:
            rec = {
                "stage": "joint", "iter": it,
                **{k: float(v) for k, v in m.items()},
                "elapsed_s": round(time.time() - t0, 1),
            }
            print(json.dumps(rec), flush=True)
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
        if it and it % args.save_every == 0:
            save(f"joint_{it}")
    if args.joint_iters:
        save("joint_final")
    # --- Stage C: homographic adaptation on unlabeled "real" images ------
    # (textured synthetic renders stand in for the real-image corpus):
    # aggregate the detector over random homographic views to create
    # pseudo-labels, then fine-tune the detector on them.
    if args.ha_iters:
        from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs

        real_ds = SyntheticImagePairs(image_size=(ds.H, ds.W), seed=99)
        n_imgs = args.ha_images
        t0 = time.time()
        imgs, labels = [], []
        bsz = 8
        for s0 in range(0, n_imgs, bsz):
            s = real_ds.batch(min(bsz, n_imgs - s0))
            im = jnp.asarray(s["imgs_grey"][:, 0])  # [b, H, W]
            Hs = np.stack(
                [sample_homography(rng, (ds.H, ds.W))
                 for _ in range(args.ha_homographies)]
            )
            agg = homographic_adaptation(net, params, im, jnp.asarray(Hs))
            agg = np.asarray(agg)
            for k in range(agg.shape[0]):
                imgs.append(np.asarray(im[k]))
                labels.append(heatmap_to_cells(agg[k], args.ha_conf))
        rec = {"stage": "ha_labels", "images": len(imgs),
               "elapsed_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        mf.write(json.dumps(rec) + "\n")

        det_step = make_detector_train_step(net, tx)
        t0 = time.time()
        for it in range(args.ha_iters):
            # Half HA pseudo-labels, half fresh exactly-labeled shape
            # renders: a small fixed HA pool alone (256 imgs x many epochs)
            # memorizes (CE -> 5e-6) and catastrophically forgets the
            # corner prior — measured: matches 22.6 -> 11.5 after the
            # unmixed stage C of the first sp_full run.
            k = args.batch // 2
            idx = rng.randint(0, len(imgs), k)
            fresh = [ds.sample() for _ in range(args.batch - k)]
            b = {
                "image": np.stack(
                    [imgs[i] for i in idx] + [it_[0] for it_ in fresh]
                ),
                "cells": np.stack(
                    [labels[i] for i in idx]
                    + [ds.corners_to_cells(it_[1]) for it_ in fresh]
                ),
            }
            params, opt_state, loss = det_step(params, opt_state, b)
            if it % 100 == 0 or it == args.ha_iters - 1:
                rec = {
                    "stage": "ha_finetune", "iter": it, "loss": float(loss),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                print(json.dumps(rec), flush=True)
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
    ckpt = save("final")

    ev = final_eval(net, params)
    rec = {"stage": "final_eval", "ckpt": ckpt, **ev}
    print(json.dumps(rec), flush=True)
    mf.write(json.dumps(rec) + "\n")
    mf.close()


if __name__ == "__main__":
    main()
