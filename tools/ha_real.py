"""Homographic adaptation + SP fine-tune on REAL imagery (VERDICT r3 #6).

The only non-rendered photographs reachable in this container are the
KITTI street-scene crops inside the reference's committed paper figure
(`/root/reference/imgs/fig1.png` — four ~100x280 photo strips; two carry
sparse red correspondence overlays). This driver runs the full
SuperPoint domain-transfer recipe on them:

  1. build a real-image pool: grayscale crops, 2x upscale, random
     120x160 windows
  2. BEFORE metrics on held-out homography-warped real pairs
     (repeatability, matching score, mAP, correctness, inliers@1px —
     eval/frontend_eval.evaluate_homography_pair)
  3. homographic-adaptation pseudo-labels (frontend.train_sp
     .homographic_adaptation over K views -> heatmap_to_cells)
  4. short warped-joint fine-tune on 50/50 real-pseudo-label +
     fresh exactly-labeled CornerTextures batches (the 50/50 mix is the
     round-1 anti-forgetting lesson, ROADMAP "HA catastrophic
     forgetting")
  5. AFTER metrics on the same held-out real pairs + the synthetic
     corner-domain eval (no-regression check)

    python tools/ha_real.py --sp experiments/sp_full/sp_joint_11000.msgpack \
        --out experiments/ha_real [--iters 600]

Ref: SuperPoint HA per SURVEY §2.2 / reference README.md:37-46.
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

from deepfepe_tpu.frontend import FrontendParams, SuperPointNet
from deepfepe_tpu.frontend.train_sp import (
    CornerTextures,
    heatmap_to_cells,
    homographic_adaptation,
    make_warped_joint_train_step,
    sample_homography,
    warp_labels,
)

IMG = (120, 160)

# Photo-strip crop boxes inside fig1.png (y0, y1, x0, x1) — the four KITTI
# street-scene images of the paper figure (left "Image pairs" column and
# the middle "Correspondences" column; the latter two carry sparse red
# overlay lines, noted in experiments/ha_real/README).
FIG1 = "/root/reference/imgs/fig1.png"
CROPS = [(138, 240, 60, 336), (345, 450, 60, 336),
         (128, 240, 770, 1060), (340, 440, 770, 1060)]


def load_real_images():
    import cv2

    im = cv2.imread(FIG1, cv2.IMREAD_GRAYSCALE)
    if im is None:
        raise FileNotFoundError(FIG1)
    out = []
    for (y0, y1, x0, x1) in CROPS:
        c = im[y0:y1, x0:x1].astype(np.float32) / 255.0
        c = cv2.resize(c, (c.shape[1] * 2, c.shape[0] * 2),
                       interpolation=cv2.INTER_CUBIC)
        out.append(np.clip(c, 0.0, 1.0))
    return out


def window_pool(images, rng, n, hw=IMG):
    h, w = hw
    pool = []
    for _ in range(n):
        im = images[rng.randint(len(images))]
        if im.shape[0] < h or im.shape[1] < w:
            continue
        y = rng.randint(im.shape[0] - h + 1)
        x = rng.randint(im.shape[1] - w + 1)
        win = im[y:y + h, x:x + w]
        if rng.rand() < 0.5:
            win = win[:, ::-1]
        pool.append(np.ascontiguousarray(win))
    return np.stack(pool)


def eval_real(net, params, windows, rng, fp, n_pairs=16):
    # NOTE: callers must pass a FRESH RandomState with a fixed seed so
    # before/after evals see IDENTICAL warps — a shared training rng
    # advances between the two calls and confounds the comparison
    # (round-4 self-review finding).
    from deepfepe_tpu.eval.frontend_eval import evaluate_homography_pair

    acc = {}
    for i in range(min(n_pairs, len(windows))):
        H = sample_homography(rng, IMG)
        r = evaluate_homography_pair(net, params, windows[i], H, fp)
        for k, v in r.items():
            if isinstance(v, (int, float)) and np.isfinite(v):
                acc.setdefault(k, []).append(float(v))
    return {k: round(float(np.mean(v)), 4) for k, v in acc.items()}


def ha_labels(net, params, windows, rng, n_views=24, conf=0.012,
              batch=16):
    """Pseudo-label cells for each window via homographic adaptation."""
    cells, corners = [], []
    for s in range(0, len(windows), batch):
        chunk = jnp.asarray(windows[s:s + batch])
        Hs = jnp.asarray(np.stack(
            [np.eye(3)] + [sample_homography(rng, IMG)
                           for _ in range(n_views - 1)]
        ).astype(np.float32))
        heat = np.asarray(homographic_adaptation(net, params, chunk, Hs))
        for hm in heat:
            lab = heatmap_to_cells(hm, conf_thresh=conf)
            cells.append(lab)
            ys, xs = np.nonzero(lab != 64)
            sub = lab[ys, xs]
            corners.append(np.stack(
                [xs * 8 + sub % 8, ys * 8 + sub // 8], -1
            ).astype(np.float32))
    return cells, corners


def make_real_batch(ct, windows, cells, corners, rng, n):
    idx = rng.randint(len(windows), size=n)
    Hs, c2 = [], []
    for i in idx:
        Hm = sample_homography(rng, IMG)
        Hs.append(Hm)
        c2.append(ct.corners_to_cells(warp_labels(corners[i], Hm, IMG)))
    return {
        "image": windows[idx],
        "cells": np.stack([cells[i] for i in idx]),
        "H": np.stack(Hs).astype(np.float32),
        "cells2": np.stack(c2),
    }


def make_synth_batch(ds, rng, n):
    imgs, cells, Hs, cells2 = [], [], [], []
    for _ in range(n):
        img, corners = ds.sample()
        Hm = sample_homography(rng, (ds.H, ds.W))
        imgs.append(img)
        cells.append(ds.corners_to_cells(corners))
        Hs.append(Hm)
        cells2.append(ds.corners_to_cells(
            warp_labels(corners, Hm, (ds.H, ds.W))))
    return {"image": np.stack(imgs), "cells": np.stack(cells),
            "H": np.stack(Hs).astype(np.float32),
            "cells2": np.stack(cells2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", default="experiments/sp_full/sp_joint_11000.msgpack")
    ap.add_argument("--out", default="experiments/ha_real")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pool", type=int, default=96)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--views", type=int, default=24)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    mf = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        print(json.dumps(rec), flush=True)
        mf.write(json.dumps(rec) + "\n")
        mf.flush()

    rng = np.random.RandomState(7)
    images = load_real_images()
    train_wins = window_pool(images[:3], rng, args.pool)
    # Held-out eval windows come from the 4th image (never trained on).
    eval_wins = window_pool(images[3:], rng, 16)
    log({"stage": "data", "train_windows": len(train_wins),
         "eval_windows": len(eval_wins),
         "source": "fig1.png KITTI photo strips"})

    net = SuperPointNet()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.asarray(train_wins[:1])[..., None])
    with open(args.sp, "rb") as f:
        params = serialization.from_bytes(params, f.read())

    fp = FrontendParams(out_num_points=200, conf_thresh=0.010,
                        nn_thresh=0.9)
    log({"stage": "eval_before_real",
         **eval_real(net, params, eval_wins,
                     np.random.RandomState(1234), fp)})

    t0 = time.time()
    cells, corners = ha_labels(net, params, train_wins, rng,
                               n_views=args.views)
    n_kp = [len(c) for c in corners]
    log({"stage": "ha_labels", "mean_kp_per_window": round(float(
        np.mean(n_kp)), 1), "min_kp": int(np.min(n_kp)),
        "elapsed_s": round(time.time() - t0, 1)})

    ds = CornerTextures(image_size=IMG, seed=0)
    tx = optax.adam(args.lr)
    step = make_warped_joint_train_step(net, tx)
    opt = tx.init(params)
    half = args.batch // 2
    t0 = time.time()
    for it in range(args.iters):
        br = make_real_batch(ds, train_wins, cells, corners, rng, half)
        bs = make_synth_batch(ds, rng, args.batch - half)
        b = {k: jnp.asarray(np.concatenate([br[k], bs[k]]))
             for k in br}
        params, opt, m = step(params, opt, b)
        if it % 100 == 0 or it == args.iters - 1:
            log({"stage": "train", "iter": it,
                 "loss": round(float(np.asarray(m["loss"])), 5),
                 "det_ce": round(float(np.asarray(m["det"])), 5),
                 "elapsed_s": round(time.time() - t0, 1)})

    path = os.path.join(args.out, "sp_ha_real.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    log({"stage": "saved", "path": path})
    log({"stage": "eval_after_real",
         **eval_real(net, params, eval_wins,
                     np.random.RandomState(1234), fp)})

    # No-regression check on the synthetic corner domain.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from finetune_sp_corners import eval_frontend

    log({"stage": "eval_after_synth",
         **{k: round(float(v), 4)
            for k, v in eval_frontend(net, params, 60).items()}})
    mf.close()


if __name__ == "__main__":
    main()
