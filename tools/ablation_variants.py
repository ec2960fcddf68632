"""Model-variant ablation study on the synthetic oracle dataset.

Trains each DeepFNet variant for the same budget and reports median
err_q/err_t vs gt (plus the RANSAC baseline once) — the accuracy study
the reference runs via run_eval_good.py ablation matrices
(run_eval_good.py:85-172), here over the model flags:

  baseline        if_quality (the validated F-loss recipe)
  sample_loss     + per-layer sampled minimal-subset fits (Norm8PointNet)
  learn_offsets   + learned per-point coordinate offsets
  tri_depth       + triangulated-depth feature
  goodCorresArch  legacy global-context weight net
  img_w           + per-point image weights (uniform here)

Usage: python tools/ablation_variants.py [--iters 600] [--out experiments/ablation_variants]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

VARIANTS = {
    "baseline": {},
    "sample_loss": {"if_sample_loss": True},
    "learn_offsets": {"if_learn_offsets": True},
    "tri_depth": {"if_tri_depth": True},
    "goodCorresArch": {"if_goodCorresArch": True},
    "img_w": {"if_img_w": True},
}


def run_variant(name, flags, iters, batch_size, eval_batches, seed=0):
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.eval import val_rt_batch
    from deepfepe_tpu.loader import model_loader
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = 1000
    cfg.data.batch_size = batch_size
    cfg.model.depth = 5
    cfg.model.if_quality = True
    for k, v in flags.items():
        setattr(cfg.model, k, v)

    net = model_loader(cfg)
    mesh = make_mesh(n_data=len(jax.devices()))
    trainer = Trainer(net, cfg, mesh=mesh)
    ds = SyntheticPairs(good_num=1000, seed=seed)
    ds_eval = SyntheticPairs(good_num=1000, seed=seed + 1000)

    def with_aux(batch):
        if flags.get("if_img_w"):
            batch = dict(batch)
            batch["weights_im"] = np.ones(
                batch["matches_xy_ori"].shape[:2], np.float32
            )
        return batch

    first = with_aux(ds.batch(batch_size))
    trainer.init_state(first)
    t0 = time.time()
    state = trainer.state
    for it in range(iters):
        b = shard_batch(mesh, with_aux(ds.batch(batch_size)))
        state, m = trainer.train_step(state, b, 0.1, 0.5)
    train_loss = float(np.asarray(m["loss"]))
    train_s = time.time() - t0

    key = jax.random.PRNGKey(7)
    eq, et, eqb, etb = [], [], [], []
    for i in range(eval_batches):
        b = shard_batch(mesh, with_aux(ds_eval.batch(batch_size)))
        metrics = trainer.eval_step(state.params, b)
        key, sub = jax.random.split(key)
        rt = val_rt_batch(
            metrics["E_ests"], b["Ks"], b["matches_xy_ori"], b["E_gts"],
            b["delta_Rtijs_4_4"], ransac_key=sub,
        )
        eq.append(np.asarray(rt["err_q_est"]))
        et.append(np.asarray(rt["err_t_est"]))
        eqb.append(np.asarray(rt["err_q_base"]))
        etb.append(np.asarray(rt["err_t_base"]))
    rec = {
        "variant": name,
        "iters": iters,
        "final_loss": round(train_loss, 6),
        "train_s": round(train_s, 1),
        "median_err_q": round(float(np.median(np.concatenate(eq))), 4),
        "median_err_t": round(float(np.median(np.concatenate(et))), 4),
        "median_err_q_ransac": round(float(np.median(np.concatenate(eqb))), 4),
        "median_err_t_ransac": round(float(np.median(np.concatenate(etb))), 4),
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_batches", type=int, default=8)
    ap.add_argument("--out", default="experiments/ablation_variants")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "results.jsonl")
    with open(path, "a") as f:
        for name, flags in VARIANTS.items():
            if args.only and name != args.only:
                continue
            try:
                rec = run_variant(
                    name, flags, args.iters, args.batch, args.eval_batches
                )
            except Exception as e:  # keep the matrix running
                rec = {"variant": name, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
