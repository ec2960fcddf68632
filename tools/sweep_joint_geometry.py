"""Sweep synthetic-pair geometry settings against fixed SP+DeepF checkpoints.

Finds the operating point where the frontend still matches reliably
(gt_epi_inlier_1px high) AND translation is observable (low err_t for
RANSAC/solver on those matches) — the conditioning study behind
ROADMAP open item 2. One jitted eval step is reused across settings
(same shapes), so the sweep pays the axon compile once.

Usage:
  python tools/sweep_joint_geometry.py \
      --sp experiments/joint_full3/superPoint_stage1_frozen_sp.msgpack \
      --deepf experiments/joint_full3/deepF_stage1_frozen_sp.msgpack
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

from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
from deepfepe_tpu.frontend import FrontendParams, SuperPointNet, get_matches_from_sp
from deepfepe_tpu.geometry import sym_epi_dist
from deepfepe_tpu.models import DeepFNet
from deepfepe_tpu.train import Config
from deepfepe_tpu.train.joint import build_solver_batch, make_joint_eval_step
from deepfepe_tpu.eval import val_rt_batch

IMG = (120, 160)
NPTS = 200

# (name, t_scale, depths, depth_jitter, n_corners)
# Round-1 sweep found geometry alone doesn't help: the frontend yields only
# ~20 matches/pair on pure blob textures (mean_num_matches in sweep.jsonl),
# so this sweep varies texture corner density with and without stronger
# geometry.
SETTINGS = [
    ("baseline_0.15_6-12", 0.15, (6.0, 12.0), 0.0, 0),
    ("corners40_0.15_6-12", 0.15, (6.0, 12.0), 0.0, 40),
    ("corners80_0.15_6-12", 0.15, (6.0, 12.0), 0.0, 80),
    ("corners40_0.3_4-12", 0.3, (4.0, 7.0, 12.0), 0.1, 40),
    ("corners80_0.3_4-12", 0.3, (4.0, 7.0, 12.0), 0.1, 80),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", required=True)
    ap.add_argument("--deepf", required=True)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--out", default="experiments/joint_geo/sweep.jsonl")
    args = ap.parse_args()

    cfg = Config()
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.data.good_num = NPTS
    cfg.data.batch_size = 8

    sp_net = SuperPointNet()
    deepf_net = DeepFNet(
        depth=5, image_size=IMG, if_quality=True, mlp_dtype=jnp.bfloat16
    )
    fp = FrontendParams(out_num_points=NPTS, conf_thresh=0.010, nn_thresh=0.9)

    ds0 = SyntheticImagePairs(image_size=IMG, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds0.batch(8).items()}
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    with open(args.sp, "rb") as f:
        sp_params = serialization.from_bytes(sp_params, f.read())
    sp_out = get_matches_from_sp(
        sp_net, sp_params,
        (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]), fp,
    )
    db = build_solver_batch(sp_out, batch)
    deepf_params = deepf_net.init(jax.random.PRNGKey(1), db)
    with open(args.deepf, "rb") as f:
        deepf_params = serialization.from_bytes(deepf_params, f.read())

    ev = make_joint_eval_step(deepf_net, sp_net, fp, cfg)
    key = jax.random.PRNGKey(11)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    outf = open(args.out, "a")
    for name, ts, depths, jit_, nc in SETTINGS:
        ds = SyntheticImagePairs(
            image_size=IMG, t_scale=ts, depths=depths, depth_jitter=jit_,
            n_corners=nc, seed=777,
        )
        eq, et, eqb, etb, nmatch, inl = [], [], [], [], [], []
        for _ in range(args.batches):
            b = {k: jnp.asarray(v) for k, v in ds.batch(8).items()}
            m = ev(deepf_params, sp_params, b)
            key, sub = jax.random.split(key)
            rt = val_rt_batch(
                m["E_ests"], b["Ks"], m["matches_xy"], b["E_gts"],
                b["delta_Rtijs_4_4"], ransac_key=sub,
            )
            eq.append(np.asarray(rt["err_q_est"]))
            et.append(np.asarray(rt["err_t_est"]))
            eqb.append(np.asarray(rt["err_q_base"]))
            etb.append(np.asarray(rt["err_t_base"]))
            nmatch.append(float(np.asarray(m["num_matches"])))
            d = np.asarray(sym_epi_dist(
                b["F_gts"], m["matches_xy"][..., :2],
                m["matches_xy"][..., 2:], if_homo=False,
            ))
            inl.append(float((d < 1.0).mean()))
        rec = {
            "setting": name,
            "median_err_q": round(float(np.median(np.concatenate(eq))), 3),
            "median_err_t": round(float(np.median(np.concatenate(et))), 3),
            "median_err_q_ransac":
                round(float(np.median(np.concatenate(eqb))), 3),
            "median_err_t_ransac":
                round(float(np.median(np.concatenate(etb))), 3),
            "mean_num_matches": round(float(np.mean(nmatch)), 1),
            "gt_epi_inlier_1px": round(float(np.mean(inl)), 4),
        }
        print(json.dumps(rec), flush=True)
        outf.write(json.dumps(rec) + "\n")
        outf.flush()
    outf.close()


if __name__ == "__main__":
    main()
