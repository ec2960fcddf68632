"""Feasibility control: what match count/precision must the frontend deliver
for translation to be recoverable at the joint-training image scale?

Sweeps oracle point matches (SyntheticPairs at 120x160 / focal 140 — the
SP+DeepF joint regime) over (N matches, pixel noise, outlier fraction,
baseline t_scale) and reports median err_q/err_t of the vmapped 8-pt
RANSAC. This bounds what ANY estimator can get from the frontend's current
output (~50 matches, ~35-50% within 1 px, sweep2.jsonl) and tells us the
target operating point for the frontend.

Runs on CPU (no images, no CNN). Usage: python tools/match_budget_study.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deepfepe_tpu.data.synthetic import SyntheticPairs
from deepfepe_tpu.eval import val_rt_batch

IMG = (120, 160)
FOCAL = 140.0
BATCHES = 4
B = 8

GRID = []
for t_scale in (0.15, 0.3):
    for n in (50, 100, 200):
        for noise in (0.1, 0.5, 1.0):
            GRID.append((t_scale, n, noise, 0.5))
# The frontend's current operating point: ~50 matches, ~60% >1px.
GRID.append((0.15, 50, 1.0, 0.6))


def main():
    out = open("experiments/joint_geo/match_budget.jsonl", "a")
    key = jax.random.PRNGKey(5)
    for t_scale, n, noise, outl in GRID:
        ds = SyntheticPairs(
            image_size=IMG, focal=FOCAL, good_num=n, noise_px=noise,
            outlier_frac=outl, max_angle_deg=2.0, t_scale=t_scale, seed=123,
        )
        eq, et = [], []
        for _ in range(BATCHES):
            b = {k: jnp.asarray(v) for k, v in ds.batch(B).items()}
            key, sub = jax.random.split(key)
            rt = val_rt_batch(
                b["E_gts"], b["Ks"], b["matches_xy_ori"], b["E_gts"],
                b["delta_Rtijs_4_4"], ransac_key=sub,
            )
            eq.append(np.asarray(rt["err_q_base"]))
            et.append(np.asarray(rt["err_t_base"]))
        rec = {
            "t_scale": t_scale, "n": n, "noise_px": noise, "outlier": outl,
            "ransac_median_err_q": round(float(np.median(np.concatenate(eq))), 3),
            "ransac_median_err_t": round(float(np.median(np.concatenate(et))), 3),
        }
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
