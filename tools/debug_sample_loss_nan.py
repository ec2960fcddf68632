"""Catch the first NaN step of the sample-loss variant and dump a replayable
snapshot (pre-step params + batch + iter), mirroring tools/ablation_variants.py
exactly (same cfg/seeds/batch order so the failure reproduces bit-for-bit).

Usage: python tools/debug_sample_loss_nan.py [--iters 600] [--out /tmp/slnan]
Then replay the saved step on CPU with tools/replay_sample_loss_nan.py.
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
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/slnan")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.loader import model_loader
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = 1000
    cfg.data.batch_size = args.batch
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.model.if_sample_loss = True

    net = model_loader(cfg)
    mesh = make_mesh(n_data=len(jax.devices()))
    trainer = Trainer(net, cfg, mesh=mesh)
    ds = SyntheticPairs(good_num=1000, seed=0)

    first = ds.batch(args.batch)
    trainer.init_state(first)
    state = trainer.state
    for it in range(args.iters):
        raw = ds.batch(args.batch)
        b = shard_batch(mesh, raw)
        # Host copy BEFORE the step: the step donates the state, and the
        # metrics are computed at these (pre-update) params.
        cur_params_host = jax.device_get(state.params)
        n_iter = int(np.asarray(state.n_iter))
        new_state, m = trainer.train_step(state, b, 0.1, 0.5)
        scalars = {
            k: float(np.asarray(m[k]))
            for k in ("loss", "loss_F", "loss_selected_F")
        }
        # Detect both failure modes at this step: (a) forward loss NaN;
        # (b) finite loss but NaN gradient -> post-update params NaN.
        # Either way the replay target is (cur_params_host, raw, n_iter).
        psum = float(
            np.asarray(
                sum(jnp.sum(l) for l in
                    jax.tree_util.tree_leaves(new_state.params))
            )
        )
        forward_bad = not all(np.isfinite(v) for v in scalars.values())
        if forward_bad or not np.isfinite(psum):
            mode = "forward" if forward_bad else "gradient"
            print(f"FIRST NON-FINITE at iter {it} ({mode}): {scalars}",
                  flush=True)
            with open(os.path.join(args.out, "params.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(cur_params_host))
            np.savez(os.path.join(args.out, "batch.npz"), **raw)
            with open(os.path.join(args.out, "meta.json"), "w") as f:
                json.dump({"iter": it, "mode": mode, "n_iter": n_iter,
                           "scalars": scalars}, f)
            return
        if it % 50 == 0:
            print(json.dumps({"iter": it, **scalars}), flush=True)
        state = new_state
    print("no NaN observed", flush=True)


if __name__ == "__main__":
    main()
