"""Replay a snapshot saved by tools/debug_sample_loss_nan.py on CPU and
localize the first non-finite intermediate (forward outputs, loss pieces,
then per-term gradients).

Usage: python tools/replay_sample_loss_nan.py [--snap /tmp/slnan]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import serialization


def finite_report(name, tree):
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            frac = 1.0 - np.mean(np.isfinite(a))
            print(f"  NONFINITE {name}{jax.tree_util.keystr(path)} "
                  f"shape={a.shape} frac={frac:.4f} "
                  f"absmax_finite={np.max(np.abs(a[np.isfinite(a)])) if np.any(np.isfinite(a)) else 'none'}")
            return False
    amax = max(
        (float(np.max(np.abs(np.asarray(l)))) for l in
         jax.tree_util.tree_leaves(tree) if np.asarray(l).size),
        default=0.0,
    )
    print(f"  ok {name}: absmax={amax:.4g}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snap", default="/tmp/slnan")
    args = ap.parse_args()

    meta = json.load(open(os.path.join(args.snap, "meta.json")))
    print("meta:", meta)
    raw = dict(np.load(os.path.join(args.snap, "batch.npz")))
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    from deepfepe_tpu.loader import model_loader
    from deepfepe_tpu.train import Config
    from deepfepe_tpu.train.engine import compute_losses

    cfg = Config()
    cfg.data.good_num = 1000
    cfg.data.batch_size = int(batch["Ks"].shape[0])
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.model.if_sample_loss = True
    net = model_loader(cfg)

    params = net.init(jax.random.PRNGKey(0), batch)
    with open(os.path.join(args.snap, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    finite_report("params", params)

    rng = jax.random.fold_in(jax.random.PRNGKey(17), meta["n_iter"])

    # 1. Forward outputs.
    outs = net.apply(params, batch, rngs={"sample": rng})
    for k, v in outs.items():
        finite_report(f"outs[{k}]", v)

    # 2. Loss pieces.
    from deepfepe_tpu.losses import f_loss

    ld = f_loss(outs, batch["pts1_virt"], batch["pts2_virt"], batch["Ks"],
                cfg.model.clamp_at)
    for k, v in ld.items():
        finite_report(f"f_loss[{k}]", v)

    # 3. Gradients of each loss term separately.
    def term(params, which):
        outs = net.apply(params, batch, rngs={"sample": rng})
        ld = f_loss(outs, batch["pts1_virt"], batch["pts2_virt"],
                    batch["Ks"], cfg.model.clamp_at)
        return ld[which]

    for which in ("loss_F", "loss_selected_F"):
        g = jax.grad(lambda p: term(p, which))(params)
        finite_report(f"grad[{which}]", g)

    # 4. Full training-loss gradient (what the step actually uses).
    def full(params):
        return compute_losses(net, params, batch, cfg, 0.1, 0.5, rng=rng)[0]

    val, g = jax.value_and_grad(full)(params)
    print("full loss:", float(val))
    finite_report("grad[full]", g)


if __name__ == "__main__":
    main()
