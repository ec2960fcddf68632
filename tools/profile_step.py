"""Decompose the flagship train-step time on the local accelerator.

Times (marginal-cost protocol, chained iterations) at the bench shapes
(B=64, N=1000, depth=5):
  - full train step (Trainer.train_step)
  - model forward only
  - the 5 ErrorEstimator MLP calls, forward and forward+backward
  - the 5 weighted_eight_point solves, forward and forward+backward

Usage: python tools/profile_step.py [--batch 64] [--which all|mlp|...]
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

BATCH, N, DEPTH, CALLS = 64, 1000, 5, 5
ITERS = 30


def timeit(fn, *args):
    """fn(*args) -> a scalar-chainable output; marginal-cost timing."""
    out = fn(*args)
    float(np.asarray(out))  # compile + sync

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        float(np.asarray(o))
        return time.perf_counter() - t0

    dts = []
    for _ in range(3):
        t1 = run(ITERS)
        t2 = run(2 * ITERS)
        dts.append(max(t2 - t1, 1e-9) / ITERS)
    return min(dts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--mlp_dtype", default="bfloat16")
    args = ap.parse_args()
    B = args.batch
    dtype = jnp.bfloat16 if args.mlp_dtype == "bfloat16" else jnp.float32

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.models.error_estimator import ErrorEstimator
    from deepfepe_tpu.ops.fmatrix import weighted_eight_point
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = N
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    net = DeepFNet(
        depth=DEPTH, image_size=(376, 1241), if_quality=True, mlp_dtype=dtype
    )
    mesh = make_mesh(n_data=len(jax.devices()))
    trainer = Trainer(net, cfg, mesh=mesh)
    ds = SyntheticPairs(good_num=N, seed=0)
    batch = ds.batch(B)
    trainer.init_state(batch)
    sharded = shard_batch(mesh, batch)

    res = {}

    # 1. Full train step (state chains).
    state_box = [trainer.state]

    def step_fn():
        s, m = trainer.train_step(state_box[0], sharded, 0.1, 0.5)
        state_box[0] = s
        return m["loss"]

    res["train_step"] = timeit(step_fn)

    # 2. Forward only.
    fwd = jax.jit(lambda p, b: net.apply(p, b)["F_est"].sum())
    params = state_box[0].params  # original state was donated
    data_batch = {
        "matches_xy_ori": jnp.asarray(batch["matches_xy_ori"]),
        "quality": jnp.asarray(batch["quality"]),
    }

    def fwd_fn():
        return fwd(params, data_batch)

    res["model_fwd"] = timeit(fwd_fn)

    # 3. MLP alone: CALLS sequential ErrorEstimator applications (chained).
    mlp = ErrorEstimator(output_size=1, dtype=dtype)
    x0 = jnp.asarray(np.random.RandomState(0).rand(B, N, 8), jnp.float32)
    mp = mlp.init(jax.random.PRNGKey(0), x0)

    @jax.jit
    def mlp_chain(p, x):
        for _ in range(CALLS):
            logits = mlp.apply(p, x)
            x = x + 1e-6 * logits  # chain dependency
        return x.sum()

    res["mlp_fwd_x5"] = timeit(lambda: mlp_chain(mp, x0))

    @jax.jit
    def mlp_chain_grad(p, x):
        def f(p):
            return mlp_chain(p, x)

        l, g = jax.value_and_grad(f)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), g, 0.0
        ) * 1e-9

    res["mlp_fwdbwd_x5"] = timeit(lambda: mlp_chain_grad(mp, x0))

    # 4. Solver alone: CALLS chained weighted_eight_point fits.
    rng = np.random.RandomState(1)
    p1 = jnp.asarray(
        np.concatenate([rng.rand(B, N, 2) * 2 - 1, np.ones((B, N, 1))], -1),
        jnp.float32,
    )
    p2 = jnp.asarray(
        np.concatenate([rng.rand(B, N, 2) * 2 - 1, np.ones((B, N, 1))], -1),
        jnp.float32,
    )
    w0 = jnp.ones((B, N), jnp.float32) / N

    @jax.jit
    def fit_chain(w):
        out = 0.0
        for _ in range(CALLS):
            fit = weighted_eight_point(p1, p2, w)
            out = out + fit.F.sum()
            w = jax.nn.softmax(w + 1e-6 * fit.residual, axis=-1)
        return out

    res["eigh_fwd_x5"] = timeit(lambda: fit_chain(w0))

    @jax.jit
    def fit_chain_grad(w):
        return jax.value_and_grad(fit_chain)(w)[0]

    res["eigh_fwdbwd_x5"] = timeit(lambda: fit_chain_grad(w0))

    out = {k: round(v * 1e3, 3) for k, v in res.items()}
    out["batch"] = B
    out["pairs_per_s_train"] = round(B / res["train_step"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
