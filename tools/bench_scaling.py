"""Data-parallel scaling benchmark: train-step pairs/s at 1..N devices.

Measures the BASELINE.json scaling target (frames/s at 1 chip / 1 host /
N hosts, >=0.8 linear) on whatever devices the current platform exposes.
On a multi-chip TPU slice this is the real number. On the CPU host platform
(XLA_FLAGS=--xla_force_host_platform_device_count=N) it only validates that
the sharded step COMPILES AND RUNS at each device count — virtual devices
share the same physical cores, so CPU 'scaling efficiency' numbers are
meaningless and must not be quoted.

Usage: python tools/bench_scaling.py [--batch-per-device 8] [--n 1000]
Prints one JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-per-device", type=int, default=8)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    n_total = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_total]
    results = {}
    for ndev in counts:
        cfg = Config()
        cfg.data.good_num = args.n
        cfg.model.depth = args.depth
        cfg.model.if_quality = True
        net = DeepFNet(
            depth=args.depth,
            image_size=(376, 1241),
            if_quality=True,
            mlp_dtype=jnp.bfloat16,
        )
        mesh = make_mesh(n_data=ndev)
        tr = Trainer(net, cfg, mesh=mesh)
        ds = SyntheticPairs(good_num=args.n, seed=0)
        batch = ds.batch(args.batch_per_device * ndev)
        tr.init_state(batch)
        sharded = shard_batch(mesh, batch)
        for _ in range(3):
            tr.state, m = tr.train_step(tr.state, sharded, 0.1, 0.5)
        float(np.asarray(m["loss"]))

        def run(iters):
            t0 = time.perf_counter()
            mm = None
            for _ in range(iters):
                tr.state, mm = tr.train_step(tr.state, sharded, 0.1, 0.5)
            float(np.asarray(mm["loss"]))
            return time.perf_counter() - t0

        t1, t2 = run(args.iters), run(2 * args.iters)
        dt = max(t2 - t1, 1e-9) / args.iters
        pps = args.batch_per_device * ndev / dt
        results[ndev] = pps
        eff = pps / (results[1] * ndev) if 1 in results else 1.0
        print(
            json.dumps(
                {
                    "devices": ndev,
                    "pairs_per_s": round(pps, 1),
                    "ms_per_step": round(dt * 1000, 2),
                    "scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
