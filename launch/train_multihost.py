"""Multi-host TPU training launcher.

Replaces the reference's Nautilus k8s single-GPU job specs (nautilus/*.yaml —
SURVEY.md §2.5 'cluster scheduling') with a jax.distributed entry point: run
this same script on every host of a TPU pod slice (e.g. via
`gcloud compute tpus tpu-vm ssh --worker=all --command=...`); JAX wires the
mesh across hosts, each host feeds its local batch shard, and the pjit'ed
train step all-reduces gradients over ICI/DCN.

Usage (per host):
  python launch/train_multihost.py --config configs/synthetic_baseline.yaml \
      --exper multihost0 [--coordinator <host0-ip>:8476 --num_processes N \
       --process_id K]

On Cloud TPU the coordinator flags are auto-detected; pass them explicitly
for other clusters.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--exper", required=True)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--train_iter", type=int, default=None)
    p.add_argument("--pretrained", default="",
                   help="checkpoint to restore before training (elastic "
                        "resume; every process restores the same file)")
    args = p.parse_args()

    import jax

    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        # Cloud TPU metadata autodetection (no-op on a single host).
        try:
            jax.distributed.initialize()
        except Exception:
            pass

    from deepfepe_tpu.loader import data_loader, model_loader
    from deepfepe_tpu.parallel import make_hybrid_mesh
    from deepfepe_tpu.train import Trainer, load_config

    cfg = load_config(args.config)
    if args.train_iter:
        cfg.training.train_iter = args.train_iter
    net = model_loader(cfg)
    mesh = make_hybrid_mesh()

    if jax.process_index() == 0:
        print(
            f"processes={jax.process_count()} devices={jax.device_count()} "
            f"mesh={mesh.shape}"
        )

    save_dir = (
        os.path.join("logs", args.exper) if jax.process_index() == 0 else None
    )
    trainer = Trainer(net, cfg, save_dir=save_dir, mesh=mesh)

    # Process-count-invariant data sharding: every process renders the
    # GLOBAL batch from the same seed and keeps only the rows its
    # devices own; shard_batch then assembles the global array from the
    # per-process shards (make_array_from_process_local_data). The
    # global batch — and therefore the whole training trajectory — is
    # bit-identical at any process count, which is what makes the
    # multi-process run testable against the single-process one
    # (tests/test_multihost_launcher.py). Deterministic per-host seeding
    # (the reference's per-worker seeding, utils/loader.py:43-59) is the
    # shared cfg.training.seed.
    train_ds = data_loader(cfg, "train")
    val_ds = data_loader(cfg, "val")
    gbs = cfg.data.batch_size
    pid, pcount = jax.process_index(), jax.process_count()

    def local_rows(stream):
        for b in stream:
            n = next(iter(b.values())).shape[0]
            lo, hi = pid * n // pcount, (pid + 1) * n // pcount
            yield {k: v[lo:hi] for k, v in b.items()}

    if args.pretrained:
        first = next(iter(local_rows(train_ds.batches(gbs))))
        trainer.restore(args.pretrained, first)
        if jax.process_index() == 0:
            print(f"restored from {args.pretrained} @ iter {trainer.n_iter}")

    last = trainer.fit(
        local_rows(train_ds.batches(gbs)),
        val_stream_fn=lambda: local_rows(val_ds.batches(gbs)),
        max_iters=cfg.training.train_iter,
    )
    if jax.process_index() == 0:
        trainer.save(trainer.n_iter)
        # Metrics may include non-scalar tensors (e.g. per-pair E
        # estimates); print only the scalars.
        print("done:", {
            k: float(v) for k, v in last.items()
            if isinstance(v, (int, float)) or getattr(v, "ndim", 1) == 0
        })


if __name__ == "__main__":
    main()
