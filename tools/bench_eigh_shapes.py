"""Benchmark the 9x9 batched eigh backends (XLA / vectorized Jacobi /
Pallas) across the batch shapes the framework actually hits:

  solver fits:        B            (e.g. 64 per layer)
  sample-loss fanout: B*S          (16*100 = 1600 per layer)
  RANSAC hypotheses:  B*hyps       (8*512 = 4096)

Marginal-cost timing (t[2k]-t[k], best of repeats) on the live device.
Usage: python tools/bench_eigh_shapes.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepfepe_tpu.ops.eigh import safe_eigh

SHAPES = [64, 320, 1600, 4096, 16384]
METHODS = ["xla", "jacobi", "pallas"]
ITERS = 30


def bench(method: str, batch: int) -> float:
    rng = np.random.RandomState(0)
    X = rng.randn(batch, 20, 9).astype(np.float32)
    A = jnp.asarray(np.einsum("bni,bnj->bij", X, X))

    m = None if method == "xla" else method

    @jax.jit
    def run(A, n):
        def body(i, acc):
            w, V = safe_eigh(A + acc * 1e-20, method=m)
            return acc + w[..., 0].sum() + V[..., 0, 0].sum()

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(np.asarray(run(A, 2)))  # compile + warm

    def t(n):
        t0 = time.perf_counter()
        float(np.asarray(run(A, n)))
        return time.perf_counter() - t0

    best = min(
        (t(2 * ITERS) - t(ITERS)) / ITERS for _ in range(3)
    )
    return best


def main():
    for batch in SHAPES:
        row = {"batch": batch}
        for m in METHODS:
            try:
                dt = bench(m, batch)
                row[m + "_us"] = round(dt * 1e6, 1)
            except Exception as e:
                row[m + "_err"] = repr(e)[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
