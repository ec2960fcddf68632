"""Root-cause probe for the cross-round solver-throughput variance.

Round 1-3 measured 4,931 / 3,058 / 3,074 pairs/s on identical solver
code while the roofline fingerprint moved ~4% (VERDICT r3 weak #2). This
tool separates the candidate causes within ONE session:

  tunnel_rtt:    latency distribution of a minimal scalar round trip —
                 the marginal-cost protocol subtracts a FIXED sync cost;
                 a heavy-tailed RTT biases (t[2k]-t[k]) by the
                 difference of two samples.
  host_numpy:    fixed-size host compute (competing tenants on the host
                 slow batch prep AND the reference-torch baseline).
  solver k=5:    the bench.py solver step, 5 independent marginal
                 samples (median/min/max) — within-session spread.
  solver uncached: same, in a fresh process with the persistent compile
                 cache DISABLED (compile-state hypothesis) — run with
                 --no_cache to produce this leg.

    python tools/bench_variance.py [--no_cache]

Cross-commit leg (the r1 code): check out the round-1 tip in a worktree
and run ITS bench.py in the same session:
    git worktree add /tmp/r1 b866649 && (cd /tmp/r1 && python bench.py)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--no_cache" not in sys.argv:
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

import jax.numpy as jnp
import numpy as np


def tunnel_rtt(n=30):
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x))
    float(np.asarray(f(x)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    return {"rtt_ms_med": round(float(np.median(ts)), 2),
            "rtt_ms_p90": round(float(np.percentile(ts, 90)), 2),
            "rtt_ms_max": round(float(ts.max()), 2)}


def host_numpy(n=5):
    a = np.random.RandomState(0).rand(1500, 1500).astype(np.float32)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        (a @ a).sum()
        ts.append((time.perf_counter() - t0) * 1e3)
    return {"host_matmul_ms_med": round(float(np.median(ts)), 1)}


def solver_samples():
    import bench

    pairs_per_s, mfu, flops, spread = bench.bench_solver_step()
    return {"solver_pairs_per_s_med": round(pairs_per_s, 1),
            "solver_spread": round(spread, 3),
            "solver_mfu": None if mfu is None else round(mfu, 4)}


def main():
    out = {"no_cache": "--no_cache" in sys.argv}
    out.update(tunnel_rtt())
    out.update(host_numpy())
    try:
        import bench  # noqa: F401 — roofline uses the same protocol

        out["roofline_tflops"] = round(
            __import__("bench").measure_roofline(), 1)
    except Exception as e:  # noqa: BLE001
        out["roofline_error"] = repr(e)[:120]
    out.update(solver_samples())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
