"""Per-block cost + bandwidth model for the gauss2 encoder at full res.

Round-4 follow-up to the ROADMAP round-3 finding that the full-res joint
step is HBM-bound in the SuperPoint encoder backward: isolate each
double-conv block (fused-affine XLA path, exactly what the production
step runs) at the production shapes (B=8 images, 376x1240, bf16), time
fwd and fwd+bwd, and compare against the block's IDEAL HBM traffic — the
bytes a perfect schedule must move (read x/dy/saved activations once,
write y/dx once, params negligible). Also measures the chip's achievable
streaming bandwidth with a trivial reduce kernel so the floor is in
*this tunnel's* units, not the datasheet's.

    python tools/profile_encoder_blocks.py
One JSON line per block: {"block", "fwd_ms", "fwdbwd_ms", "bwd_ms",
"ideal_gb_fwd", "ideal_gb_bwd", "gbps_bwd", "flop_fwd_g"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np

from deepfepe_tpu.ops.pallas.conv_pallas import conv3x3_affine_relu_ref

B = 8  # images (4 pairs, one-pass batching)
BLOCKS = [
    # (name, H, W, cin, cmid, cout, need_dx)
    ("inc", 376, 1240, 1, 64, 64, False),
    ("down1", 188, 620, 64, 64, 64, True),
    ("down2", 94, 310, 64, 128, 128, True),
    ("down3", 47, 155, 128, 128, 128, True),
    ("headPa", 47, 155, 128, 256, 256, True),  # single conv modeled as
    #                                            cmid==cout, one conv
]


def timeit(f, *a, iters=10):
    float(np.asarray(f(*a)))

    def run(k):
        r = None
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*a)
        float(np.asarray(r))
        return time.perf_counter() - t0

    t1, t2 = run(iters), run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def stream_floor():
    """Achievable read bandwidth: sum a 1 GiB bf16 array."""
    x = jnp.ones((512, 1024, 1024), jnp.bfloat16)

    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    dt = timeit(f, x)
    gb = x.size * 2 / 1e9
    return gb / dt


def block_fns(cin, cmid, cout, need_dx, double=True):
    def fwd(x, w0, w1, s0, t0, s1, t1):
        y = conv3x3_affine_relu_ref(x, w0, s0, t0)
        if double:
            y = conv3x3_affine_relu_ref(y, w1, s1, t1)
        return y

    def loss(x, w0, w1, s0, t0, s1, t1, cot):
        return jnp.sum(fwd(x, w0, w1, s0, t0, s1, t1).astype(jnp.float32)
                       * cot)

    argnums = (0, 1, 2, 3, 4, 5, 6) if need_dx else (1, 2, 3, 4, 5, 6)
    grad = jax.grad(loss, argnums)

    def gsum(*a):
        return sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grad(*a)))

    return (
        jax.jit(lambda *a: jnp.sum(fwd(*a).astype(jnp.float32))),
        jax.jit(gsum),
    )


def main():
    floor = stream_floor()
    print(json.dumps({"stream_read_gbps": round(floor, 1)}), flush=True)

    for name, H, W, cin, cmid, cout, need_dx in BLOCKS:
        double = name != "headPa"
        rngk = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(rngk[0], (B, H, W, cin), jnp.bfloat16)
        w0 = jax.random.normal(rngk[1], (3, 3, cin, cmid), jnp.float32) * 0.1
        w1 = jax.random.normal(rngk[2], (3, 3, cmid, cout), jnp.float32) * 0.1
        s0 = jnp.ones((cmid,), jnp.float32)
        t0 = jnp.zeros((cmid,), jnp.float32)
        s1 = jnp.ones((cout,), jnp.float32)
        t1 = jnp.zeros((cout,), jnp.float32)
        cot = jax.random.normal(rngk[3], (B, H, W, cout), jnp.float32)

        f_fwd, f_bwd = block_fns(cin, cmid, cout, need_dx, double)
        try:
            dt_f = timeit(f_fwd, x, w0, w1, s0, t0, s1, t1)
            dt_b = timeit(f_bwd, x, w0, w1, s0, t0, s1, t1, cot)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"block": name, "error": repr(e)[:200]}),
                  flush=True)
            continue

        px = B * H * W
        bpe = 2  # bf16
        # Ideal fwd: read x, write y1 (+ y2 for double).
        gb_fwd = (px * cin + px * cmid + (px * cout if double else 0)) \
            * bpe / 1e9
        # Ideal bwd (recompute-free schedule): read dy2, y2 (relu mask),
        # y1 (wgrad1 operand + relu mask), x (wgrad0); write dy1
        # internally fused (not counted), dx if needed. Params negligible.
        reads = px * cout + px * cout + (px * cmid if double else 0) \
            + px * cin
        writes = px * cin if need_dx else 0
        gb_bwd = (reads + writes) * bpe / 1e9
        # FLOPs (fwd): 9 * 2 * cin * cmid (+ cmid*cout) MACs per px.
        fl = px * 9 * 2 * (cin * cmid + (cmid * cout if double else 0))
        bwd_ms = (dt_b - dt_f) * 1e3
        print(json.dumps({
            "block": name,
            "fwd_ms": round(dt_f * 1e3, 2),
            "fwdbwd_ms": round(dt_b * 1e3, 2),
            "bwd_ms": round(bwd_ms, 2),
            "ideal_gb_fwd": round(gb_fwd, 3),
            "ideal_gb_bwd": round(gb_bwd, 3),
            "gbps_bwd_ideal_need": round(gb_bwd / (bwd_ms / 1e3 + 1e-9), 1),
            "flop_fwd_g": round(fl / 1e9, 1),
            "mxu_fwd_pct": round(fl / dt_f / 197e12 * 100, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
