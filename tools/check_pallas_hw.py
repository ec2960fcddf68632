"""Hardware smoke-check for every Pallas kernel: compile + run on the real
chip and compare against the XLA reference path.

Interpret mode does NOT catch Mosaic lowering violations (the matcher
kernel's (1, K) output block passed interpret and failed on hardware), so
run this after touching any kernel:

    python tools/check_pallas_hw.py      # on the TPU machine

Prints one JSON line per kernel: {"kernel", "ok", "max_err", "note"}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def check(name, fn):
    try:
        err = fn()
        print(json.dumps({"kernel": name, "ok": True,
                          "max_err": float(err)}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        print(json.dumps({"kernel": name, "ok": False,
                          "note": repr(e)[:300]}), flush=True)
        return False


def eigh9():
    from deepfepe_tpu.ops.jacobi import jacobi_eigh
    from deepfepe_tpu.ops.pallas.eigh9_pallas import eigh9_pallas

    rng = np.random.RandomState(0)
    A = rng.randn(512, 9, 9).astype(np.float32)
    A = (A + A.transpose(0, 2, 1)) / 2
    w_p, V_p = jax.jit(eigh9_pallas)(jnp.asarray(A))
    w_j, _ = jax.jit(jacobi_eigh)(jnp.asarray(A))
    return np.abs(np.asarray(w_p) - np.asarray(w_j)).max()


def matcher():
    from deepfepe_tpu.frontend.matching import mutual_nn_match

    # Compare as SETS: the best-first sort breaks float ties differently
    # between backends, so elementwise index comparison is meaningless.
    def pairs(m):
        val = np.asarray(m.valid)
        i1, i2 = np.asarray(m.idx1), np.asarray(m.idx2)
        return {
            (b, int(i1[b, k]), int(i2[b, k]))
            for b in range(val.shape[0])
            for k in range(val.shape[1]) if val[b, k]
        }

    rng = np.random.RandomState(1)
    worst = 0.0
    # Production SP fan-outs (out_num_points 1000-2000), with and without
    # padding — the padded case exercises the in-kernel -1e9 validity mask.
    for B, K, frac_valid in [(4, 1024, 1.0), (4, 1024, 0.7), (2, 2048, 0.8)]:
        D = 256
        base = rng.randn(B, K, D).astype(np.float32)
        d1 = base / np.linalg.norm(base, axis=-1, keepdims=True)
        d2p = base + 0.3 * rng.randn(B, K, D).astype(np.float32)
        d2 = d2p / np.linalg.norm(d2p, axis=-1, keepdims=True)
        v1 = jnp.asarray(rng.rand(B, K) < frac_valid)
        v2 = jnp.asarray(rng.rand(B, K) < frac_valid)
        a1, a2 = jnp.asarray(d1), jnp.asarray(d2)
        ref = mutual_nn_match(a1, a2, v1, v2, nn_thresh=0.9, backend="xla")
        got = mutual_nn_match(a1, a2, v1, v2, nn_thresh=0.9, backend="pallas")
        pr, pg = pairs(ref), pairs(got)
        if pr != pg:
            raise AssertionError(
                f"match sets differ at K={K} frac={frac_valid} "
                f"({len(pr ^ pg)} pairs)"
            )
        worst = max(worst, float(
            abs(np.sort(np.asarray(ref.scores), axis=None)
                - np.sort(np.asarray(got.scores), axis=None)).max()
        ))
    return worst


def epi_residual():
    from deepfepe_tpu.geometry.epipolar import compute_epi_residual
    from deepfepe_tpu.ops.pallas.epi_residual_pallas import (
        epi_residual_pallas,
    )

    rng = np.random.RandomState(2)
    B, N = 8, 1024
    p1 = np.concatenate(
        [rng.randn(B, N, 2), np.ones((B, N, 1))], -1
    ).astype(np.float32)
    p2 = np.concatenate(
        [rng.randn(B, N, 2), np.ones((B, N, 1))], -1
    ).astype(np.float32)
    F = rng.randn(B, 3, 3).astype(np.float32)
    got = jax.jit(epi_residual_pallas)(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(F)
    )
    ref = compute_epi_residual(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(F)
    )
    return np.abs(np.asarray(got) - np.asarray(ref)).max()


def mlp():
    from deepfepe_tpu.models.error_estimator import ErrorEstimator

    rng = np.random.RandomState(3)
    x = rng.randn(2, 512, 7).astype(np.float32)
    net_p = ErrorEstimator(dtype=jnp.bfloat16, use_pallas=True)
    net_x = ErrorEstimator(dtype=jnp.bfloat16, use_pallas=False)
    params = net_x.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_p = np.asarray(net_p.apply(params, jnp.asarray(x)))
    y_x = np.asarray(net_x.apply(params, jnp.asarray(x)))
    return np.abs(y_p - y_x).max()


def conv():
    from deepfepe_tpu.ops.pallas.conv_pallas import (
        conv3x3_affine_relu,
        conv3x3_affine_relu_ref,
    )

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 48, 96, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(2, 48, 96, 64).astype(np.float32))

    def loss(fn):
        return lambda x, w, sc, bi: jnp.sum(
            fn(x, w, sc, bi).astype(jnp.float32) * cot
        )

    f_p = loss(lambda *a: conv3x3_affine_relu(*a, backend="pallas"))
    f_x = loss(conv3x3_affine_relu_ref)
    err = np.abs(
        np.asarray(conv3x3_affine_relu(x, w, sc, bi, backend="pallas"))
        - np.asarray(conv3x3_affine_relu_ref(x, w, sc, bi))
    ).max()
    # Full backward on-chip incl. the input gradient (dx taps) — the
    # backward kernel only began compiling on real TPU in round 3
    # (f32-compare fix, commit 0b38e11); value+grad checked here since.
    g_p = jax.jit(jax.grad(f_p, (0, 1, 2, 3)))(x, w, sc, bi)
    g_x = jax.jit(jax.grad(f_x, (0, 1, 2, 3)))(x, w, sc, bi)
    gerr = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()
              / (np.abs(np.asarray(b)).max() + 1e-9))
        for a, b in zip(g_p, g_x)
    )
    return max(float(err), gerr)


def conv_s2d():
    """Space-to-depth-by-2 conv backend (value + all grads on-chip)."""
    from deepfepe_tpu.ops.pallas.conv_pallas import (
        conv3x3_affine_relu,
        conv3x3_affine_relu_ref,
    )

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 48, 96, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(2, 48, 96, 64).astype(np.float32))

    def loss(fn):
        return lambda x, w, sc, bi: jnp.sum(
            fn(x, w, sc, bi).astype(jnp.float32) * cot
        )

    f_s = loss(lambda *a: conv3x3_affine_relu(*a, backend="s2d"))
    f_x = loss(conv3x3_affine_relu_ref)
    err = np.abs(
        np.asarray(conv3x3_affine_relu(x, w, sc, bi, backend="s2d"))
        - np.asarray(conv3x3_affine_relu_ref(x, w, sc, bi))
    ).max()
    g_s = jax.jit(jax.grad(f_s, (0, 1, 2, 3)))(x, w, sc, bi)
    g_x = jax.jit(jax.grad(f_x, (0, 1, 2, 3)))(x, w, sc, bi)
    gerr = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()
              / (np.abs(np.asarray(b)).max() + 1e-9))
        for a, b in zip(g_s, g_x)
    )
    return max(float(err), gerr)


def conv_s2d_timing():
    """Standing s2d-vs-native conv timing (VERDICT r4 next-step #7).

    Round 4 measured the s2d-by-2 formulation at 96.8% MXU ISOLATED
    (2.2x over XLA's native 64-channel full-res schedule) but the
    [*,W,64]<->[*,W/2,128] layout shuffles erase the win in the full
    encoder graph on that axon XLA — so native stays the production
    default. This check re-measures the isolated ratio EVERY hardware
    run: if an XLA upgrade changes layout assignment, the printed
    speedup moving toward ~2x is the signal to re-bench the in-graph
    paths (DEEPFEPE_SP_CONV_IMPL=s2d) the same round. Full analysis:
    ROADMAP round-4 compute-floor table.
    """
    import time

    from deepfepe_tpu.ops.pallas.conv_pallas import (
        conv3x3_affine_relu,
        conv3x3_affine_relu_ref,
    )

    rng = np.random.RandomState(7)
    # The production pathology shape: full-res 64-channel encoder conv.
    x = jnp.asarray(rng.randn(4, 376, 1240, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    sc = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    def fwd_bwd(fn):
        def loss(x, w, sc, bi):
            return jnp.sum(fn(x, w, sc, bi).astype(jnp.float32))

        g = jax.grad(loss, (0, 1))

        @jax.jit
        def run(x, w, sc, bi):
            gx, gw = g(x, w, sc, bi)
            return jnp.sum(gw.astype(jnp.float32))

        return run

    def t_ms(run, iters=20):
        _ = float(np.asarray(run(x, w, sc, bi)))  # compile
        vals = []
        for _k in range(3):
            t0 = time.time()
            acc = 0.0
            for _ in range(iters):
                acc = run(x, w, sc, bi)
            _ = float(np.asarray(acc))
            t1 = time.time()
            acc = 0.0
            for _ in range(2 * iters):
                acc = run(x, w, sc, bi)
            _ = float(np.asarray(acc))
            t2 = time.time()
            vals.append(((t2 - t1) - (t1 - t0)) / iters * 1000.0)
        return float(np.median(vals))

    native_ms = t_ms(fwd_bwd(conv3x3_affine_relu_ref))
    s2d_ms = t_ms(
        fwd_bwd(lambda *a: conv3x3_affine_relu(*a, backend="s2d"))
    )
    speedup = native_ms / max(s2d_ms, 1e-9)
    print(json.dumps({
        "kernel": "conv_s2d_timing", "ok": True,
        "native_ms": round(native_ms, 2), "s2d_ms": round(s2d_ms, 2),
        "s2d_isolated_speedup": round(speedup, 2),
        "note": ("s2d stays opt-in; if this isolated speedup appears "
                 "in-graph after an XLA upgrade, flip "
                 "DEEPFEPE_SP_CONV_IMPL=s2d and re-bench"),
    }), flush=True)
    return True


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    ok = True
    ok &= check("eigh9_pallas", eigh9)
    ok &= check("matcher_pallas", matcher)
    ok &= check("epi_residual_pallas", epi_residual)
    ok &= check("mlp_pallas", mlp)
    ok &= check("conv_pallas", conv)
    ok &= check("conv_s2d", conv_s2d)
    try:
        conv_s2d_timing()
    except Exception as e:  # noqa: BLE001 — timing is advisory
        print(json.dumps({"kernel": "conv_s2d_timing", "ok": False,
                          "note": repr(e)[:300]}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
