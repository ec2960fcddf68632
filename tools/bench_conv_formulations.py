"""MXU-utilization shootout for the full-res 64->64 conv3x3 forward.

Round-4 finding (tools/profile_encoder_blocks.py): the gauss2 `inc` block
is COMPUTE-bound at ~22% MXU in XLA (fwd 6.4 ms / bwd 18.2 ms vs a
1.9 ms bandwidth floor at the measured 773 GB/s) — the 64-channel conv
runs the 128x128 systolic array quarter-filled (K=64, N=64). Candidate
Pallas formulations that raise the contraction depth:

  taps9:   9 separate [M,64]x[64,64] matmuls (round-3 kernel; K=64 ceiling 25%)
  ky3:     stack the 3 ky taps -> 3 [M,192]x[192,64] matmuls (K=192, ceiling 50%)
  im2col:  9 taps stacked -> 1 [M,576]x[576,64] matmul (K=576, ceiling 50%)

All compute y = relu(conv3x3_same(x, W) * s + t) at B=8, 376x1240, 64ch
bf16 (the inc.conv1 production shape) against the XLA reference.

    python tools/bench_conv_formulations.py
"""

import functools
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfepe_tpu.ops.pallas.conv_pallas import (
    _fold_rows,
    _pad_up,
    conv3x3_affine_relu_ref,
)

B, H, W, C = 8, 376, 1240, 64
FLOP = B * H * W * 9 * 2 * C * C


def _interp():
    return jax.default_backend() not in ("tpu", "axon")


# ------------------------------------------------------------------ taps9
def _k_taps9(xa, xb, w_ref, s_ref, t_ref, y_ref, x_scr, *, th, wc, c):
    x_scr[0:th] = xa[...]
    x_scr[th:th + 2] = xb[...]
    acc = jnp.zeros((th * wc, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = x_scr[ky:ky + th, kx:kx + wc, :].reshape(th * wc, c)
            acc = acc + jnp.dot(sl, w_ref[ky, kx],
                                preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
    y_ref[...] = y.reshape(th, wc, c).astype(y_ref.dtype)


# ------------------------------------------------------------------- ky3
# Width is chunked INSIDE the kernel (tw columns at a time) so the patch
# scratch stays small while blocks remain full-width (aligned I/O): the
# full-width scratch versions exceed the Mosaic VMEM budget at wc=1248
# (remote-compile exit 1; small-shape probe compiles fine).
def _k_ky3(xa, xb, w_ref, s_ref, t_ref, y_ref, x_scr, p_scr,
           *, th, wc, c, tw):
    # p_scr[r, c2, ky*C + ch] = x[r + ky, j*tw + c2, ch] per chunk j.
    x_scr[0:th] = xa[...]
    x_scr[th:th + 2] = xb[...]
    for j in range(wc // tw):
        for ky in range(3):
            p_scr[:, :, ky * c:(ky + 1) * c] = (
                x_scr[ky:ky + th, j * tw:j * tw + tw + 2, :]
            )
        acc = jnp.zeros((th * tw, c), jnp.float32)
        for kx in range(3):
            sl = p_scr[:, kx:kx + tw, :].reshape(th * tw, 3 * c)
            acc = acc + jnp.dot(sl, w_ref[kx],
                                preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
        y_ref[:, j * tw:(j + 1) * tw, :] = (
            y.reshape(th, tw, c).astype(y_ref.dtype)
        )


# ---------------------------------------------------------------- im2col
def _k_im2col(xa, xb, w_ref, s_ref, t_ref, y_ref, x_scr, p_scr,
              *, th, wc, c, tw):
    x_scr[0:th] = xa[...]
    x_scr[th:th + 2] = xb[...]
    for j in range(wc // tw):
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                p_scr[:, :, k * c:(k + 1) * c] = (
                    x_scr[ky:ky + th, j * tw + kx:j * tw + kx + tw, :]
                )
        acc = jnp.dot(p_scr[...].reshape(th * tw, 9 * c), w_ref[...],
                      preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
        y_ref[:, j * tw:(j + 1) * tw, :] = (
            y.reshape(th, tw, c).astype(y_ref.dtype)
        )


def make_fn(kind, th, tw=256):
    Wc = _pad_up(W, tw) if kind != "taps9" else _pad_up(W, 16)
    Hp = _pad_up(H, th)
    nH, nHs = Hp // th, (Hp + th) // th

    def fn(x, w, s, t):
        xf = _fold_rows(x, B, H, W, C, th)
        if xf.shape[1] < Wc + 2:  # width padded beyond _fold_rows' 16
            xf = jnp.pad(xf, ((0, 0), (0, Wc + 2 - xf.shape[1]), (0, 0)))
        s2 = s.reshape(1, C)
        t2 = t.reshape(1, C)
        wd = w.astype(x.dtype)
        if kind == "taps9":
            kern = functools.partial(_k_taps9, th=th, wc=Wc, c=C)
            w_in = wd  # [3,3,C,C]
            w_spec = pl.BlockSpec((3, 3, C, C), lambda b, r: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((th + 2, Wc + 2, C), x.dtype)]
        elif kind == "ky3":
            kern = functools.partial(_k_ky3, th=th, wc=Wc, c=C, tw=tw)
            # [3(kx), 3*C(ky-major rows), C]
            w_in = wd.transpose(1, 0, 2, 3).reshape(3, 3 * C, C)
            w_spec = pl.BlockSpec((3, 3 * C, C), lambda b, r: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((th + 2, Wc + 2, C), x.dtype),
                       pltpu.VMEM((th, tw + 2, 3 * C), x.dtype)]
        else:  # im2col
            kern = functools.partial(_k_im2col, th=th, wc=Wc, c=C, tw=tw)
            w_in = wd.reshape(9 * C, C)
            w_spec = pl.BlockSpec((9 * C, C), lambda b, r: (0, 0),
                                  memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((th + 2, Wc + 2, C), x.dtype),
                       pltpu.VMEM((th, tw, 9 * C), x.dtype)]
        y = pl.pallas_call(
            kern,
            grid=(B, nH),
            in_specs=[
                pl.BlockSpec((th, Wc + 2, C),
                             lambda b, r: (b * nHs + r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, Wc + 2, C),
                             lambda b, r: ((b * nHs + r + 1) * (th // 2),
                                           0, 0),
                             memory_space=pltpu.VMEM),
                w_spec,
                pl.BlockSpec((1, C), lambda b, r: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, Wc, C),
                                   lambda b, r: (b * nH + r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * Hp, Wc, C), x.dtype),
            scratch_shapes=scratch,
            interpret=_interp(),
        )(xf, xf, w_in, s2, t2)
        return y.reshape(B, Hp, Wc, C)[:, :H, :W, :]

    return fn


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


def main():
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(k[1], (3, 3, C, C), jnp.float32) * 0.1
    s = jnp.ones((C,), jnp.float32)
    t = jnp.zeros((C,), jnp.float32)

    ref = jax.jit(lambda *a: jnp.sum(
        conv3x3_affine_relu_ref(*a).astype(jnp.float32)))
    dt = timeit(ref, x, w, s, t)
    print(json.dumps({"kind": "xla", "ms": round(dt * 1e3, 2),
                      "mxu_pct": round(FLOP / dt / 197e12 * 100, 1)}),
          flush=True)
    ref_y = conv3x3_affine_relu_ref(x, w, s, t)

    for kind, ths in (("taps9", (4,)), ("ky3", (8, 16)),
                      ("im2col", (8, 16))):
        for th in ths:
            try:
                f = make_fn(kind, th)
                y = f(x, w, s, t)
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref_y.astype(jnp.float32))))
                g = jax.jit(lambda *a, f=f: jnp.sum(
                    f(*a).astype(jnp.float32)))
                dt = timeit(g, x, w, s, t)
                print(json.dumps({
                    "kind": kind, "th": th, "ms": round(dt * 1e3, 2),
                    "mxu_pct": round(FLOP / dt / 197e12 * 100, 1),
                    "max_err": err,
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"kind": kind, "th": th,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
