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
bf16 (the inc.conv1 production shape) against the XLA reference. This
file is the ROUND-4 EXPERIMENT RECORD: every formulation tried stays
runnable (select with --kinds=spec,spec where spec = kind_th[_tw], e.g.
taps9_4, ky3_8, im2col_8, t4-ky3_16, dma-im2col_8, s2dc_16_64,
s2d9_32_128); the measured verdicts are tabulated in ROADMAP round-4
§full-res (short version: pure matmuls hit 74-78% MXU but every Pallas
formulation is capped at 9-14% by Mosaic copy/slice overheads; the
dma-* kinds do not compile on this axon Mosaic at all; XLA-native wins
in-graph).

    python tools/bench_conv_formulations.py [--kinds=...]
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


# ------------------------------------------------- manual-DMA strip kernels
# Full-width BlockSpec inputs break the Mosaic VMEM budget at th >= 8
# (remote-compile exit 1); instead the input stays in HBM (pl.ANY) and
# each grid step DMAs its own (th+2)-row halo strip into a
# double-buffered VMEM scratch — overlapping windows that BlockSpec
# cannot express. Output rows are disjoint, so y stays a plain BlockSpec.
def _k_dma(x_hbm, w_ref, s_ref, t_ref, y_ref, strip, sem,
           *, th, wc, c, tw, n_h, n_g, stride, kind, p_scr):
    b = pl.program_id(0)
    r = pl.program_id(1)
    g = b * n_h + r

    def start(gi, slot):
        bi = gi // n_h
        ri = gi % n_h
        row0 = bi * stride + ri * th
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, th + 2)], strip.at[slot], sem.at[slot]
        ).start()

    @pl.when(g == 0)
    def _first():
        start(0, 0)

    @pl.when(g + 1 < n_g)
    def _next():
        start(g + 1, (g + 1) % 2)

    slot = g % 2
    pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, th + 2)], strip.at[slot], sem.at[slot]
    ).wait()

    x_scr = strip.at[slot]
    for j in range(wc // tw):
        if kind == "dma_ky3":
            for ky in range(3):
                p_scr[:, :, ky * c:(ky + 1) * c] = (
                    x_scr[ky:ky + th, j * tw:j * tw + tw + 2, :]
                )
            acc = jnp.zeros((th * tw, c), jnp.float32)
            for kx in range(3):
                sl = p_scr[:, kx:kx + tw, :].reshape(th * tw, 3 * c)
                acc = acc + jnp.dot(sl, w_ref[kx],
                                    preferred_element_type=jnp.float32)
        else:  # dma_im2col
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


def make_dma_fn(kind, th, tw=256):
    Wc = _pad_up(W, tw)
    Hp = _pad_up(H, th)
    nH, nHs = Hp // th, (Hp + th) // th

    def fn(x, w, s, t):
        xf = _fold_rows(x, B, H, W, C, th)
        if xf.shape[1] < Wc + 2:
            xf = jnp.pad(xf, ((0, 0), (0, Wc + 2 - xf.shape[1]), (0, 0)))
        s2 = s.reshape(1, C)
        t2 = t.reshape(1, C)
        wd = w.astype(x.dtype)
        if kind == "dma_ky3":
            w_in = wd.transpose(1, 0, 2, 3).reshape(3, 3 * C, C)
            w_spec = pl.BlockSpec((3, 3 * C, C), lambda b, r: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
            p_shape = pltpu.VMEM((th, tw + 2, 3 * C), x.dtype)
        else:
            w_in = wd.reshape(9 * C, C)
            w_spec = pl.BlockSpec((9 * C, C), lambda b, r: (0, 0),
                                  memory_space=pltpu.VMEM)
            p_shape = pltpu.VMEM((th, tw, 9 * C), x.dtype)
        kern = functools.partial(
            _k_dma, th=th, wc=Wc, c=C, tw=tw, n_h=nH, n_g=B * nH,
            stride=Hp + th, kind=kind,
        )

        def kern2(x_hbm, w_ref, s_ref, t_ref, y_ref, strip, sem, p_scr):
            kern(x_hbm, w_ref, s_ref, t_ref, y_ref, strip, sem,
                 p_scr=p_scr)

        y = pl.pallas_call(
            kern2,
            grid=(B, nH),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
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
            scratch_shapes=[
                pltpu.VMEM((2, th + 2, Wc + 2, C), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                p_shape,
            ],
            interpret=_interp(),
        )(xf, w_in, s2, t2)
        return y.reshape(B, Hp, Wc, C)[:, :H, :W, :]

    return fn


# ----------------------------------------------------- s2d-by-2 kernel
# Space-to-depth along W by 2 is a FREE reinterpreting reshape in NHWC
# ([B,H,W,64] -> [B,H,W/2,128]: c = 2*g + dx maps linearly to lane
# dx*64+ch). The 3x3 conv then becomes, per ky, ONE [M, 384] x [384, 128]
# matmul over a 3-group patch concat whose lane writes are 128-ALIGNED
# (the unaligned 64-offset writes are what sank ky3/im2col above).
# K=384, N=128 fills the MXU; 2 of 6 weight blocks are structurally zero
# (1.5x padded FLOPs) — effective ceiling ~67% vs 25% for 9-tap.
def _k_s2d(a_ref, b_ref, c_ref, d_ref, w_ref, s_ref, t_ref, y_ref,
           x_scr, p_scr=None, *, th, tg, cl):
    # cl = 128 (2*C). x_scr: [th+2, tg+2, cl]; p_scr: [th+2, tg, 3*cl].
    x_scr[0:th, 0:tg] = a_ref[...]
    x_scr[th:th + 2, 0:tg] = b_ref[...]
    x_scr[0:th, tg:tg + 2] = c_ref[:, 0:2, :]
    x_scr[th:th + 2, tg:tg + 2] = d_ref[:, 0:2, :]
    M = th * tg
    acc = jnp.zeros((M, cl), jnp.float32)
    if p_scr is not None:  # concat variant: 3 matmuls of K=3*cl
        for k in range(3):
            p_scr[:, :, k * cl:(k + 1) * cl] = x_scr[:, k:k + tg, :]
        for ky in range(3):
            sl = p_scr[ky:ky + th, :, :].reshape(M, 3 * cl)
            acc = acc + jnp.dot(sl, w_ref[ky],
                                preferred_element_type=jnp.float32)
    else:  # 9 matmuls of K=cl, no patch materialization
        for ky in range(3):
            for k in range(3):
                sl = x_scr[ky:ky + th, k:k + tg, :].reshape(M, cl)
                acc = acc + jnp.dot(sl, w_ref[ky, k],
                                    preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
    y_ref[...] = y.reshape(th, tg, cl).astype(y_ref.dtype)


def _fold_groups(x, th, tg):
    """[B,H,W,C] -> s2d-by-2 folded layout [B*(Hp+th), Gp+8, 2C] with a
    1-row top halo and a 1-group (2 px) left halo, zero padded; tail room
    for the 8-group-wide col-tail blocks."""
    Bb, Hh, Ww, Cc = x.shape
    G = Ww // 2
    xg = x.reshape(Bb, Hh, G, 2 * Cc)
    Gp = _pad_up(G, tg)
    Hp = _pad_up(Hh, th)
    stride = Hp + th
    out = jnp.zeros((Bb, stride, Gp + 8, 2 * Cc), x.dtype)
    out = lax.dynamic_update_slice(out, xg, (0, 1, 1, 0))
    return out.reshape(Bb * stride, Gp + 8, 2 * Cc), G, Gp, Hp


def pack_w_s2d(w):
    """[3,3,C,C] -> [3(ky), 3*2C, 2C]: rows (k group slot, dx, ch),
    cols (j, co); entry = W[ky, 2k-1+dx-j, ch, co] or 0."""
    C3 = w.shape[-1]
    out = jnp.zeros((3, 6 * C3, 2 * C3), w.dtype)
    for ky in range(3):
        for k in range(3):
            for dx in range(2):
                for j in range(2):
                    kx = 2 * k - 1 + dx - j
                    if 0 <= kx <= 2:
                        out = out.at[
                            ky, (2 * k + dx) * C3:(2 * k + dx + 1) * C3,
                            j * C3:(j + 1) * C3].set(w[ky, kx])
    return out


def pack_w_s2d9(w):
    """[3,3,C,C] -> [3(ky), 3(k), 2C, 2C] per-slot weights."""
    C3 = w.shape[-1]
    out = jnp.zeros((3, 3, 2 * C3, 2 * C3), w.dtype)
    for ky in range(3):
        for k in range(3):
            for dx in range(2):
                for j in range(2):
                    kx = 2 * k - 1 + dx - j
                    if 0 <= kx <= 2:
                        out = out.at[ky, k, dx * C3:(dx + 1) * C3,
                                     j * C3:(j + 1) * C3].set(w[ky, kx])
    return out


def make_s2d_fn(th, tg=64, concat=True):
    def fn(x, w, s, t):
        cl = 2 * C
        xf, G, Gp, Hp = _fold_groups(x, th, tg)
        nH, nHs = Hp // th, (Hp + th) // th
        nG = Gp // tg
        w_in = (pack_w_s2d(w) if concat else pack_w_s2d9(w)).astype(x.dtype)
        s2 = jnp.tile(s.reshape(1, C), (1, 2))
        t2 = jnp.tile(t.reshape(1, C), (1, 2))
        if concat:
            kern = functools.partial(_k_s2d, th=th, tg=tg, cl=cl)
        else:
            def kern(a, b2, c2, d2, wr, sr, tr, yr, xs):
                return _k_s2d(a, b2, c2, d2, wr, sr, tr, yr, xs, None,
                              th=th, tg=tg, cl=cl)
        y = pl.pallas_call(
            kern,
            grid=(B, nH, nG),
            in_specs=[
                pl.BlockSpec((th, tg, cl),
                             lambda b, r, j: (b * nHs + r, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tg, cl),
                             lambda b, r, j: (
                                 (b * nHs + r + 1) * (th // 2), j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((th, 8, cl),
                             lambda b, r, j: (
                                 b * nHs + r, (j + 1) * (tg // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 8, cl),
                             lambda b, r, j: (
                                 (b * nHs + r + 1) * (th // 2),
                                 (j + 1) * (tg // 8), 0),
                             memory_space=pltpu.VMEM),
                (pl.BlockSpec((3, 3 * cl, cl),
                              lambda b, r, j: (0, 0, 0),
                              memory_space=pltpu.VMEM) if concat else
                 pl.BlockSpec((3, 3, cl, cl),
                              lambda b, r, j: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)),
                pl.BlockSpec((1, cl), lambda b, r, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cl), lambda b, r, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, tg, cl),
                                   lambda b, r, j: (b * nH + r, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * Hp, Gp, cl), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((th + 2, tg + 2, cl), x.dtype),
            ] + ([pltpu.VMEM((th + 2, tg, 3 * cl), x.dtype)]
                 if concat else []),
            interpret=_interp(),
        )(xf, xf, xf, xf, w_in, s2, t2)
        return y.reshape(B, Hp, Gp * 2, C)[:, :H, :W, :]

    return fn


# -------------------------------------------- 4-ref 2D-tiled kernels
# Manual HBM DMA does not compile on the axon remote Mosaic at all
# (probe: even a bare strip-copy kernel exits 1), so the overlapping
# [th+2, tw+2] halo window is assembled from FOUR disjoint BlockSpec
# refs instead: main (th, tw), row-tail (2, tw), col-tail (th, 2) and
# corner (2, 2) — the same fold-stride index arithmetic the row-halo
# kernels already use, applied to both axes.
def _k_t4(a_ref, b_ref, c_ref, d_ref, w_ref, s_ref, t_ref, y_ref,
          x_scr, p_scr, *, th, tw, c, kind):
    x_scr[0:th, 0:tw] = a_ref[...]
    x_scr[th:th + 2, 0:tw] = b_ref[...]
    x_scr[0:th, tw:tw + 2] = c_ref[:, 0:2, :]
    x_scr[th:th + 2, tw:tw + 2] = d_ref[:, 0:2, :]
    if kind.endswith("ky3"):
        for ky in range(3):
            p_scr[:, :, ky * c:(ky + 1) * c] = x_scr[ky:ky + th, :, :]
        acc = jnp.zeros((th * tw, c), jnp.float32)
        for kx in range(3):
            sl = p_scr[:, kx:kx + tw, :].reshape(th * tw, 3 * c)
            acc = acc + jnp.dot(sl, w_ref[kx],
                                preferred_element_type=jnp.float32)
    else:
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                p_scr[:, :, k * c:(k + 1) * c] = (
                    x_scr[ky:ky + th, kx:kx + tw, :]
                )
        acc = jnp.dot(p_scr[...].reshape(th * tw, 9 * c), w_ref[...],
                      preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
    y_ref[...] = y.reshape(th, tw, c).astype(y_ref.dtype)


def make_t4_fn(kind, th, tw=256):
    Wc = _pad_up(W, tw)
    Hp = _pad_up(H, th)
    nH, nHs = Hp // th, (Hp + th) // th
    nW = Wc // tw

    def fn(x, w, s, t):
        xf = _fold_rows(x, B, H, W, C, th)
        if xf.shape[1] < Wc + 8:  # room for the 8-wide col-tail blocks
            xf = jnp.pad(xf, ((0, 0), (0, Wc + 8 - xf.shape[1]), (0, 0)))
        s2 = s.reshape(1, C)
        t2 = t.reshape(1, C)
        wd = w.astype(x.dtype)
        if kind.endswith("ky3"):
            w_in = wd.transpose(1, 0, 2, 3).reshape(3, 3 * C, C)
            w_spec = pl.BlockSpec((3, 3 * C, C), lambda b, r, j: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
            p_shape = pltpu.VMEM((th, tw + 2, 3 * C), x.dtype)
        else:
            w_in = wd.reshape(9 * C, C)
            w_spec = pl.BlockSpec((9 * C, C), lambda b, r, j: (0, 0),
                                  memory_space=pltpu.VMEM)
            p_shape = pltpu.VMEM((th, tw, 9 * C), x.dtype)
        kern = functools.partial(_k_t4, th=th, tw=tw, c=C, kind=kind)
        y = pl.pallas_call(
            kern,
            grid=(B, nH, nW),
            in_specs=[
                pl.BlockSpec((th, tw, C),
                             lambda b, r, j: (b * nHs + r, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tw, C),
                             lambda b, r, j: (
                                 (b * nHs + r + 1) * (th // 2), j, 0),
                             memory_space=pltpu.VMEM),
                # Tail blocks are 8 columns wide (Mosaic's sublane
                # minimum); only the first 2 are consumed.
                pl.BlockSpec((th, 8, C),
                             lambda b, r, j: (
                                 b * nHs + r, (j + 1) * (tw // 8), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 8, C),
                             lambda b, r, j: (
                                 (b * nHs + r + 1) * (th // 2),
                                 (j + 1) * (tw // 8), 0),
                             memory_space=pltpu.VMEM),
                w_spec,
                pl.BlockSpec((1, C), lambda b, r, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, r, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, tw, C),
                                   lambda b, r, j: (b * nH + r, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * Hp, Wc, C), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((th + 2, tw + 2, C), x.dtype),
                p_shape,
            ],
            interpret=_interp(),
        )(xf, xf, xf, xf, w_in, s2, t2)
        return y.reshape(B, Hp, Wc, C)[:, :H, :W, :]

    return fn


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


# Every formulation tried in round 4, selectable by name (the measured
# verdicts live in ROADMAP §full-res; keep ALL variants runnable so the
# numbers are reproducible). Spec: kind_th[_tw].
def build(spec):
    parts = spec.split("_")
    kind = parts[0]
    th = int(parts[1])
    tw = int(parts[2]) if len(parts) > 2 else 256
    if kind in ("taps9", "ky3", "im2col"):
        return make_fn(kind, th, tw)
    if kind in ("dma-ky3", "dma-im2col"):
        return make_dma_fn(kind.replace("-", "_"), th, tw)
    if kind in ("t4-ky3", "t4-im2col"):
        return make_t4_fn(kind.replace("-", "_"), th, tw)
    if kind in ("s2dc", "s2d9"):
        return make_s2d_fn(th, tw, concat=(kind == "s2dc"))
    raise ValueError(f"unknown kind {spec!r}")


DEFAULT_KINDS = ("taps9_4", "s2dc_16_64", "s2d9_32_128")


def main():
    kinds = DEFAULT_KINDS
    for a in sys.argv[1:]:
        if a.startswith("--kinds="):
            kinds = a.split("=", 1)[1].split(",")

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

    for spec in kinds:
        try:
            f = build(spec)
            y = f(x, w, s, t)
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - ref_y.astype(jnp.float32))))
            g = jax.jit(lambda *a, f=f: jnp.sum(
                f(*a).astype(jnp.float32)))
            dt = timeit(g, x, w, s, t)
            print(json.dumps({
                "kind": spec, "ms": round(dt * 1e3, 2),
                "mxu_pct": round(FLOP / dt / 197e12 * 100, 1),
                "max_err": err,
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kind": spec,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
