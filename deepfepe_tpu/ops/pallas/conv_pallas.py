"""Pallas TPU kernel: fused 3x3 conv + per-channel affine + ReLU.

Forward AND backward (dgrad + wgrad + affine-param grads) as flat
NHWC row-tile kernels. Motivation (round 3, measured on the v5e at the
reference's full-res operating point, tools/profile_fullres_cost.py +
the xprof trace in experiments/trace_fullres): XLA's backward schedule
for the SuperPoint encoder moves ~90 GB/step — it re-layouts the
full-res activations into space-to-depth form ([376,32,156,64] tensors),
materializes kw-unrolled patch tensors for the conv weight gradients
(720 MB pad_maximum fusions), runs separate reduction passes for the
BN-parameter gradients, and pays layout copies between all of them. The
`inc` double-conv block alone costs 73 ms of the 135 ms step at 81.6%
HBM utilization — bandwidth-bound on traffic an ideal schedule doesn't
have.

Measured verdict (v5e, tools/bench_conv_kernel.py): XLA's conv emitter
wins. Forward: 6.6 vs 12.4 ms for the full-res 64->64 conv (the
64-channel matmuls run the MXU at 25% and the halo fetch adds
(th+2)/th read amplification); fwd+bwd: 21.4 vs 40.8 ms (conv1),
5.1 vs 10.2 ms (down1). Two real Mosaic findings from getting it to
compile at all: bf16 compare/select crashes this Mosaic version's
remote compiler (masks must compare in f32 — see _bwd_kernel), and
row-tiles need th*wc <= ~5k fwd / ~2.5k bwd or the compiler exits 1 on
VMEM pressure. The production SP path therefore routes the RESTRUCTURED
XLA impl (conv3x3_affine_relu_ref via frontend/sp_pallas.py,
CONV_IMPL='xla'); what actually recovered the round-3 joint-step
regression was batching both frames into one B=8 encoder pass — XLA
picks a ~3x-worse conv strategy for B=4 full-res chains (93.8 ms for
two B=4 encoder fwd+bwd chains vs 31.6 ms for one B=8). The pallas path
stays selectable (DEEPFEPE_SP_CONV_IMPL=pallas / backend='pallas') for
future Mosaic versions; its interpret-mode semantics are exact
(tests/test_conv_pallas.py).

This kernel computes y = relu(conv3x3_same(x, W) * scale + bias) one
row-tile at a time (TH output rows x the full padded width), with the
3x3 taps as nine [TH*W, Cin] x [Cin, C] MXU matmuls accumulated in f32.
All arrays are laid out rank-3 ([B*rows, W, C], batch folded into the
row axis with per-image zero halos) so every block keeps Mosaic's
last-two-dims tiling with singleton-free leading dims. The backward
kernel recomputes nothing and materializes nothing: one pass over
(x, y, dy) tiles produces dx (transposed-conv taps), dW (nine
[Cin, TH*W] x [TH*W, C] contractions accumulated across the sequential
grid into a VMEM-resident block), and the affine-parameter gradients
(channel reductions of dz and dz*(y-bias)/scale) — the BN/ReLU/bias
backward that XLA runs as separate full-res passes.

The affine form covers both SuperPoint variants: inference-mode
BatchNorm folds to scale = gamma/sqrt(var+eps), bias' = (b-mean)*scale
+ beta (SuperPointNetGauss2 — the joint train step runs BN on running
stats); plain conv+ReLU is scale=1, bias'=bias (SuperPointNet).

Reference behavior being replaced: the torch frontend's conv stack
(pytorch-superpoint SuperPointNet_gauss2, consumed per
train_good.py:224-237); numerically equivalent to the flax modules in
frontend/superpoint.py (tests/test_conv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # default output rows per grid tile


def _pick_th(wc: int, limit: int = 5120) -> int:
    """Tile height: keep th*wc (the f32 accumulator + scratch rows)
    small enough for VMEM with double-buffered, lane-padded blocks.
    Measured on the v5e: the forward compiles with th*wc <= ~5k (th=8 up
    to W~700, th=4 at full-res W=1240); the backward holds 3 scratch
    maps + 2 accumulators, so it gets half the budget."""
    for th in (8, 4, 2):
        if th * wc <= limit or th == 2:
            return th
    return 2


def _interpret() -> bool:
    # default_backend is static at trace time; the axon tunnel reports
    # its own platform name (see ops/eigh.py convention).
    return jax.default_backend() not in ("tpu", "axon")


def _pad_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _safe(s):
    return jnp.where(jnp.abs(s) < 1e-8, jnp.float32(1.0), s)


def _fold_rows(a, B, H, W, C, th):
    """[B,H,W,C] -> [B*(Hp+th), Wc+2, C] with a one-row top halo and
    zero-padding per image, so tile r of image b starts at flat row
    b*(Hp+th) + r*th and sees its own halo rows only (the th-row tail
    pad keeps per-image strides divisible by th)."""
    Hp, Wc = _pad_up(H, th), _pad_up(W, 16)
    stride = Hp + th
    out = jnp.zeros((B, stride, Wc + 2, C), a.dtype)
    out = lax.dynamic_update_slice(out, a, (0, 1, 1, 0))
    return out.reshape(B * stride, Wc + 2, C)


# ---------------------------------------------------------------- forward

def _fwd_kernel(xa_ref, xb_ref, w_ref, s_ref, t_ref, y_ref, x_scr,
                *, th, wc, cin, cout):
    # xa: [th, wc+2, cin] rows [R, R+th) of the folded input (R = the
    # tile's flat start row); xb: [2, wc+2, cin] rows [R+th, R+th+2).
    x_scr[0:th] = xa_ref[...]
    x_scr[th:th + 2] = xb_ref[...]
    acc = jnp.zeros((th * wc, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = x_scr[ky:ky + th, kx:kx + wc, :]
            if cin == 1:
                acc = acc + (
                    sl.reshape(th * wc, 1).astype(jnp.float32)
                    * w_ref[ky, kx].astype(jnp.float32)
                )
            else:
                acc = acc + jnp.dot(
                    sl.reshape(th * wc, cin), w_ref[ky, kx],
                    preferred_element_type=jnp.float32,
                )
    y = jnp.maximum(acc * s_ref[:] + t_ref[:], 0.0)
    y_ref[...] = y.reshape(th, wc, cout).astype(y_ref.dtype)


def _fwd_pallas(x, w, scale, bias):
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    Wc = _pad_up(W, 16)
    TH = _pick_th(Wc)
    Hp = _pad_up(H, TH)
    nH, nHs = Hp // TH, (Hp + TH) // TH  # tiles per image / stride in tiles
    xf = _fold_rows(x, B, H, W, Cin, TH)
    s2 = scale.astype(jnp.float32).reshape(1, C)
    t2 = bias.astype(jnp.float32).reshape(1, C)

    kern = functools.partial(_fwd_kernel, th=TH, wc=Wc, cin=Cin, cout=C)
    y = pl.pallas_call(
        kern,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((TH, Wc + 2, Cin),
                         lambda b, r: (b * nHs + r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Wc + 2, Cin),
                         lambda b, r: ((b * nHs + r + 1) * (TH // 2), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C), lambda b, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, Wc, C), lambda b, r: (b * nH + r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * Hp, Wc, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH + 2, Wc + 2, Cin), x.dtype)],
        interpret=_interpret(),
    )(xf, xf, w.astype(x.dtype), s2, t2)
    return y.reshape(B, Hp, Wc, C)[:, :H, :W, :]


# --------------------------------------------------------------- backward

def _bwd_kernel(xa_ref, xb_ref, dya_ref, dyb_ref, ya_ref, yb_ref,
                w_ref, s_ref, t_ref,
                dx_ref, dw_ref, ds_ref, dt_ref,
                x_scr, dz_scr, y_scr, *, th, wc, cin, cout, need_dx):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dt_ref[...] = jnp.zeros_like(dt_ref)

    s = s_ref[:].astype(jnp.float32)            # [1, C]
    s_safe = _safe(s)
    t = t_ref[:].astype(jnp.float32)

    x_scr[0:th] = xa_ref[...]
    x_scr[th:th + 2] = xb_ref[...]
    y_scr[0:th] = ya_ref[...]
    y_scr[th:th + 2] = yb_ref[...]
    # dz = dL/d(conv out) = dy * relu'(y) * scale, on the full halo tile.
    # NOTE: the compare must run in f32 — bf16 compare/select crashes
    # this Mosaic version's remote compiler (bisected, tools-level probe).
    for lo, hi, ref in ((0, th, dya_ref), (th, th + 2, dyb_ref)):
        mask = (y_scr[lo:hi].astype(jnp.float32) > 0).astype(jnp.float32)
        dz_scr[lo:hi] = (
            ref[...].astype(jnp.float32) * mask * s[None]
        ).astype(dz_scr.dtype)

    M = th * wc
    dz_own = dz_scr[1:th + 1, 1:wc + 1, :].reshape(M, cout)
    y_own = y_scr[1:th + 1, 1:wc + 1, :].reshape(M, cout).astype(jnp.float32)
    dz_own_f = dz_own.astype(jnp.float32)
    # m = dy*relu'(y) = dz/scale; dt = sum(m); ds = sum(m * z) with the
    # pre-affine z recovered as (y - bias)/scale where the relu is active.
    m_own = dz_own_f / s_safe
    dt_ref[...] += jnp.sum(m_own, axis=0, keepdims=True)
    ds_ref[...] += jnp.sum(m_own * (y_own - t) / s_safe, axis=0,
                           keepdims=True)

    # Weight grad: dW[ky,kx] = x_shift^T @ dz_own — K = th*wc (MXU-deep).
    # cin==1 degenerates the matmul to a broadcast-reduce (VPU); Mosaic's
    # verifier rejects lane-1 dot operands.
    for ky in range(3):
        for kx in range(3):
            xs = x_scr[ky:ky + th, kx:kx + wc, :].reshape(M, cin)
            if cin == 1:
                dw_ref[ky, kx] += jnp.sum(
                    xs.astype(jnp.float32) * dz_own_f, axis=0, keepdims=True
                )
            else:
                dw_ref[ky, kx] += lax.dot_general(
                    xs, dz_own, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    # Input grad: transposed conv over dz, dx[a,b] += dz[a+1-ky, b+1-kx]
    # @ W[ky,kx]^T (dz tile coords carry a +1 pad offset).
    if need_dx:
        dxa = jnp.zeros((M, cin), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                dsl = dz_scr[2 - ky:2 - ky + th,
                             2 - kx:2 - kx + wc, :].reshape(M, cout)
                if cin == 1:
                    dxa = dxa + jnp.sum(
                        dsl.astype(jnp.float32)
                        * w_ref[ky, kx].astype(jnp.float32),
                        axis=1, keepdims=True,
                    )
                else:
                    dxa = dxa + lax.dot_general(
                        dsl, w_ref[ky, kx], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        dx_ref[...] = dxa.reshape(th, wc, cin).astype(dx_ref.dtype)
    else:
        dx_ref[...] = jnp.zeros((th, wc, cin), dx_ref.dtype)


def _bwd_pallas(need_dx, x, w, scale, bias, y, dy):
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    Wc = _pad_up(W, 16)
    TH = _pick_th(Wc, limit=2560)
    Hp = _pad_up(H, TH)
    nH, nHs = Hp // TH, (Hp + TH) // TH
    xf = _fold_rows(x, B, H, W, Cin, TH)
    dyf = _fold_rows(dy, B, H, W, C, TH)
    yf = _fold_rows(y, B, H, W, C, TH)
    s2 = scale.astype(jnp.float32).reshape(1, C)
    t2 = bias.astype(jnp.float32).reshape(1, C)

    kern = functools.partial(_bwd_kernel, th=TH, wc=Wc, cin=Cin, cout=C,
                             need_dx=need_dx)

    def spec_a(ch):
        return pl.BlockSpec((TH, Wc + 2, ch),
                            lambda b, r: (b * nHs + r, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_b(ch):
        return pl.BlockSpec((2, Wc + 2, ch),
                            lambda b, r: ((b * nHs + r + 1) * (TH // 2), 0, 0),
                            memory_space=pltpu.VMEM)

    dx, dw, ds, dt = pl.pallas_call(
        kern,
        grid=(B, nH),
        in_specs=[
            spec_a(Cin), spec_b(Cin),
            spec_a(C), spec_b(C),
            spec_a(C), spec_b(C),
            pl.BlockSpec((3, 3, Cin, C), lambda b, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TH, Wc, Cin), lambda b, r: (b * nH + r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C), lambda b, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Hp, Wc, Cin), x.dtype),
            jax.ShapeDtypeStruct((3, 3, Cin, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Wc + 2, Cin), x.dtype),
            # dz is held in dy.dtype (bf16 on the production path): the
            # wgrad/dgrad contractions take dz as a matmul OPERAND, which
            # is the same operand precision XLA's conv backward uses for
            # bf16 activations (accumulation stays f32 either way). An f32
            # dz scratch would double this block's VMEM and push TH down.
            pltpu.VMEM((TH + 2, Wc + 2, C), dy.dtype),
            pltpu.VMEM((TH + 2, Wc + 2, C), y.dtype),
        ],
        interpret=_interpret(),
    )(xf, xf, dyf, dyf, yf, yf, w.astype(x.dtype), s2, t2)
    if need_dx:
        dx = dx.reshape(B, Hp, Wc, Cin)[:, :H, :W, :]
    else:
        dx = jnp.zeros_like(x)
    return dx, dw.astype(w.dtype), ds[0].astype(scale.dtype), \
        dt[0].astype(bias.dtype)


# ------------------------------------------------------- custom-VJP facade

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(need_dx, x, w, scale, bias):
    return _fwd_pallas(x, w, scale, bias)


def _fused_fwd(need_dx, x, w, scale, bias):
    y = _fwd_pallas(x, w, scale, bias)
    return y, (x, w, scale, bias, y)


def _fused_bwd(need_dx, res, dy):
    x, w, scale, bias, y = res
    return _bwd_pallas(need_dx, x, w, scale, bias, y, dy)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _pack_w_s2d(w, dtype):
    """[3,3,Cin,C] -> [3,3,2Cin,2C] space-to-depth-by-2 conv kernel.

    Entry [kh, kw, dx*Cin+ch, j*C+co] = W[kh, kx, ch, co] with
    kx = 2*kw - 1 + dx - j (zero outside [0, 2]). Built with traced jnp
    ops so autodiff routes dW_s2d back to the true dW exactly (the pack
    is linear; padded blocks are structural zeros)."""
    Cin, C = w.shape[-2], w.shape[-1]
    out = jnp.zeros((3, 3, 2 * Cin, 2 * C), dtype)
    wd = w.astype(dtype)
    for kw_ in range(3):
        for dx in range(2):
            for j in range(2):
                kx = 2 * kw_ - 1 + dx - j
                if 0 <= kx <= 2:
                    out = out.at[
                        :, kw_, dx * Cin:(dx + 1) * Cin,
                        j * C:(j + 1) * C].set(wd[:, kx])
    return out


def conv3x3_affine_relu_s2d_pre(xs, w, scale, bias):
    """s2d-native fused conv: xs is ALREADY in space-to-depth-by-2 form
    [B, H, W/2, 2*Cin]; returns [B, H, W/2, 2*C]. Used to keep whole
    encoder blocks in s2d layout — measured (round 4): the [*,W,64] <->
    [*,W/2,128] reshape is a real TPU layout shuffle (64-lane tensors
    are half-padded), so converting per-conv gives back the MXU win;
    converting once per block (or never) keeps it."""
    ws = _pack_w_s2d(w, xs.dtype)
    y = lax.conv_general_dilated(
        xs, ws, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s2 = jnp.tile(scale.astype(jnp.float32), 2)
    t2 = jnp.tile(bias.astype(jnp.float32), 2)
    y = jnp.maximum(y.astype(jnp.float32) * s2 + t2, 0.0)
    return y.astype(xs.dtype)


def max_pool_2x2_s2d(ys):
    """2x2/2 max pool on an s2d-by-2 tensor, s2d in -> s2d out.

    ys [B, H, G, 2C] (G = W/2); returns [B, H/2, G/2, 2C] — the s2d form
    of max_pool(y, 2x2). Output group g', slot j, channel ch pools input
    rows {2h', 2h'+1} x input group 2g'+j's two slots."""
    B, H, G, L = ys.shape
    C = L // 2
    z = ys.reshape(B, H // 2, 2, G // 2, 2, 2, C)
    #                    h'  row∨   g'  j  dx∨
    z = jnp.max(z, axis=(2, 5))          # pool rows + in-group px
    return z.reshape(B, H // 2, G // 2, 2 * C)


def to_s2d(x):
    """[B, H, W, C] -> [B, H, W/2, 2C] (lane-linear reinterpretation)."""
    B, H, Wd, C = x.shape
    return x.reshape(B, H, Wd // 2, 2 * C)


def from_s2d(xs):
    """[B, H, G, 2C] -> [B, H, 2G, C]."""
    B, H, G, L = xs.shape
    return xs.reshape(B, H, 2 * G, L // 2)


def conv3x3_affine_relu_s2d(x, w, scale, bias):
    """relu(conv3x3_same(x, w) * scale + bias) via a space-to-depth-by-2
    reinterpretation: [B,H,W,C] -> [B,H,W/2,2C] is a FREE reshape in NHWC
    (lane index dx*C+ch maps linearly), and the 3x3 conv becomes a dense
    [3,3,2C,2C] conv at half width.

    Why: XLA's conv emitter runs 64-channel full-res convs at ~22% MXU
    (K=N=64 quarter-fills the 128x128 systolic array) but the 128-channel
    s2d form at ~97% — measured 2.1x fwd / 2.3x bwd at the gauss2
    inc.conv1 production shape (8x376x1240x64) DESPITE the 2x padded
    FLOPs from the structural zero blocks (tools/bench_conv_formulations
    + tools/profile_encoder_blocks.py, round 4). Requires even W.
    Value-exact up to bf16 accumulation-order differences.

    CAVEAT (measured, ROADMAP round-4): the isolated win does NOT
    transfer into the full encoder graph — the [*,W,64] <-> [*,W/2,128]
    reinterpretation is a real layout shuffle on TPU (64-lane tensors
    are half-padded), and with convs embedded between pools/neighbors
    the s2d arrangements measure SLOWER end-to-end (encoder fwd+bwd
    43-55 ms vs 34 ms native XLA). Hence this path is opt-in
    (DEEPFEPE_SP_CONV_IMPL=s2d), not the production default.
    """
    B, H, Wd, Cin = x.shape
    C = w.shape[-1]
    assert Wd % 2 == 0, "s2d conv path requires even width"
    xs = x.reshape(B, H, Wd // 2, 2 * Cin)
    ws = _pack_w_s2d(w, x.dtype)
    y = lax.conv_general_dilated(
        xs, ws, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s2 = jnp.tile(scale.astype(jnp.float32), 2)
    t2 = jnp.tile(bias.astype(jnp.float32), 2)
    y = jnp.maximum(y.astype(jnp.float32) * s2 + t2, 0.0)
    return y.astype(x.dtype).reshape(B, H, Wd, C)


def conv3x3_affine_relu_ref(x, w, scale, bias):
    """XLA reference: relu(conv3x3_same(x, w) * scale + bias).

    The conv runs in x.dtype (XLA's TPU conv accumulates f32 internally
    for bf16 operands); the affine+relu run in f32."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(
        y.astype(jnp.float32) * scale.astype(jnp.float32)
        + bias.astype(jnp.float32), 0.0,
    )
    return y.astype(x.dtype)


def conv3x3_affine_relu(x, w, scale, bias, *, need_dx: bool = True,
                        backend: str = "auto"):
    """Fused 3x3 SAME conv + per-channel affine + ReLU.

    x [B,H,W,Cin], w [3,3,Cin,C], scale/bias [C] (f32). Returns
    [B,H,W,C] in x.dtype. backend: 'auto' (pallas on TPU, XLA elsewhere),
    'pallas' (interpret mode off-TPU — tests), 'xla', or 's2d' (the
    space-to-depth-by-2 XLA form — the fast path for 64-channel full-res
    convs, ~2x fwd+bwd; falls back to 'xla' when W is odd).
    need_dx=False skips the input-gradient taps in the backward kernel
    (the image input of the first encoder conv needs no dx).
    """
    if backend == "auto":
        backend = "xla" if _interpret() else "pallas"
    if backend == "s2d":
        if x.shape[2] % 2 == 0:
            if not need_dx:
                x = lax.stop_gradient(x)
            return conv3x3_affine_relu_s2d(x, w, scale, bias)
        backend = "xla"
    if backend == "xla":
        # Honor need_dx here too so both backends have identical gradient
        # semantics (zero dx when the caller declares it unused) — a
        # silent backend-dependent dx was an advisor-flagged hazard.
        if not need_dx:
            x = lax.stop_gradient(x)
        return conv3x3_affine_relu_ref(x, w, scale, bias)
    return _fused(need_dx, x, w, scale, bias)
