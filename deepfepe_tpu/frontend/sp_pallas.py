"""SuperPoint forward on the fused Pallas conv kernels.

A functional re-expression of `frontend.superpoint.SuperPointNet` /
`SuperPointNetGauss2.apply` (inference-mode BN) that routes every
3x3-conv+affine+ReLU through `ops.pallas.conv_pallas.conv3x3_affine_relu`
— one fused pass per conv instead of XLA's conv + BN + relu + layout-copy
schedule, and (under grad) one fused backward pass per conv instead of
the materialized wgrad/BN-reduction pipeline that made the SuperPoint
encoder backward the full-res joint-step wall (ROADMAP round-3 profile:
102 of 135 ms in the `inc`/`down1` blocks).

Numerics: convs accumulate f32 (operands in net.dtype), the affine+relu
run in f32 — at least as precise as the flax modules
(tests/test_conv_pallas.py measures agreement). BatchNorm is folded to
its inference affine (scale/sqrt(var+eps), shifted bias) — an
INFERENCE-ONLY transform: the fused path serves eval forwards and
SP-frozen (stage-1) joint steps, which run BN on running stats. Any
train-mode-BN forward (end-to-end fine-tune, bn_mode='train' — batch
statistics + momentum buffer updates, the reference's semantics) takes
the flax path via run_superpoint(bn_train=True).

Reference: pytorch-superpoint SuperPointNet_gauss2 as consumed by
train_good.py:224-237 / train_good_utils.py:727-756.
"""

from __future__ import annotations

from typing import Dict

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.basic import safe_norm
from ..ops.pallas.conv_pallas import conv3x3_affine_relu
from .superpoint import SuperPointNetGauss2

BN_EPS = 1e-5  # flax.linen.BatchNorm default (superpoint.py uses defaults)

# Conv implementation for the large feature maps. Round-4 measured
# hierarchy on the v5e (tools/bench_conv_formulations.py,
# tools/profile_encoder_blocks.py, ROADMAP round-4 §full-res):
#   'xla' (default): XLA's native conv schedule. The encoder is
#     COMPUTE-bound at ~22-30% MXU (64-channel convs quarter-fill the
#     128x128 systolic array), but every measured alternative loses
#     in-graph:
#   's2d': space-to-depth-by-2 [3,3,128,128] convs hit 97% MXU in
#     ISOLATION (2.1x fwd / 2.3x bwd at the inc.conv1 shape, 2x padded
#     FLOPs included) — but the [*,W,64]<->[*,W/2,128] reinterpretation
#     is a real TPU layout shuffle in-graph, and the full encoder
#     measures SLOWER (fwd+bwd 43-55 ms vs 34 ms XLA) in per-conv,
#     per-block, and pinched-pool arrangements alike. Kept selectable
#     for future XLA layout-assignment improvements.
#   'pallas': the 9-tap Mosaic kernel (11% MXU; Mosaic strided-slice
#     copies dominate and this Mosaic build rejects manual HBM DMA).
CONV_IMPL = os.environ.get("DEEPFEPE_SP_CONV_IMPL", "xla")

# Below this pixel count the restructuring overhead dominates — always XLA.
MIN_PX_PALLAS = 16384


def _pool(y):
    return nn.max_pool(y, (2, 2), strides=(2, 2))


def _backend(x):
    big = x.shape[1] * x.shape[2] >= MIN_PX_PALLAS
    if CONV_IMPL == "pallas" and big:
        return "auto"
    if (CONV_IMPL == "s2d" and big and x.shape[-1] == 64
            and x.shape[2] % 2 == 0):
        return "s2d"
    return "xla"


def _cbr(x, conv_p, s, t, dtype, need_dx=True):
    return conv3x3_affine_relu(
        x, conv_p["kernel"].astype(dtype), s, t,
        need_dx=need_dx, backend=_backend(x),
    )


def _bn_affine(conv_p, bn_p, bn_s):
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    t = (conv_p.get("bias", jnp.zeros_like(s)) - bn_s["mean"]) * s \
        + bn_p["bias"]
    return s.astype(jnp.float32), t.astype(jnp.float32)


def _conv1x1(x, conv_p, dtype):
    return jnp.dot(x.astype(dtype), conv_p["kernel"][0, 0].astype(dtype)) \
        + conv_p["bias"].astype(dtype)


def gauss2_forward_fused(variables: Dict, x: jnp.ndarray,
                         dtype=jnp.bfloat16,
                         remat: str = "none") -> Dict[str, jnp.ndarray]:
    """SuperPointNetGauss2.apply(variables, x) with fused convs.

    x: [B, H, W, 1]; returns {'semi' f32, 'desc' f32-normalized} —
    same contract as the flax module in inference mode.

    remat: 'none' | 'block' — 'block' wraps each encoder double-conv in
    jax.checkpoint so its intermediate full-res activations are
    recomputed in the backward instead of saved to HBM (the full-res
    encoder backward is HBM-bandwidth-bound; see ROADMAP round-3/4)."""
    p, bs = variables["params"], variables["batch_stats"]

    def dc(block, x, first_need_dx=True):
        def body(bp, bsb, x):
            for i in (0, 1):
                s, t = _bn_affine(bp[f"conv{i}"], bp[f"bn{i}"],
                                  bsb[f"bn{i}"])
                x = _cbr(x, bp[f"conv{i}"], s, t, dtype,
                         need_dx=(first_need_dx or i == 1))
            return x

        if remat == "block":
            body = jax.checkpoint(body)
        return body(p[block], bs[block], x)

    x = x.astype(dtype)
    y = dc("inc", x, first_need_dx=False)
    y = dc("down1", _pool(y))
    y = dc("down2", _pool(y))
    y = dc("down3", _pool(y))

    sPa, tPa = _bn_affine(p["convPa"], p["bnPa"], bs["bnPa"])
    d = _cbr(y, p["convPa"], sPa, tPa, dtype)
    sPb, tPb = _bn_affine(p["convPb"], p["bnPb"], bs["bnPb"])
    zP = jnp.dot(d.astype(dtype), p["convPb"]["kernel"][0, 0].astype(dtype))
    semi = (zP.astype(jnp.float32) * sPb + tPb).astype(jnp.float32)

    sDa, tDa = _bn_affine(p["convDa"], p["bnDa"], bs["bnDa"])
    e = _cbr(y, p["convDa"], sDa, tDa, dtype)
    sDb, tDb = _bn_affine(p["convDb"], p["bnDb"], bs["bnDb"])
    zD = jnp.dot(e.astype(dtype), p["convDb"]["kernel"][0, 0].astype(dtype))
    desc = (zD.astype(jnp.float32) * sDb + tDb).astype(jnp.float32)
    desc = desc / (safe_norm(desc, axis=-1, keepdims=True) + 1e-10)
    return {"semi": semi, "desc": desc}


def plain_forward_fused(variables: Dict, x: jnp.ndarray,
                        dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """SuperPointNet.apply(variables, x) with fused convs (no BN:
    scale=1, bias=conv bias)."""
    p = variables["params"]

    def cr(name, x, need_dx=True):
        cp = p[name]
        C = cp["kernel"].shape[-1]
        one = jnp.ones((C,), jnp.float32)
        return _cbr(x, cp, one, cp["bias"].astype(jnp.float32), dtype,
                    need_dx=need_dx)

    x = x.astype(dtype)
    y = cr("conv1a", x, need_dx=False)
    y = cr("conv1b", y)
    y = cr("conv2a", _pool(y))
    y = cr("conv2b", y)
    y = cr("conv3a", _pool(y))
    y = cr("conv3b", y)
    y = cr("conv4a", _pool(y))
    y = cr("conv4b", y)

    d = cr("convPa", y)
    semi = _conv1x1(d, p["convPb"], dtype).astype(jnp.float32)
    e = cr("convDa", y)
    desc = _conv1x1(e, p["convDb"], dtype).astype(jnp.float32)
    desc = desc / (safe_norm(desc, axis=-1, keepdims=True) + 1e-10)
    return {"semi": semi, "desc": desc}


def superpoint_forward_fused(net, variables, x,
                             remat: str = "none") -> Dict[str, jnp.ndarray]:
    """Dispatch on the net class; dtype follows the module's compute
    dtype (bf16 on the production path)."""
    if isinstance(net, SuperPointNetGauss2):
        if remat == "full":
            return jax.checkpoint(
                lambda v, im: gauss2_forward_fused(v, im, dtype=net.dtype)
            )(variables, x)
        return gauss2_forward_fused(variables, x, dtype=net.dtype,
                                    remat=remat)
    return plain_forward_fused(variables, x, dtype=net.dtype)
