"""PointNet-style per-correspondence weight networks (flax).

Capability parity with the reference `models/ErrorEstimators.py`:
- `ErrorEstimator`            :14  — 1x1 Conv1d MLP in→64→128→1024→512→256→out
                                     with InstanceNorm(affine)+LeakyReLU
                                     (optional BatchNorm variant)
- `ErrorEstimatorFeatFusion`  :118 — points+descriptor early-fusion variant
- `ErrorEstimatorFeatFusion2Head` :171 — two-stem late-fusion variant
- `models/GoodCorresNet.py`   :35  — legacy global-context PointNet arch

Layout is TPU-native [B, N, C] (points on sublanes, channels on lanes): a 1x1
Conv1d over points is exactly a Dense over the channel axis, which XLA maps
straight onto the MXU as an [B*N, C_in] x [C_in, C_out] matmul.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class InstanceNorm1d(nn.Module):
    """torch nn.InstanceNorm1d(C, affine=True) on [B, N, C] tensors.

    Normalizes over the point axis N per (batch, channel) with biased
    variance and eps=1e-5 (torch defaults).
    """

    features: int
    affine: bool = True
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-2, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            gamma = self.param(
                "scale", nn.initializers.ones, (self.features,), self.param_dtype
            )
            beta = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y * gamma + beta
        return y


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel, bias) without computing —
    used by the fused-Pallas path to keep the param tree identical to the
    standard nn.Dense path (same names, shapes, initializers)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        W = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        b = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return W, b


class _NormParams(nn.Module):
    """Declares InstanceNorm1d affine params (scale, bias) without computing."""

    features: int

    @nn.compact
    def __call__(self):
        gamma = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        beta = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return gamma, beta


class ErrorEstimator(nn.Module):
    """The weight MLP (ref: ErrorEstimators.py:14-69).

    [B, N, C_in] -> [B, N, output_size] logits.

    `dtype` sets the matmul compute precision (bfloat16 runs the MXU at its
    full rate; parameters stay float32 and InstanceNorm statistics are
    computed in float32 regardless). Output logits are returned in float32.

    `use_pallas` routes the whole stack through the fused Pallas kernel
    (ops/pallas/mlp_pallas.py): one kernel keeps every activation in VMEM
    and rematerializes in the backward, ~2x the XLA step time at bench
    shapes. Requires bfloat16 dtype, no BatchNorm, and C_in/output_size
    <= 128; falls back to the standard path otherwise. The param tree is
    identical in both modes (hidden Dense biases are inert under
    InstanceNorm — zero gradient either way).
    """

    output_size: int = 1
    features: Sequence[int] = (64, 128, 1024, 512, 256)
    if_bn: bool = False
    negative_slope: float = 0.01  # torch LeakyReLU default
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (
            self.use_pallas
            and not self.if_bn
            and self.dtype == jnp.bfloat16
            and x.shape[-1] <= 128
            and self.output_size <= 128
        ):
            from ..ops.pallas.mlp_pallas import fused_pointnet_mlp

            Ws, gammas, betas = [], [], []
            c_in = x.shape[-1]
            for i, f in enumerate(self.features):
                W, _ = _DenseParams(c_in, f, name=f"Dense_{i}")()
                gamma, beta = _NormParams(f, name=f"InstanceNorm1d_{i}")()
                Ws.append(W)
                gammas.append(gamma)
                betas.append(beta)
                c_in = f
            n = len(self.features)
            Wf, bf = _DenseParams(c_in, self.output_size, name=f"Dense_{n}")()
            out = fused_pointnet_mlp(
                x.astype(jnp.float32), Ws, gammas, betas, (Wf, bf),
                self.negative_slope,
            )
            return out[..., : self.output_size]

        # Normalization statistics and output logits in (at least) f32 for
        # stability; f64 passes through untouched (used by the
        # reference-parity tests, tests/test_reference_parity.py).
        acc = jnp.promote_types(self.dtype, jnp.float32)
        x = x.astype(self.dtype)
        for f in self.features:
            x = nn.Dense(f, use_bias=True, dtype=self.dtype)(x)
            if self.if_bn:
                x = nn.BatchNorm(use_running_average=not train, axis=-1)(x)
            x = InstanceNorm1d(f)(x.astype(acc)).astype(self.dtype)
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        # Final projection: bias matches the reference (bias=False only in the
        # BatchNorm variant, ErrorEstimators.py:46 vs :66).
        x = nn.Dense(self.output_size, use_bias=not self.if_bn, dtype=self.dtype)(x)
        return x.astype(acc)


class ErrorEstimatorFeatFusion(nn.Module):
    """Early points+descriptor fusion variant (ref: ErrorEstimators.py:118)."""

    output_size: int = 1
    features: Sequence[int] = (64, 128, 1024, 512, 256)

    @nn.compact
    def __call__(self, pts_in: jnp.ndarray, des_in: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([pts_in, des_in], axis=-1)
        for f in self.features:
            x = nn.Dense(f, use_bias=True)(x)
            x = InstanceNorm1d(f)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_size, use_bias=True)(x)


class ErrorEstimatorFeatFusion2Head(nn.Module):
    """Two-stem late-fusion variant (ref: ErrorEstimators.py:171-236)."""

    output_size: int = 1

    @nn.compact
    def __call__(self, pts_in: jnp.ndarray, des_in: jnp.ndarray) -> jnp.ndarray:
        x = pts_in
        for f in (64, 128, 1024):
            x = nn.Dense(f, use_bias=True)(x)
            x = InstanceNorm1d(f)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        y = des_in
        for f in (64, 128, 1024):
            y = nn.Dense(f, use_bias=True)(y)
            y = nn.leaky_relu(y, negative_slope=0.01)
        z = jnp.concatenate([x, y], axis=-1)
        z = nn.Dense(512, use_bias=True)(z)
        z = InstanceNorm1d(512)(z)
        z = nn.leaky_relu(z, negative_slope=0.01)
        z = nn.Dense(256, use_bias=True)(z)
        z = InstanceNorm1d(256)(z)
        z = nn.leaky_relu(z, negative_slope=0.01)
        return nn.Dense(self.output_size, use_bias=True)(z)


class GoodCorresNet(nn.Module):
    """Legacy 'learning to find good correspondences' arch — the PointNet
    part-segmentation network (ref: models/GoodCorresNet.py:35-163, itself
    dead code upstream: its Stem/SharedMLP come from the external 'shaper'
    package whose import is disabled, so only the architecture spec
    survives). Faithful structure: stem (64, 128, 128) -> local MLP
    (512, 2048) -> global max-pool -> per-point concat of ALL intermediate
    features [stem... local... global] (:168: 64+128+128+512+2048+2048)
    -> seg head (256, 256) -> conv_seg 128 -> logits. Conv1d(+IN)+ReLU
    blocks throughout (shaper defaults); dropout is inert at our use site
    (inference-style eval of a deprecated ablation arch).
    """

    output_size: int = 1
    stem_channels: tuple = (64, 128, 128)
    local_channels: tuple = (512, 2048)
    seg_channels: tuple = (256, 256, 128)
    bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def block(y, f, name):
            y = nn.Dense(f, use_bias=True, name=f"{name}_conv")(y)
            y = InstanceNorm1d(f, name=f"{name}_in")(y)
            return nn.relu(y)

        skips = []
        for i, f in enumerate(self.stem_channels):
            x = block(x, f, f"stem{i}")
            skips.append(x)
        for i, f in enumerate(self.local_channels):
            x = block(x, f, f"local{i}")
            skips.append(x)
        g = jnp.max(x, axis=-2, keepdims=True)  # global feature
        x = jnp.concatenate(
            skips + [jnp.broadcast_to(g, x.shape)], axis=-1
        )
        for i, f in enumerate(self.seg_channels):
            x = block(x, f, f"seg{i}")
        return nn.Dense(self.output_size, use_bias=True, name="logits")(x)
