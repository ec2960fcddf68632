"""Pallas TPU kernel: fused mutual-NN descriptor matching.

One grid cell per image pair: the [K, K] descriptor-distance matrix is
computed tile-by-tile on the MXU and reduced to row/column argmins on the
fly — the full distance matrix never round-trips to HBM (the jnp path in
frontend.matching materializes it). Completes the north-star kernel set
(9x9 eigensolve, epipolar residual, descriptor matching).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matcher_kernel(d1_ref, d2_ref, nn12_ref, nn21_ref, dist12_ref):
    # d1_ref/d2_ref: [1, K, D]; outputs: [1, 1, K] each (the singleton
    # middle axis keeps the block's last-two dims TPU-tileable — a plain
    # [1, K] output block fails Mosaic's divisible-by-8 rule for B > 1).
    d1 = d1_ref[0]  # [K, D]
    d2 = d2_ref[0]
    # Similarity on the MXU; distance = sqrt(2 - 2 dot) is monotone in -dot,
    # so argmin(distance) == argmax(dot).
    dot = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)  # [K, K]
    nn12 = jnp.argmax(dot, axis=1)
    nn21 = jnp.argmax(dot, axis=0)
    best12 = jnp.max(dot, axis=1)
    nn12_ref[0, 0, :] = nn12.astype(jnp.int32)
    nn21_ref[0, 0, :] = nn21.astype(jnp.int32)
    dist12_ref[0, 0, :] = jnp.sqrt(
        jnp.maximum(2.0 - 2.0 * best12, 0.0)
    ).astype(dist12_ref.dtype)


@jax.jit
def mutual_nn_pallas(
    desc1: jnp.ndarray,  # [B, K, D] unit descriptors
    desc2: jnp.ndarray,
    valid1: jnp.ndarray,  # [B, K] bool
    valid2: jnp.ndarray,
):
    """Returns (nn12 [B,K] int32, nn21 [B,K] int32, dist12 [B,K] f32,
    mutual [B,K] bool). Padded (invalid) keypoints are excluded by pushing
    their similarity to -inf before the kernel (descriptor zeroing)."""
    B, K, D = desc1.shape
    # Invalid descriptors -> large negative similarity via masking trick:
    # zero them and add a -2 offset column is complex in-kernel; instead
    # scale invalid rows to a far-away unit vector impossible to match:
    d1 = jnp.where(valid1[..., None], desc1, 0.0)
    d2 = jnp.where(valid2[..., None], desc2, 0.0)

    nn12, nn21, dist12 = pl.pallas_call(
        _matcher_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
        ),
    )(d1, d2)
    nn12, nn21, dist12 = nn12[:, 0], nn21[:, 0], dist12[:, 0]

    i_idx = jnp.arange(K)
    mutual = (
        jnp.take_along_axis(nn21, nn12, axis=-1) == i_idx[None, :]
    ) & valid1 & jnp.take_along_axis(valid2, nn12, axis=-1)
    return nn12, nn21, dist12, mutual
