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


def _matcher_kernel(d1_ref, d2_ref, m1_ref, m2_ref, nn12_ref, nn21_ref,
                    dist12_ref):
    # d1_ref/d2_ref: [1, K, D]; m1/m2: [1, 1, K] additive validity masks
    # (0 valid / -1e9 invalid); outputs: [1, 1, K] each (the singleton
    # middle axis keeps the block's last-two dims TPU-tileable — a plain
    # [1, K] output block fails Mosaic's divisible-by-8 rule for B > 1).
    d1 = d1_ref[0]  # [K, D]
    d2 = d2_ref[0]
    m1 = m1_ref[0, 0, :]  # [K]
    m2 = m2_ref[0, 0, :]
    # Similarity on the MXU; distance = sqrt(2 - 2 dot) is monotone in -dot,
    # so argmin(distance) == argmax(dot). Invalid keypoints are excluded by
    # an ADDITIVE large-negative mask — exact even when a valid pair's best
    # similarity is negative (descriptor zeroing gave invalid rows
    # similarity 0, which could out-argmax a valid negative-dot match).
    dot = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)  # [K, K]
    dot12 = dot + m2[None, :]  # invalid columns never win argmax over j
    dot21 = dot + m1[:, None]  # invalid rows never win argmax over i
    nn12 = jnp.argmax(dot12, axis=1)
    nn21 = jnp.argmax(dot21, axis=0)
    best12 = jnp.max(dot12, axis=1)
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
    mutual [B,K] bool). Padded (invalid) keypoints are excluded in-kernel
    by an additive -1e9 similarity mask on invalid rows/columns, so the
    match set is exactly the masked-XLA path's for any nn_thresh."""
    B, K, D = desc1.shape
    neg = jnp.float32(-1e9)
    m1 = jnp.where(valid1, 0.0, neg).astype(jnp.float32)[:, None, :]
    m2 = jnp.where(valid2, 0.0, neg).astype(jnp.float32)[:, None, :]

    nn12, nn21, dist12 = pl.pallas_call(
        _matcher_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
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
        # Interpret mode off-TPU: lets CI assert jnp-vs-pallas equivalence
        # at production K (1000-2000) without hardware. Mosaic LOWERING
        # violations still need tools/check_pallas_hw.py on the chip.
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(desc1, desc2, m1, m2)
    nn12, nn21, dist12 = nn12[:, 0], nn21[:, 0], dist12[:, 0]

    i_idx = jnp.arange(K)
    mutual = (
        jnp.take_along_axis(nn21, nn12, axis=-1) == i_idx[None, :]
    ) & valid1 & jnp.take_along_axis(valid2, nn12, axis=-1)
    return nn12, nn21, dist12, mutual
