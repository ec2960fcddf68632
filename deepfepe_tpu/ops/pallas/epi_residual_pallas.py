"""Pallas TPU kernel: fused robust epipolar residual.

The per-point residual of `geometry.compute_epi_residual` — for each
correspondence, d = |x2ᵀFx1|·(1/‖(Fx1)xy‖ + 1/‖(Fᵀx2)xy‖) clamped — fused
into one VMEM pass per batch item. Layout is struct-of-arrays [8, N]
(coordinate rows on sublanes, points on lanes — tile-aligned), with the nine
F entries read as scalars; every point is pure VPU arithmetic and nothing
intermediate touches HBM. Completes the north-star kernel set; XLA's fusion
of the jnp version is already competitive, so this is the explicit,
schedulable form for composition into larger pallas pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epi_kernel(pts_ref, f_ref, out_ref, *, clamp_at: float, eps: float):
    # pts_ref: [1, 8, N] rows (x1, y1, z1, x2, y2, z2, 0, 0);
    # f_ref: [1, 1, 16] in SMEM; out_ref: [1, 8, N] (row 0 = result).
    x1 = pts_ref[0, 0, :]
    y1 = pts_ref[0, 1, :]
    z1 = pts_ref[0, 2, :]
    x2 = pts_ref[0, 3, :]
    y2 = pts_ref[0, 4, :]
    z2 = pts_ref[0, 5, :]
    f = [f_ref[0, 0, i] for i in range(9)]

    # l1 = F x1 (line in image 2); l2 = Fᵀ x2 (line in image 1).
    l1x = f[0] * x1 + f[1] * y1 + f[2] * z1
    l1y = f[3] * x1 + f[4] * y1 + f[5] * z1
    l1z = f[6] * x1 + f[7] * y1 + f[8] * z1
    l2x = f[0] * x2 + f[3] * y2 + f[6] * z2
    l2y = f[1] * x2 + f[4] * y2 + f[7] * z2

    s = x2 * l1x + y2 * l1y + z2 * l1z
    n1 = jnp.sqrt(l1x * l1x + l1y * l1y)
    n2 = jnp.sqrt(l2x * l2x + l2y * l2y)
    d = jnp.abs(s) * (1.0 / (n1 + eps) + 1.0 / (n2 + eps))
    out_ref[0, 0, :] = jnp.minimum(d, clamp_at)


@functools.partial(jax.jit, static_argnums=(3, 4))
def epi_residual_pallas(
    pts1_h: jnp.ndarray,  # [B, N, 3]
    pts2_h: jnp.ndarray,
    F: jnp.ndarray,       # [B, 3, 3]
    clamp_at: float = 0.5,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """compute_epi_residual as a Pallas kernel. Returns [B, N]."""
    B, N, _ = pts1_h.shape
    # Struct-of-arrays: [B, 8, N] (pad rows 6-7 for sublane alignment).
    rows = jnp.concatenate(
        [
            jnp.swapaxes(pts1_h, -1, -2),           # rows 0-2
            jnp.swapaxes(pts2_h, -1, -2),           # rows 3-5
            jnp.zeros((B, 2, N), pts1_h.dtype),     # pad
        ],
        axis=-2,
    )
    f_flat = jnp.pad(F.reshape(B, 9), ((0, 0), (0, 7)))[:, None, :]  # [B,1,16]

    out = pl.pallas_call(
        functools.partial(_epi_kernel, clamp_at=clamp_at, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 16), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, N), pts1_h.dtype),
    )(rows, f_flat)
    return out[:, 0, :]
