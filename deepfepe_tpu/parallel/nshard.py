"""Correspondence-parallel weighted 8-point fit (the N-axis sharding).

The reference has no sequence/context parallelism (SURVEY.md §5.7 — it is
strictly two-frame); the analogous long-context axis in this domain is the
N-correspondence axis of the solver. Every cross-point reduction in
`ops.fmatrix.weighted_eight_point` is a sum over N:

  - Hartley normalization needs Σw, Σw·x, Σw·dist  (geometry/epipolar.py)
  - the null-space solve needs the 9×9 Gram  G = Σₙ (wₙpₙ)(wₙpₙ)ᵀ
  - row L2-normalization and the algebraic residual are per-point (local)

so sharding N over a mesh axis turns the whole fit into three tiny `psum`s
(4 + 9 + 1 scalars per batch item of Hartley sums, then one 9×9 Gram) that
XLA rides over ICI — the "per-block psum, ring-reducible" design note of
SURVEY.md §5.7. The per-shard work (constraint rows, MXU Gram contraction)
scales 1/n_shards; the eigh of the psum'd 9×9 Gram is replicated and
negligible. Use when N is large (dense matching, BA refits with 10⁵⁺
correspondences) — at the training N=1000 the collective latency dominates.

Fully differentiable: `shard_map` transposes the `psum`s automatically, so
the fit can sit inside the training step with pts/weights sharded on N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..geometry.epipolar import epipolar_constraint_matrix
from ..ops.eigh import DEFAULT_GAP_EPS, smallest_eigvec
from ..ops.svd3 import rank2_projection
from .mesh import MODEL_AXIS


def _hartley_T_from_sums(sw, swx, scale_from_dist, dtype):
    """Build the [..., 3, 3] Hartley transform from globally-reduced sums."""
    z = jnp.zeros_like(scale_from_dist)
    one = jnp.ones_like(scale_from_dist)
    c = swx / sw[..., None]
    s = scale_from_dist
    return jnp.stack(
        [
            jnp.stack([s, z, -c[..., 0] * s], axis=-1),
            jnp.stack([z, s, -c[..., 1] * s], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    ).astype(dtype)


def make_nsharded_fit(
    mesh,
    axis: str = MODEL_AXIS,
    normalize_svd: bool = True,
    gap_eps: float = DEFAULT_GAP_EPS,
    eps: float = 1e-10,
):
    """Build fit(pts1_h, pts2_h, weights) with the N axis sharded on `axis`.

    Inputs: pts1_h/pts2_h [B, N, 3] homogeneous, weights [B, N]; N must be
    divisible by the mesh axis size. Returns (F [B, 3, 3] replicated,
    residual [B, N] N-sharded) — numerically matching
    `weighted_eight_point(...)[:2]` with uniform-weight normalization.
    """

    def _psum(x):
        return jax.lax.psum(x, axis)

    def _normalize_shard(pts_h):
        """Global Hartley transform from per-shard sums (uniform weights,
        matching the reference default — Fit.normalize DeepFNet.py:148)."""
        n_local = pts_h.shape[-2]
        sw = _psum(jnp.full(pts_h.shape[:-2], float(n_local), pts_h.dtype))
        swx = _psum(jnp.sum(pts_h, axis=-2))
        c = swx / sw[..., None]
        centered = pts_h - c[..., None, :]
        d2 = jnp.sum(centered[..., :2] ** 2, axis=-1)
        dist = jnp.where(d2 > 0, jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
        meandist = _psum(jnp.sum(dist, axis=-1)) / sw
        scale = jnp.sqrt(jnp.asarray(2.0, pts_h.dtype)) / jnp.maximum(
            meandist, jnp.asarray(1e-6, pts_h.dtype)
        )
        T = _hartley_T_from_sums(sw, swx, scale, pts_h.dtype)
        pts_n = jnp.einsum("...ij,...nj->...ni", T, pts_h)
        return pts_n, T

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None), P(None, axis)),
        out_specs=(P(), P(None, axis)),
    )
    def fit(pts1_h, pts2_h, weights):
        pts1n, T1 = _normalize_shard(pts1_h)
        pts2n, T2 = _normalize_shard(pts2_h)

        p = epipolar_constraint_matrix(pts1n, pts2n)  # [B, N/n, 9] local
        if normalize_svd:
            p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + eps)
        X = p * weights[..., None]

        acc = jnp.promote_types(X.dtype, jnp.float32)
        G = _psum(
            jnp.einsum("...ni,...nj->...ij", X, X, preferred_element_type=acc)
        ).astype(X.dtype)
        _, f = smallest_eigvec(G, gap_eps)
        F = f.reshape(f.shape[:-1] + (3, 3))
        F2 = rank2_projection(F, gap_eps)

        residual = jnp.einsum("...ni,...i->...n", X, f)
        F_out = jnp.swapaxes(T2, -1, -2) @ F2 @ T1
        return F_out, residual

    return fit
