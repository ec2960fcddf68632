"""The batched differentiable weighted 8-point fundamental-matrix solve.

TPU-native equivalent of `Fit.weighted_svd` (models/DeepFNet.py:181-257), the
heart of the reference system (SURVEY.md §2.3), with the per-item SVD loop
replaced by one fused Gram-eigh batch:

  1. Hartley-normalize pts1/pts2 with uniform weights (the reference's
     weights path is commented out; both are supported here).
  2. Build the [B, N, 9] constraint matrix p.
  3. L2-normalize rows of p (`normalize_SVD=True` default), scale by the
     predicted weights: X = p * w.
  4. f = smallest right singular vector of X via eigh of XᵀX (ops.eigh).
  5. Rank-2 projection F' = F (I - v₃v₃ᵀ) (ops.svd3).
  6. residual = X @ f (fed back into the weight-update MLP).
  7. Denormalize: F_out = T2ᵀ F' T1.

All steps are batched over arbitrary leading dims and fully differentiable
with degenerate-safe gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.epipolar import epipolar_constraint_matrix, hartley_normalize
from .eigh import DEFAULT_GAP_EPS, smallest_singular_vec_gram
from .svd3 import rank2_projection


class FitResult(NamedTuple):
    F: jnp.ndarray          # [..., 3, 3] denormalized rank-2 fundamental matrix
    residual: jnp.ndarray   # [..., N] algebraic residual X @ f
    F_norm: jnp.ndarray     # [..., 3, 3] rank-2 F in normalized coords
    f_vec: jnp.ndarray      # [..., 9] unit null vector (pre rank-2 projection)
    T1: jnp.ndarray         # [..., 3, 3] Hartley transforms
    T2: jnp.ndarray


def weighted_eight_point(
    pts1_h: jnp.ndarray,
    pts2_h: jnp.ndarray,
    weights: jnp.ndarray,
    normalize_svd: bool = True,
    weighted_normalization: bool = False,
    gap_eps: float = DEFAULT_GAP_EPS,
    eps: float = 1e-10,
    sign_canonical: bool = False,
) -> FitResult:
    """Solve for F from homogeneous points [..., N, 3] and weights [..., N].

    The F convention is x2ᵀ F x1 = 0 in the (already e.g. HW-normalized)
    input coordinate frame of pts1/pts2.

    `sign_canonical`: the null vector f is only defined up to sign, and the
    signed residual X@f feeds the weight-update MLP of the recurrence — so
    different eigensolvers give genuinely different (both valid) forward
    trajectories. With this flag the sign is fixed so the largest-|.|
    residual entry is positive, making runs reproducible across backends
    and enabling bit-parity checks against the torch reference (which gets
    the same canonicalization applied outside, tests/test_reference_parity).
    """
    norm_w = weights if weighted_normalization else None
    pts1n, T1 = hartley_normalize(pts1_h, norm_w, eps=eps)
    pts2n, T2 = hartley_normalize(pts2_h, norm_w, eps=eps)

    p = epipolar_constraint_matrix(pts1n, pts2n)  # [..., N, 9]
    if normalize_svd:
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + eps)
    X = p * weights[..., None]

    f = smallest_singular_vec_gram(X, gap_eps)  # [..., 9] unit norm
    F = f.reshape(f.shape[:-1] + (3, 3))
    F2 = rank2_projection(F, gap_eps)

    residual = jnp.einsum("...ni,...i->...n", X, f)
    if sign_canonical:
        import jax

        idx = jnp.argmax(jnp.abs(residual), axis=-1)
        r_max = jnp.take_along_axis(residual, idx[..., None], axis=-1)[..., 0]
        s = jax.lax.stop_gradient(jnp.where(r_max >= 0, 1.0, -1.0))
        s = s.astype(residual.dtype)
        residual = residual * s[..., None]
        f = f * s[..., None]
        F2 = F2 * s[..., None, None]
    F_out = jnp.swapaxes(T2, -1, -2) @ F2 @ T1
    return FitResult(F=F_out, residual=residual, F_norm=F2, f_vec=f, T1=T1, T2=T2)
