"""Homography estimation: batched normalized DLT (+ weighted variant).

Parity with `utils_F._H_from_XY` :769 (homography DLT) and the H-loss
surface (`dsac_tools/H_loss.py` — Sampson-distance loss callable; here the
same quantity comes from `epipolar.sampson_dist` composed with an H
transfer error). Fully batched: the 2N x 9 DLT system is solved with the
same Gram-eigh machinery as the 8-point solve.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.eigh import DEFAULT_GAP_EPS, smallest_singular_vec_gram
from .basic import homo
from .epipolar import hartley_normalize


def homography_from_points(
    x1: jnp.ndarray,  # [..., N, 2]
    x2: jnp.ndarray,  # [..., N, 2]
    weights: jnp.ndarray | None = None,  # [..., N]
    gap_eps: float = DEFAULT_GAP_EPS,
) -> jnp.ndarray:
    """Least-squares H with x2 ~ H x1, via normalized DLT. Returns [..., 3, 3]
    scaled so H[2,2] = 1."""
    p1, T1 = hartley_normalize(homo(x1))
    p2, T2 = hartley_normalize(homo(x2))
    u, v = p1[..., 0], p1[..., 1]
    x, y = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    # Two rows per correspondence: [-u -v -1 0 0 0 xu xv x], [0 0 0 -u -v -1 yu yv y]
    r1 = jnp.stack(
        [-u, -v, -one, zero, zero, zero, x * u, x * v, x], axis=-1
    )
    r2 = jnp.stack(
        [zero, zero, zero, -u, -v, -one, y * u, y * v, y], axis=-1
    )
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2N, 9]
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)[..., None]
        A = A * w2
    h = smallest_singular_vec_gram(A, gap_eps)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / H[..., 2:3, 2:3]


def homography_transfer_error(
    H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """Symmetric transfer error ||H x1 - x2|| + ||H⁻¹ x2 - x1|| per point."""
    def transfer(M, a):
        ah = homo(a) @ jnp.swapaxes(M, -1, -2)
        return ah[..., :2] / (ah[..., 2:3] + eps)

    d1 = jnp.linalg.norm(transfer(H, x1) - x2, axis=-1)
    d2 = jnp.linalg.norm(transfer(jnp.linalg.inv(H), x2) - x1, axis=-1)
    return d1 + d2
