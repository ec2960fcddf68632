"""3x3 spectral ops built on the safe eigensolver: rank-2 / (1,1,0) projections.

Replaces the reference's per-item second `torch.svd` in `Fit.weighted_svd`
(models/DeepFNet.py:226-237: zero the last singular value of F) and the
(1,1,0) essential-matrix projection in `_F_to_E` (dsac_tools/utils_F.py:455).

Both are formulated without ever forming U, so there is no division by small
singular values on the training path:

  rank-2:  F' = U diag(s1, s2, 0) Vᵀ = F (I - v₃ v₃ᵀ),
           v₃ = eigenvector of the smallest eigenvalue of FᵀF.
"""

from __future__ import annotations

import jax.numpy as jnp

from .eigh import DEFAULT_GAP_EPS, safe_eigh, smallest_eigvec


def rank2_projection(F: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS) -> jnp.ndarray:
    """Project [..., 3, 3] matrices to rank 2 by zeroing the smallest s.v."""
    G = jnp.swapaxes(F, -1, -2) @ F
    _, v3 = smallest_eigvec(G, gap_eps)  # [..., 3]
    return F - (F @ v3[..., :, None]) @ v3[..., None, :]


def project_E_110(E: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS, eps: float = 1e-12):
    """Project [..., 3, 3] to singular values (1, 1, 0): E' = U diag(1,1,0) Vᵀ.

    Uses E' = E V diag(1/s1, 1/s2, 0) Vᵀ with (s², V) = eigh(EᵀE); for a
    near-essential matrix s1 ≈ s2 > 0 so the divisions are well conditioned.
    Ref: utils_F._F_to_E :455 (applied there right after E = KᵀFK).
    """
    G = jnp.swapaxes(E, -1, -2) @ E
    w, V = safe_eigh(G, gap_eps)  # ascending: w[...,0] smallest
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    inv_s = jnp.where(s > eps, 1.0 / jnp.maximum(s, eps), 0.0)
    # Keep only the two largest singular directions (indices 1, 2 ascending).
    scale = inv_s.at[..., 0].set(0.0)
    M = (V * scale[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    return E @ M


def singular_values_3x3(F: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS):
    """Descending singular values of [..., 3, 3] via eigh(FᵀF)."""
    G = jnp.swapaxes(F, -1, -2) @ F
    w, _ = safe_eigh(G, gap_eps)
    return jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
