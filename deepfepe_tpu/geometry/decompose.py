"""Essential-matrix decomposition, triangulation, cheirality, pose recovery.

TPU-native, fully batched replacement for the reference's per-item
E → (R, t) machinery:

- `decompose_E`       ↔ utils_F._get_M2s :478 / _get_M2s_batch :500
                        (torch.svd / CUDA batch_svd per item)
- `two_view_depths`   ↔ cv2.triangulatePoints round trips in
                        utils_F._E_to_M :521 and DeepFNet.get_depth :406
- `recover_pose`      ↔ cv2.recoverPose + cheirality voting
                        (utils_F._E_to_M_train :679, goodCorr_eval_nondecompose
                        :909) — OpenCV's depth-mask logic re-derived in closed
                        form so it runs batched on device and differentiably.

The SVD of E is computed without a general SVD: V comes from eigh(EᵀE)
(safe gradients, ops.eigh); U's first two columns are E vᵢ / ‖E vᵢ‖ (well
conditioned because s1 ≈ s2 > 0 for near-essential matrices) and u₃ = u₁×u₂,
so t = ±u₃ is the exact left null vector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.eigh import DEFAULT_GAP_EPS, safe_eigh, smallest_eigvec
from .basic import homo, safe_norm, skew


class EDecomposition(NamedTuple):
    R1: jnp.ndarray  # [..., 3, 3]  U W Vᵀ
    R2: jnp.ndarray  # [..., 3, 3]  U Wᵀ Vᵀ
    t: jnp.ndarray   # [..., 3]     unit left null vector (±t are the options)


_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def decompose_E(E: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS, eps: float = 1e-12):
    """Four-candidate decomposition of [..., 3, 3] essential matrices.

    Returns (R1, R2, t); the four poses are {R1, R2} × {t, -t}, matching the
    reference `_get_M2s` (utils_F.py:478-499) including its W-sign flip that
    guarantees det(R) = +1.
    """
    G = jnp.swapaxes(E, -1, -2) @ E
    w, V_asc = safe_eigh(G, gap_eps)  # ascending eigenvalues
    # Descending singular order: columns (largest, middle, smallest).
    V = V_asc[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))  # descending

    Ev1 = (E @ V[..., :, 0:1])[..., 0]
    Ev2 = (E @ V[..., :, 1:2])[..., 0]
    # safe_norm: for a degenerate (e.g. zero) E these are exactly-zero
    # vectors, and jnp.linalg.norm's VJP at 0 would poison the gradient.
    u1 = Ev1 / (safe_norm(Ev1, axis=-1, keepdims=True) + eps)
    u2 = Ev2 / (safe_norm(Ev2, axis=-1, keepdims=True) + eps)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)  # columns

    W = _W.astype(E.dtype)
    Vt = jnp.swapaxes(V, -1, -2)
    R_a = U @ W @ Vt
    # det(U W Vᵀ) = det(U) det(V) (det W = 1); flip W where negative.
    det = jnp.linalg.det(R_a)
    sign = jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    Wc = W * sign  # W := -W when det < 0, as in the reference
    R1 = U @ Wc @ Vt
    R2 = U @ jnp.swapaxes(Wc, -1, -2) @ Vt
    t = u3 / (safe_norm(u3, axis=-1, keepdims=True) + eps)
    return EDecomposition(R1=R1, R2=R2, t=t)


def _cofactor_3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Cofactor matrix of [..., 3, 3]: rows are cross products of M's rows."""
    m1, m2, m3 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    return jnp.stack(
        [jnp.cross(m2, m3), jnp.cross(m3, m1), jnp.cross(m1, m2)], axis=-2
    )


def decompose_E_closed_form(
    E: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS, eps: float = 1e-12
) -> EDecomposition:
    """Horn-style closed-form decomposition — safe gradients at the
    essential-matrix degeneracy.

    A valid E has singular values (s, s, 0): the top-2 eigenpair of EᵀE is
    degenerate BY CONSTRUCTION, so any eigh/SVD-based decomposition has
    ill-defined gradients exactly on the training manifold (the reason the
    qt loss needs this path). Here only the well-separated null direction is
    solved spectrally:

      Ê  = √2 · E/‖E‖_F              (unit-baseline normalization)
      t  = unit left null vector of Ê (smallest eigvec of ÊÊᵀ — gap ≈ s²)
      R₁ = cof(Ê) − [t]×Ê = U W Vᵀ,   R₂ = cof(Ê) + [t]×Ê = U Wᵀ Vᵀ

    (identity verified exactly for valid E; approximately orthogonal and
    smooth for noisy E). Candidates are {R₁, R₂} × {t, −t}, matching
    `decompose_E` / the reference `_get_M2s`.
    """
    fro = jnp.sqrt(jnp.sum(E * E, axis=(-1, -2), keepdims=True) + eps)
    En = E * (jnp.sqrt(jnp.asarray(2.0, E.dtype)) / fro)
    G = En @ jnp.swapaxes(En, -1, -2)
    _, t = smallest_eigvec(G, gap_eps)  # [..., 3] unit left null vector
    C = _cofactor_3x3(En)
    tE = skew(t) @ En
    return EDecomposition(R1=C - tE, R2=C + tE, t=t)


def two_view_depths(
    R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    eps: float = 1e-12,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form two-view depths for normalized image points.

    Solves z2·x̂2 = z1·R x̂1 + t by cross-product elimination:
      z1 = -⟨x̂2×t, x̂2×R x̂1⟩ / ‖x̂2×R x̂1‖²,
      z2 =  ⟨R x̂1×t, R x̂1×x̂2⟩ / ‖R x̂1×x̂2‖².

    x1, x2: [..., N, 3] homogeneous normalized (K⁻¹-premultiplied) points;
    R: [..., 3, 3]; t: [..., 3]. Returns (z1, z2) each [..., N].
    Replaces cv2.triangulatePoints for cheirality and the tri-depth feature.
    """
    Rx1 = x1 @ jnp.swapaxes(R, -1, -2)  # [..., N, 3]
    t_b = jnp.broadcast_to(t[..., None, :], Rx1.shape)
    c_a = jnp.cross(x2, Rx1)
    z1 = -jnp.sum(jnp.cross(x2, t_b) * c_a, axis=-1) / (
        jnp.sum(c_a * c_a, axis=-1) + eps
    )
    c_b = jnp.cross(Rx1, x2)
    z2 = jnp.sum(jnp.cross(Rx1, t_b) * c_b, axis=-1) / (
        jnp.sum(c_b * c_b, axis=-1) + eps
    )
    return z1, z2


class RecoveredPose(NamedTuple):
    R: jnp.ndarray        # [..., 3, 3]
    t: jnp.ndarray        # [..., 3] unit
    inlier_frac: jnp.ndarray  # [...] fraction of points passing cheirality
    mask: jnp.ndarray     # [..., N] bool cheirality mask of the winner


def recover_pose(
    E: jnp.ndarray,
    x1_norm: jnp.ndarray,
    x2_norm: jnp.ndarray,
    point_weights: jnp.ndarray | None = None,
    depth_thresh: float = 50.0,
    gap_eps: float = DEFAULT_GAP_EPS,
) -> RecoveredPose:
    """Batched cv2.recoverPose: pick the (R, t) candidate by cheirality voting.

    x1_norm/x2_norm are [..., N, 2] or [..., N, 3] normalized image points.
    Follows OpenCV's five-point.cpp mask logic (depth in (0, thresh) in both
    cameras), as mirrored by utils_F._E_to_M :521-678.
    """
    if x1_norm.shape[-1] == 2:
        x1_norm, x2_norm = homo(x1_norm), homo(x2_norm)
    dec = decompose_E(E, gap_eps)
    Rs = jnp.stack([dec.R1, dec.R1, dec.R2, dec.R2], axis=-3)  # [..., 4, 3, 3]
    ts = jnp.stack([dec.t, -dec.t, dec.t, -dec.t], axis=-2)    # [..., 4, 3]

    x1b = x1_norm[..., None, :, :]  # [..., 1, N, 3] broadcast over candidates
    x2b = x2_norm[..., None, :, :]
    z1, z2 = two_view_depths(Rs, ts, x1b, x2b)  # [..., 4, N]
    good = (z1 > 0) & (z1 < depth_thresh) & (z2 > 0) & (z2 < depth_thresh)
    if point_weights is not None:
        votes = jnp.sum(good * point_weights[..., None, :], axis=-1)
    else:
        votes = jnp.sum(good, axis=-1)

    best = jnp.argmax(votes, axis=-1)  # [...]
    R = jnp.take_along_axis(Rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(ts, best[..., None, None], axis=-2)[..., 0, :]
    mask = jnp.take_along_axis(good, best[..., None, None], axis=-2)[..., 0, :]
    n = x1_norm.shape[-2]
    return RecoveredPose(R=R, t=t, inlier_frac=jnp.max(votes, axis=-1) / n, mask=mask)
