"""Epipolar geometry core (pure JAX, batched, differentiable).

Capability parity with the reference `dsac_tools/utils_F.py` tensor math:
Hartley normalization (`_normalize_XY`/`Fit.normalize`), the 9-column
epipolar constraint matrix (`Fit.weighted_svd` step 2, models/DeepFNet.py:203),
epipolar distances (`_sampson_dist` :291, `_sym_epi_dist` :310,
`_epi_distance` :341, `compute_epi_residual` :400), F/E conversions
(`_F_to_E` :455, `_E_to_F` :464), and gt E/F construction
(`_E_F_from_Rt` :820 / `E_F_from_Rt_np` :835).

Everything accepts arbitrary leading batch dims. The F-matrix convention is
`x2ᵀ F x1 = 0` for a correspondence (x1 in image 1, x2 in image 2), matching
the reference (its `compute_epi_residual` evaluates pts1·(pts2 F) = p2ᵀ F p1).
"""

from __future__ import annotations

import jax.numpy as jnp

from .basic import homo, safe_norm, skew


# ---------------------------------------------------------------------------
# Normalization transforms
# ---------------------------------------------------------------------------


def norm_hw_matrix(image_size, dtype=jnp.float32) -> jnp.ndarray:
    """The [-1, 1] image-coordinate normalizer T of `NormalizeAndExpand_HW`.

    Ref: models/DeepFNet.py:93-121 — T = [[2/W, 0, -1], [0, 2/H, -1], [0,0,1]].
    `image_size` is (H, W).
    """
    H, W = float(image_size[0]), float(image_size[1])
    return jnp.array(
        [[2.0 / W, 0.0, -1.0], [0.0, 2.0 / H, -1.0], [0.0, 0.0, 1.0]], dtype=dtype
    )


def normalize_hw(pts: jnp.ndarray, image_size) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map pixel points [..., N, 2] into [-1, 1]^2 homogeneous [..., N, 3].

    Returns (pts_h_normalized, T) with T broadcast to the batch shape.
    """
    T = norm_hw_matrix(image_size, dtype=pts.dtype)
    pts_h = homo(pts)
    out = pts_h @ T.T  # row-vector form of T @ x
    T_b = jnp.broadcast_to(T, pts.shape[:-2] + (3, 3))
    return out, T_b


def hartley_normalize(
    pts_h: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    eps: float = 1e-10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Hartley normalization of homogeneous points [..., N, 3].

    Center to the (weighted) centroid and scale so the (weighted) mean distance
    is sqrt(2). Ref: `Fit.normalize` (models/DeepFNet.py:148-179) — the
    reference always calls it with uniform weights (ones), but the weighted
    path is kept as a capability.

    Returns (pts_h_normalized [..., N, 3], T [..., 3, 3]) with
    pts_out = (T @ pts_hᵀ)ᵀ.
    """
    if weights is None:
        weights = jnp.ones(pts_h.shape[:-1], dtype=pts_h.dtype)
    w = weights[..., None]  # [..., N, 1]
    denom = jnp.sum(w, axis=-2) + eps  # [..., 1]
    c = jnp.sum(pts_h * w, axis=-2) / denom  # [..., 3]
    centered = pts_h - c[..., None, :]
    # Safe norm: sqrt has an infinite derivative at 0, and exactly-coincident
    # points DO occur (sampled minimal subsets under a concentrated weight
    # softmax collapse to copies of one correspondence — the sample-loss NaN
    # at ablation iter ~400). Zero gradient at the degenerate point.
    d2 = jnp.sum(centered[..., :2] ** 2, axis=-1, keepdims=True)
    dist = jnp.where(d2 > 0, jnp.sqrt(jnp.where(d2 > 0, d2, 1.0)), 0.0)
    meandist = jnp.sum(w * dist, axis=-2) / denom  # [..., 1]
    # Floor the mean distance so a fully-degenerate point set yields a large
    # but f32-safe scale (1.4e6; an unbounded 1/eps scale makes downstream
    # squared epipolar terms overflow to inf before the loss clamp). For any
    # healthy set meandist is O(1) and the floor is inactive.
    scale = jnp.sqrt(jnp.asarray(2.0, pts_h.dtype)) / jnp.maximum(
        meandist[..., 0], jnp.asarray(1e-6, pts_h.dtype)
    )

    z = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, z, -c[..., 0] * scale], axis=-1),
            jnp.stack([z, scale, -c[..., 1] * scale], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )
    pts_out = pts_h @ jnp.swapaxes(T, -1, -2)
    return pts_out, T


# ---------------------------------------------------------------------------
# Constraint matrix
# ---------------------------------------------------------------------------


def epipolar_constraint_matrix(
    pts1_h: jnp.ndarray, pts2_h: jnp.ndarray
) -> jnp.ndarray:
    """Build the [..., N, 9] weighted-8-point constraint matrix.

    Row n is [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1] so that
    row · vec(F) = x2ᵀ F x1 with row-major vec. Ref: `Fit.weighted_svd`
    (models/DeepFNet.py:203-205).
    """
    x1, y1, z1 = pts1_h[..., 0], pts1_h[..., 1], pts1_h[..., 2]
    x2, y2, z2 = pts2_h[..., 0], pts2_h[..., 1], pts2_h[..., 2]
    return jnp.stack(
        [
            x2 * x1, x2 * y1, x2 * z1,
            y2 * x1, y2 * y1, y2 * z1,
            z2 * x1, z2 * y1, z2 * z1,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Epipolar distances
# ---------------------------------------------------------------------------


def _prep(pts1, pts2, F, if_homo):
    if not if_homo:
        pts1, pts2 = homo(pts1), homo(pts2)
    Fx1 = pts1 @ jnp.swapaxes(F, -1, -2)  # rows: (F x1)ᵀ  -> lines in image 2
    Ftx2 = pts2 @ F  # rows: (Fᵀ x2)ᵀ -> lines in image 1
    s = jnp.sum(pts2 * Fx1, axis=-1)  # x2ᵀ F x1
    return s, Fx1, Ftx2


def compute_epi_residual(
    pts1_h: jnp.ndarray,
    pts2_h: jnp.ndarray,
    F: jnp.ndarray,
    clamp_at: float = 0.5,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Robust sum of point-to-epipolar-line distances, clamped.

    d = |x2ᵀFx1| * (1/(||(Fx1)_xy|| + eps) + 1/(||(Fᵀx2)_xy|| + eps)),
    clamped at `clamp_at`. Exact port of utils_F.compute_epi_residual
    (utils_F.py:400-413); inputs are homogeneous [..., N, 3].
    """
    s, Fx1, Ftx2 = _prep(pts1_h, pts2_h, F, if_homo=True)
    # safe_norm, not jnp.linalg.norm: a degenerate sampled-subset F can have
    # zero rows, making Fx1 exactly 0 — norm's NaN-at-0 VJP then poisons the
    # whole gradient even though the clamp zeroes the upstream cotangent.
    n1 = safe_norm(Fx1[..., :2], axis=-1)
    n2 = safe_norm(Ftx2[..., :2], axis=-1)
    d = jnp.abs(s) * (1.0 / (n1 + eps) + 1.0 / (n2 + eps))
    return jnp.clip(d, max=clamp_at)


def sym_epi_dist(
    F: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    if_homo: bool = False,
    clamp_at: float | None = None,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Squared symmetric epipolar distance (ref: utils_F._sym_epi_dist :310)."""
    s, Fx1, Ftx2 = _prep(pts1, pts2, F, if_homo)
    nom = s**2
    denom_recp = 1.0 / (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + eps) + 1.0 / (
        Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2 + eps
    )
    errors = nom * denom_recp
    if clamp_at is not None:
        errors = jnp.clip(errors, max=clamp_at)
    return errors


def sampson_dist(
    F: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    if_homo: bool = False,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """First-order (Sampson) epipolar distance (ref: utils_F._sampson_dist :291)."""
    s, Fx1, Ftx2 = _prep(pts1, pts2, F, if_homo)
    nom = s**2
    denom = (
        Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    )
    return nom / (denom + eps)


def epi_distance(
    F: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    if_homo: bool = False,
    eps: float = 1e-10,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unsquared mean/one-sided epipolar line distances.

    Returns (mean of both sides, dist to line in img2, dist to line in img1);
    exact port of utils_F._epi_distance :341 (torch, MEAN convention).
    NOTE the reference's numpy twin epi_distance_np :363 returns the SUM
    (dist3 = d1 + d2) as its first value and that is what the eval paths
    (val_rt npz dumps, evaluation_epiDist) score with — eval callers here
    use `d1 + d2` accordingly (eval/val_rt.py, eval/frontend_eval.py).
    """
    s, Fx1, Ftx2 = _prep(pts1, pts2, F, if_homo)
    nom = jnp.abs(s)
    d1 = nom / jnp.sqrt(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + eps)
    d2 = nom / jnp.sqrt(Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2 + eps)
    return (d1 + d2) / 2.0, d1, d2


# ---------------------------------------------------------------------------
# F <-> E and gt construction
# ---------------------------------------------------------------------------


def F_to_E(F: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """E = Kᵀ F K (without the rank-(1,1,0) projection; ref: utils_F._F_to_E).

    The reference additionally projects to singular values (1,1,0); use
    `ops.svd3.project_E_110` for that step.
    """
    return jnp.swapaxes(K, -1, -2) @ F @ K


def E_to_F(E: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """F = K⁻ᵀ E K⁻¹ (ref: utils_F._E_to_F :464)."""
    K_inv = jnp.linalg.inv(K)
    return jnp.swapaxes(K_inv, -1, -2) @ E @ K_inv


def E_F_from_Rt(
    R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ground-truth E = [t]× R and F = K⁻ᵀ E K⁻¹ from a relative pose.

    (R, t) is the frame-1 → frame-2 transform (x2 = R x1 + t), so that
    x2ᵀ E x1 = 0. Ref: utils_F._E_F_from_Rt :820 / E_F_from_Rt_np :835.
    """
    E = skew(t) @ R
    return E, E_to_F(E, K)
