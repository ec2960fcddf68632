"""Fixed-iteration vmapped RANSAC baselines (F 8-point; E via K-normalization).

TPU-native replacement for the reference's OpenCV baselines
(`utils_opencv.recover_camera_opencv` :129 — cv2.findEssentialMat 5-point
RANSAC / cv2.findFundamentalMat 8-point RANSAC + recoverPose). Adaptive
early-exit RANSAC is host-control-flow-hostile; instead we run a fixed
hypothesis budget fully batched on device (all hypotheses solved as ONE
Gram-eigh batch, scored as one [H, N] distance matrix), then refit on the
best hypothesis' inliers. This matches OpenCV statistically (it is an eval
baseline, not a training path — SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.basic import homo
from ..geometry.epipolar import epi_distance, hartley_normalize
from ..ops.eigh import smallest_singular_vec_gram
from ..ops.fmatrix import weighted_eight_point
from ..ops.svd3 import rank2_projection


class RansacResult(NamedTuple):
    F: jnp.ndarray            # [..., 3, 3] refit on inliers
    inlier_mask: jnp.ndarray  # [..., N] bool
    num_inliers: jnp.ndarray  # [...]


def _fit_minimal(pts1_h, pts2_h, idx):
    """8-point fit on the subset `idx` [8] of [N, 3] points -> F [3, 3]."""
    p1 = pts1_h[idx]
    p2 = pts2_h[idx]
    p1n, T1 = hartley_normalize(p1)
    p2n, T2 = hartley_normalize(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )
    f = smallest_singular_vec_gram(A)
    F = rank2_projection(f.reshape(3, 3))
    return T2.T @ F @ T1


def ransac_f(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 512,
    threshold: float = 1.0,
    refit: bool = True,
) -> RansacResult:
    """8-point RANSAC for F on one pair. x1, x2: [N, 2] (pixel or normalized
    coords; threshold must match the coordinate units)."""
    n = x1.shape[0]
    pts1_h, pts2_h = homo(x1), homo(x2)

    idxs = jax.random.randint(key, (num_hypotheses, 8), 0, n)
    Fs = jax.vmap(lambda i: _fit_minimal(pts1_h, pts2_h, i))(idxs)  # [H, 3, 3]

    d, _, _ = epi_distance(Fs[:, None], x1[None], x2[None], if_homo=False)
    # epi_distance broadcasting: F [H, 1, 3, 3] over points -> [H, N]
    d = d.reshape(num_hypotheses, n)
    inliers = d < threshold
    scores = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(scores)
    mask = inliers[best]

    if refit:
        w = mask.astype(x1.dtype)
        w = w / (jnp.sum(w) + 1e-9)
        fit = weighted_eight_point(
            pts1_h[None], pts2_h[None], w[None], normalize_svd=False
        )
        F_best = fit.F[0]
        d_f, _, _ = epi_distance(F_best, x1, x2, if_homo=False)
        mask = d_f < threshold
    else:
        F_best = Fs[best]
    return RansacResult(
        F=F_best, inlier_mask=mask, num_inliers=jnp.sum(mask)
    )


def ransac_f_batch(
    x1: jnp.ndarray, x2: jnp.ndarray, key: jax.Array, **kw
) -> RansacResult:
    """Batched over the leading axis: x1, x2 [B, N, 2]."""
    keys = jax.random.split(key, x1.shape[0])
    return jax.vmap(lambda a, b, k: ransac_f(a, b, k, **kw))(x1, x2, keys)


def ransac_e(
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 64,
    threshold: float = 1e-3,
    refit: bool = True,
) -> RansacResult:
    """Nister 5-point RANSAC for E on one pair (the reference's headline
    cv2.findEssentialMat baseline, utils_opencv.py:129 — here first-party
    and on-device: geometry/fivepoint.py). x1n, x2n: [N, 2] K-NORMALIZED
    coords; `threshold` is a squared Sampson distance in those units
    (1e-3 ≈ cv2's default 1 px at f≈1000... i.e. scale it by (1/f)²).

    Each of the `num_hypotheses` minimal samples yields up to 10 real-root
    candidates; all H*10 are scored as one batch.
    """
    from ..geometry.epipolar import sampson_dist
    from ..geometry.fivepoint import five_point_candidates
    from ..ops.svd3 import project_E_110

    n = x1n.shape[0]
    idxs = jax.random.randint(key, (num_hypotheses, 5), 0, n)
    cands = jax.vmap(
        lambda i: five_point_candidates(x1n[i], x2n[i])
    )(idxs)
    Es = cands.E.reshape(num_hypotheses * 10, 3, 3)
    ok = cands.valid.reshape(num_hypotheses * 10)

    d = sampson_dist(Es[:, None], x1n[None], x2n[None], if_homo=False)
    d = d.reshape(num_hypotheses * 10, n)
    inliers = (d < threshold) & ok[:, None]
    scores = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(scores)
    mask = inliers[best]

    if refit:
        pts1_h, pts2_h = homo(x1n), homo(x2n)
        w = mask.astype(x1n.dtype)
        w = w / (jnp.sum(w) + 1e-9)
        fit = weighted_eight_point(
            pts1_h[None], pts2_h[None], w[None], normalize_svd=False
        )
        E_best = project_E_110(fit.F[0])
        d_e = sampson_dist(E_best, x1n, x2n, if_homo=False)
        mask = d_e < threshold
    else:
        E_best = Es[best]
    return RansacResult(
        F=E_best, inlier_mask=mask, num_inliers=jnp.sum(mask)
    )


def ransac_e_batch(
    x1n: jnp.ndarray, x2n: jnp.ndarray, key: jax.Array, **kw
) -> RansacResult:
    """Batched over the leading axis: x1n, x2n [B, N, 2] (K-normalized)."""
    keys = jax.random.split(key, x1n.shape[0])
    return jax.vmap(lambda a, b, k: ransac_e(a, b, k, **kw))(x1n, x2n, keys)
