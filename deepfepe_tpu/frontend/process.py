"""Heatmap post-processing: NMS, top-k keypoints, soft-argmax, desc sampling.

TPU-native equivalent of the reference's `SuperPointNet_process` helper
(params {out_num_points, patch_size=5, nms_dist=4, conf_thresh=0.015,
nn_thresh} — train_good.py:199-206): `heatmap_to_nms`, `pred_soft_argmax`
(the differentiable subpixel offsets through which gradients flow back into
SuperPoint during end-to-end training, Train_model_pipeline.py:375-384),
`batch_extract_features` (sparse descriptor sampling).

Everything is static-shape: exactly `out_num_points` keypoints per image
(score-sorted, zero-padded with a validity mask) — the TPU version of the
reference's crop-or-pad convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.basic import safe_norm


class Keypoints(NamedTuple):
    xy: jnp.ndarray      # [B, K, 2] integer NMS positions (x, y), float dtype
    offsets: jnp.ndarray # [B, K, 2] differentiable subpixel offsets
    scores: jnp.ndarray  # [B, K]
    valid: jnp.ndarray   # [B, K] bool
    desc: jnp.ndarray | None = None  # [B, K, D] L2-normalized


def nms_heatmap(heatmap: jnp.ndarray, nms_dist: int = 4) -> jnp.ndarray:
    """Suppress non-local-maxima: keep p where p == maxpool(p) in the
    (2*nms_dist+1)^2 window. Grid-structured replacement for the reference's
    serial greedy NMS (same keypoints for well-separated maxima)."""
    k = 2 * nms_dist + 1
    m = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return jnp.where(heatmap >= m, heatmap, 0.0)


def topk_keypoints(
    nms_map: jnp.ndarray, k: int, conf_thresh: float = 0.015
) -> Keypoints:
    """Top-k scoring NMS survivors -> static-shape keypoint set."""
    B, H, W = nms_map.shape
    flat = nms_map.reshape(B, H * W)
    scores, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(nms_map.dtype)
    xs = (idx % W).astype(nms_map.dtype)
    valid = scores > conf_thresh
    xy = jnp.stack([xs, ys], axis=-1)
    xy = jnp.where(valid[..., None], xy, 0.0)
    return Keypoints(
        xy=xy,
        offsets=jnp.zeros_like(xy),
        scores=jnp.where(valid, scores, 0.0),
        valid=valid,
    )


def soft_argmax_refine(
    heatmap: jnp.ndarray,
    kpts: Keypoints,
    patch_size: int = 5,
    temperature: float | None = None,
    eps: float = 1e-10,
) -> Keypoints:
    """Differentiable subpixel refinement (ref: pred_soft_argmax).

    Extract a patch around each keypoint from the dense heatmap and take the
    probability-weighted expected offset (center of mass of the patch —
    unbiased for symmetric peaks; pass `temperature` to use a softmax over
    patch/T instead). The offset carries the gradient path from the solver
    back into the SuperPoint CNN (matches_use = xs + offsets,
    Train_model_pipeline.py:384).
    """
    B, H, W = heatmap.shape
    r = patch_size // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=heatmap.dtype),
        jnp.arange(-r, r + 1, dtype=heatmap.dtype),
        indexing="ij",
    )

    def patch_at(hm, x, y):
        # Gather patch with clamped window origin (static patch shape).
        x0 = jnp.clip(x - r, 0, W - patch_size).astype(jnp.int32)
        y0 = jnp.clip(y - r, 0, H - patch_size).astype(jnp.int32)
        patch = jax.lax.dynamic_slice(hm, (y0, x0), (patch_size, patch_size))
        # Offset of the window center from the keypoint (for clamped edges).
        cx = x0.astype(hm.dtype) + r - x
        cy = y0.astype(hm.dtype) + r - y
        return patch, cx, cy

    def per_image(hm, xy):
        def per_point(p):
            patch, cx, cy = patch_at(hm, p[0], p[1])
            flat = patch.ravel()
            if temperature is not None:
                w = jax.nn.softmax(flat / temperature)
            else:
                w = flat / (jnp.sum(flat) + eps)
            ox = jnp.sum(w * (dx.ravel() + cx))
            oy = jnp.sum(w * (dy.ravel() + cy))
            return jnp.stack([ox, oy])

        return jax.vmap(per_point)(xy)

    offsets = jax.vmap(per_image)(heatmap, kpts.xy)
    offsets = jnp.where(kpts.valid[..., None], offsets, 0.0)
    return kpts._replace(offsets=offsets)


def sample_descriptors(
    desc_map: jnp.ndarray, xy: jnp.ndarray, cell: int = 8, eps: float = 1e-10
) -> jnp.ndarray:
    """Bilinear sampling of the dense descriptor map at pixel coords.

    desc_map: [B, Hc, Wc, D] (1/8 resolution); xy: [B, K, 2] pixel coords.
    Replacement for the reference's grid_sample-based batch_extract_features.
    """
    B, Hc, Wc, D = desc_map.shape
    # Map pixel coords to descriptor-grid coords (cell centers at .5 cells).
    gx = xy[..., 0] / cell - 0.5
    gy = xy[..., 1] / cell - 0.5
    x0 = jnp.clip(jnp.floor(gx), 0, Wc - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(gy), 0, Hc - 2).astype(jnp.int32)
    fx = jnp.clip(gx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(gy - y0, 0.0, 1.0)[..., None]

    def gather(dm, ys, xs):
        return jax.vmap(lambda yy, xx: dm[yy, xx])(ys, xs)

    d00 = jax.vmap(gather)(desc_map, y0, x0)
    d01 = jax.vmap(gather)(desc_map, y0, x0 + 1)
    d10 = jax.vmap(gather)(desc_map, y0 + 1, x0)
    d11 = jax.vmap(gather)(desc_map, y0 + 1, x0 + 1)
    d = (
        d00 * (1 - fx) * (1 - fy)
        + d01 * fx * (1 - fy)
        + d10 * (1 - fx) * fy
        + d11 * fx * fy
    )
    return d / (safe_norm(d, axis=-1, keepdims=True) + eps)


def extract_keypoints(
    heatmap: jnp.ndarray,
    desc_map: jnp.ndarray,
    out_num_points: int = 1000,
    nms_dist: int = 4,
    conf_thresh: float = 0.015,
    patch_size: int = 5,
) -> Keypoints:
    """Full pipeline: NMS -> top-k -> soft-argmax -> descriptor sampling."""
    nms = nms_heatmap(heatmap, nms_dist)
    kpts = topk_keypoints(nms, out_num_points, conf_thresh)
    kpts = soft_argmax_refine(heatmap, kpts, patch_size)
    desc = sample_descriptors(desc_map, kpts.xy + kpts.offsets)
    return kpts._replace(desc=desc)
