"""Sampled minimal-subset fits — the sample-loss variant's auxiliary head.

TPU-native port of `DeepFNetSampleLoss.Fit.forward` (models/
DeepFNetSampleLoss.py:364-436) and `weighted_svd_batch` (:272-345): per
sample, (a) fit F on the top-K weighted unique correspondences and (b) fit F
on `selects` random K-subsets drawn ∝ the predicted weights, scoring each
hypothesis by the (normalized) product of its member weights — a
differentiable-RANSAC-flavored loss. The reference does the per-sample
subset loop on the host with numpy choice + CUDA batch_svd; here the whole
[B, S, K] fan-out is one vmapped Gram-eigh batch with on-device categorical
sampling.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.fmatrix import weighted_eight_point


def _masked_log_weights(weights, unique_nums, eps=1e-12):
    n = weights.shape[-1]
    mask = jnp.arange(n)[None, :] < unique_nums[..., None]
    return jnp.where(mask, jnp.log(weights + eps), -jnp.inf)


def sample_loss_fits(
    pts1_h: jnp.ndarray,      # [B, N, 3]
    pts2_h: jnp.ndarray,
    weights: jnp.ndarray,     # [B, N]
    unique_nums: jnp.ndarray, # [B]
    key: jax.Array,
    topk: int = 20,
    selects: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Returns {'F_topK' [B,3,3], 'residual_topK' [B,topk],
    'F_samples' [B,S,3,3], 'sample_scores' [B,S]}."""
    B, N, _ = pts1_h.shape
    logw = _masked_log_weights(weights, unique_nums)

    # (a) top-K fit.
    top_w, top_idx = jax.lax.top_k(
        jnp.where(jnp.isneginf(logw), -jnp.inf, weights), topk
    )
    g = lambda pts, idx: jnp.take_along_axis(pts, idx[..., None], axis=-2)
    fit_top = weighted_eight_point(
        g(pts1_h, top_idx), g(pts2_h, top_idx), top_w
    )

    # (b) sampled minimal subsets: [B, S, K] indices ∝ weights (with
    # replacement, as np.random.choice(p=...) in the reference).
    idx = jax.random.categorical(
        key, logw[:, None, None, :], shape=(B, selects, topk), axis=-1
    )  # [B, S, K]
    p1 = jnp.take_along_axis(
        pts1_h[:, None], idx[..., None], axis=-2
    )  # [B, S, K, 3]
    p2 = jnp.take_along_axis(pts2_h[:, None], idx[..., None], axis=-2)
    w_sel = jnp.take_along_axis(weights[:, None], idx, axis=-1)  # [B, S, K]
    fit_s = weighted_eight_point(p1, p2, w_sel)

    # Hypothesis score: normalized product of member weights (ref :425-427
    # computes prod(w*1000)/sum — that overflows f32 once the softmax
    # concentrates (w=0.1 gives (100)^20 = 1e40 -> inf/inf = NaN, observed
    # at iter ~400 on the synthetic ablation). The same normalized product
    # in log space, exactly: softmax over the sum of log-weights (the
    # x1000^K factor cancels in the normalization).
    score = jax.nn.softmax(
        jnp.sum(jnp.log(w_sel + 1e-12), axis=-1), axis=-1
    )  # [B, S]

    return {
        "F_topK": fit_top.F,
        "residual_topK": fit_top.residual,
        "F_samples": fit_s.F,          # [B, S, 3, 3]
        "sample_scores": score,
        "sample_idx": idx,
    }
