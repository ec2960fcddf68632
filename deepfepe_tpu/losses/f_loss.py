"""F-loss over solver layers + summaries (parity: train_good_utils.py).

`f_loss` ports `get_all_loss_DeepF` (train_good_utils.py:298-521): per-layer
robust epipolar residual of the T-transformed *virtual* gt-consistent points
against each layer's F estimate, plus the per-layer essential matrices
E = Kᵀ T2ᵀ F_l T1 K used by the pose loss, the weighted epi-res auxiliary
loss, and (optionally) the residual/weight regularizer summaries
(:441-510). All per-layer Python loops become stacked-array ops.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..geometry.epipolar import compute_epi_residual


def f_loss(
    outs: Dict[str, Any],
    pts1_virt: jnp.ndarray,  # [B, V, 3] homogeneous pixel coords
    pts2_virt: jnp.ndarray,
    Ks: jnp.ndarray,         # [B, 3, 3]
    clamp_at: float,
) -> Dict[str, Any]:
    """Returns dict with loss_F, loss_layers, loss_min_batch, E_ests_layers,
    E_ests, F_ests, loss_epi_res."""
    T1, T2 = outs["T1"], outs["T2"]
    out_layers = outs["out_layers"]          # [L, B, 3, 3]
    # Virtual points into the HW-normalized frame the solver works in.
    pts1_eval = pts1_virt @ jnp.swapaxes(T1, -1, -2)  # [B, V, 3]
    pts2_eval = pts2_virt @ jnp.swapaxes(T2, -1, -2)

    # Per-layer robust epi residual: broadcast [L, B, ...].
    losses = compute_epi_residual(
        pts1_eval[None], pts2_eval[None], out_layers, clamp_at=clamp_at
    )  # [L, B, V]
    loss_layers = jnp.mean(losses, axis=(-1, -2))       # [L]
    loss_min_batch_lb = jnp.mean(losses, axis=-1)       # [L, B]
    loss_F = jnp.mean(loss_layers)

    Kt = jnp.swapaxes(Ks, -1, -2)
    T2t = jnp.swapaxes(T2, -1, -2)
    E_ests_layers = Kt[None] @ T2t[None] @ out_layers @ T1[None] @ Ks[None]

    F_ests = T2t @ outs["F_est"] @ T1
    E_ests = Kt @ F_ests @ Ks

    # Weighted epi-res auxiliary (train_good_utils.py:430-439).
    epi_res_layers = outs["epi_res_layers"]   # [L-1, B, N]
    weights_layers = outs["weights_layers"]   # [L, B, N]
    L = out_layers.shape[0]
    if L > 1:
        loss_epi_res = jnp.mean(
            epi_res_layers * weights_layers[: L - 1], axis=(-1, -2)
        ).mean()
    else:
        loss_epi_res = jnp.asarray(0.0, out_layers.dtype)

    out = {
        "loss_F": loss_F,
        "loss_layers": loss_layers,
        "losses_layers": losses,
        "loss_min_layers": jnp.min(loss_min_batch_lb, axis=1),  # [L]
        "loss_min_batch": jnp.min(loss_min_batch_lb, axis=0),   # [B]
        "E_ests_layers": E_ests_layers,
        "E_ests": E_ests,
        "F_ests": F_ests,
        "loss_epi_res": loss_epi_res,
    }

    # Sample-loss auxiliary (ref: get_all_loss_DeepF :387-424): mean clamped
    # epi residual of every sampled-hypothesis F on the virtual points.
    if "out_sample_selected_layers" in outs:
        F_samples = outs["out_sample_selected_layers"]  # [L, B, S, 3, 3]
        sel_losses = compute_epi_residual(
            pts1_eval[None, :, None],  # [1, B, 1, V, 3]
            pts2_eval[None, :, None],
            F_samples,
            clamp_at=0.02,
        )  # [L, B, S, V]
        out["loss_selected_layers"] = jnp.mean(sel_losses, axis=(-1, -2, -3))
        out["loss_selected_F"] = jnp.mean(out["loss_selected_layers"])

    return out


def unique_topk(
    xs: jnp.ndarray, topk: int, unique_nums: jnp.ndarray
) -> jnp.ndarray:
    """Top-k over only the first `unique_nums[b]` entries of each row.

    Port of `get_unique` (train_good_utils.py:543-551): the data pipeline puts
    the unique matches first and pads by resampling, so masking by index is
    exact. xs: [B, N]; unique_nums: [B] int. Returns [B, topk].
    """
    n = xs.shape[-1]
    idx = jnp.arange(n)
    mask = idx[None, :] < unique_nums[..., None]
    masked = jnp.where(mask, xs, -jnp.inf)
    top, _ = jax.lax.top_k(masked, topk)
    return top


def residual_summaries(
    outs: Dict[str, Any],
    topk: int,
    unique_nums: jnp.ndarray,
    regw_thres: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    """Residual-norm and weight regularizer summaries
    (train_good_utils.py:441-510)."""
    residual_layers = outs["residual_layers"]  # [L, B, N]
    weights_layers = outs["weights_layers"]    # [L, B, N]

    res_norms = jnp.linalg.norm(residual_layers, axis=-1)  # [L, B]
    loss_residual = jnp.mean(res_norms)
    loss_residual_max = jnp.max(res_norms)
    res_topk = unique_topk(
        jnp.abs(residual_layers).reshape(-1, residual_layers.shape[-1]),
        topk,
        jnp.tile(unique_nums, residual_layers.shape[0]),
    )
    loss_residual_topk = jnp.mean(res_topk)

    # Weight-above-threshold clip regularizer (x100, :472-478).
    loss_regw_clip = (
        jnp.mean(jnp.maximum(weights_layers - regw_thres, 0.0)) * 100.0
    )

    # Entropy of the weight distribution (full + topK-unique renormalized).
    p = weights_layers / (
        jnp.sum(weights_layers, axis=-1, keepdims=True) + 1e-12
    )
    entropy = -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)  # [L, B]
    w_topk = unique_topk(
        weights_layers.reshape(-1, weights_layers.shape[-1]),
        topk,
        jnp.tile(unique_nums, weights_layers.shape[0]),
    )
    p_topk = w_topk / (jnp.sum(w_topk, axis=-1, keepdims=True) + 1e-12)
    entropy_topk = -jnp.sum(p_topk * jnp.log(p_topk + 1e-12), axis=-1)

    return {
        "loss_residual": loss_residual,
        "loss_residual_max": loss_residual_max,
        "loss_residual_topK": loss_residual_topk,
        "loss_regW_clip": loss_regw_clip,
        "loss_regW_entro": jnp.mean(entropy),
        "loss_regW_entro_topK": jnp.mean(entropy_topk),
    }
