"""Differentiable RANSAC (DSAC) for essential-matrix fitting.

TPU-native port of `dsac_tools/dsac.py` (:15-194): sample minimal-subset E
hypotheses, score each with a soft (sigmoid) Sampson-distance inlier count,
form the softmax hypothesis distribution, and return both the expected loss
(the DSAC training objective) and the refined best hypothesis. The
reference's per-hypothesis Python loop over CPU SVDs becomes one batched
Gram-eigh fan-out; scores for all hypotheses are one [H, N] distance matrix.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..geometry.basic import homo
from ..geometry.epipolar import sampson_dist
from ..ops.fmatrix import weighted_eight_point


def dsac_essential(
    x1_norm: jnp.ndarray,       # [N, 2] K-normalized points, image 1
    x2_norm: jnp.ndarray,       # [N, 2]
    key: jax.Array,
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    hyps: int = 64,
    sample_size: int = 10,
    inlier_thresh: float = 1e-4,
    inlier_beta: float = 1e5,
    inlier_alpha: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Returns {'E_best', 'exp_loss', 'top_loss', 'hyp_probs', 'E_hyps'}.

    `loss_fn(E) -> scalar` scores a hypothesis against ground truth (the
    reference's `loss_function`); if None, only the soft scores are used.
    """
    n = x1_norm.shape[0]
    p1h, p2h = homo(x1_norm), homo(x2_norm)

    idx = jax.random.randint(key, (hyps, sample_size), 0, n)
    w = jnp.full((hyps, sample_size), 1.0 / sample_size, x1_norm.dtype)
    fit = weighted_eight_point(p1h[idx], p2h[idx], w)
    E_hyps = fit.F  # in normalized coords F == E

    # Soft inlier count per hypothesis (dsac.py:57-77).
    d = sampson_dist(E_hyps[:, None], x1_norm[None], x2_norm[None])
    d = d.reshape(hyps, n)
    soft = 1.0 - jax.nn.sigmoid(inlier_beta * (d - inlier_thresh))
    scores = jnp.sum(soft, axis=-1)  # [H]

    probs = jax.nn.softmax(inlier_alpha * scores)
    best = jnp.argmax(scores)

    # Refine best hypothesis with its soft inlier weights (dsac.py:79-96).
    w_ref = soft[best] / (jnp.sum(soft[best]) + 1e-10)
    refined = weighted_eight_point(p1h[None], p2h[None], w_ref[None])
    E_best = refined.F[0]

    out = {
        "E_best": E_best,
        "E_hyps": E_hyps,
        "hyp_probs": probs,
        "soft_scores": scores,
        "inlier_weights": w_ref,
    }
    if loss_fn is not None:
        losses = jax.vmap(loss_fn)(E_hyps)  # [H]
        out["exp_loss"] = jnp.sum(probs * losses)
        out["top_loss"] = losses[best]
    return out
