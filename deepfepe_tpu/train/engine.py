"""Training / validation step engine (jit-compiled, mesh-shardable).

Port of the reference per-batch train/val path
(`Train_model_pipeline.train_val_batch` :307-650 — SURVEY.md §3.2), with the
loss schedule, clamp curriculum, skip-optimizer quirk, and the same loss
composition:

  F-mode:  loss = loss_F (mean robust epi residual on virtual points)
  qt-mode: loss = loss_q * balance_q + loss_t * balance_t   (replaces F-loss,
            per Train_model_pipeline.py:575-589)

Everything runs as one jitted step per batch; validation pose errors that the
reference computed via a host ProcessPool of OpenCV calls
(Train_model_pipeline.py:1048-1061) are computed on device by
`eval.val_rt` instead.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import f_loss, rt_loss
from .config import Config


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    n_iter: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, params, tx):
        return cls(
            params=params,
            opt_state=tx.init(params),
            n_iter=jnp.zeros((), jnp.int32),
        )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference's step-decay schedule
    (Train_model_pipeline.adjust_learning_rate :118-139)."""
    tcfg = cfg.training
    if tcfg.lr_decay_rate != 1.0:
        sched = optax.exponential_decay(
            init_value=tcfg.learning_rate,
            transition_steps=tcfg.lr_decay_step * 1000,
            decay_rate=tcfg.lr_decay_rate,
            staircase=True,
        )
    else:
        sched = tcfg.learning_rate
    return optax.adam(sched)


def compute_losses(
    net,
    params,
    batch: Dict[str, jnp.ndarray],
    cfg: Config,
    q_clamp: float,
    t_clamp: float,
    rng: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward + loss composition; returns (scalar loss, metrics dict)."""
    mcfg = cfg.model
    rngs = None
    if mcfg.if_sample_loss:
        rngs = {"sample": rng if rng is not None else jax.random.PRNGKey(0)}
    outs = net.apply(params, batch, rngs=rngs)
    ld = f_loss(
        outs, batch["pts1_virt"], batch["pts2_virt"], batch["Ks"], mcfg.clamp_at
    )
    metrics = {
        "loss_F": ld["loss_F"],
        "loss_layers": ld["loss_layers"],
        "loss_min_batch": ld["loss_min_batch"],
        "loss_epi_res": ld["loss_epi_res"],
    }
    loss = ld["loss_F"]
    if mcfg.if_sample_loss and "loss_selected_F" in ld:
        balance_select_F = getattr(mcfg, "balance_select_F", 0.1)
        loss = loss + ld["loss_selected_F"] * balance_select_F
        metrics["loss_selected_F"] = ld["loss_selected_F"]
    if mcfg.if_qt_loss:
        R_gt = jnp.linalg.inv(batch["delta_Rtijs_4_4"])[..., :3, :3]
        rd = rt_loss(
            ld["E_ests_layers"],
            batch["q_cam"],
            batch["t_cam"],
            R_gt,
            loss_q_clamp=q_clamp,
            loss_t_clamp=t_clamp,
        )
        loss = rd["loss_q"] * mcfg.balance_q + rd["loss_t"] * mcfg.balance_t
        metrics.update(
            {
                "loss_q": rd["loss_q"],
                "loss_t": rd["loss_t"],
                "R_angle_error_mean": rd["R_angle_error_mean"],
                "t_angle_error_mean": rd["t_angle_error_mean"],
                # Per-item UNCLAMPED final-layer errors [B]: the
                # quantile-tied clamp scheduler (train/clamp.py) reads
                # these to tighten clamps only once the measured error
                # distribution is inside them.
                "q_l2_final": rd["q_l2_layers"][-1],
                "t_l2_final": rd["t_l2_layers"][-1],
            }
        )
    metrics["loss"] = loss
    metrics["E_ests"] = ld["E_ests"]
    metrics["F_ests"] = ld["F_ests"]
    # Final-layer correspondence weights: the learned inlier scores, used
    # by the BA refinement (eval/refine.py) as robust residual weights.
    metrics["weights"] = outs["weights"]
    return loss, metrics


def make_train_step(
    net, tx: optax.GradientTransformation, cfg: Config
) -> Callable:
    """Build the jitted train step: (state, batch, q_clamp, t_clamp) ->
    (state, metrics). The clamp scalars are static (they change twice over a
    run — two recompiles, as with the reference's curriculum)."""

    @functools.partial(jax.jit, static_argnums=(2, 3), donate_argnums=(0,))
    def train_step(state: TrainState, batch, q_clamp: float, t_clamp: float):
        step_rng = jax.random.fold_in(jax.random.PRNGKey(17), state.n_iter)

        def loss_fn(params):
            return compute_losses(
                net, params, batch, cfg, q_clamp, t_clamp, rng=step_rng
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard (ref: the NaN-loss pause at train_good_utils.py:986-987
        # and set_nan2zero scrubbing, model_utils.py:5): a non-finite loss or
        # gradient skips the whole update — params and optimizer state keep
        # their previous values — instead of poisoning the run. jit-safe
        # (jnp.where, no host sync); surfaced as the 'nonfinite' metric.
        grads_ok = jnp.all(
            jnp.stack(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
            )
        )
        ok = jnp.isfinite(loss) & grads_ok
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), opt_state, state.opt_state
        )
        metrics["nonfinite"] = (~ok).astype(jnp.float32)

        if cfg.training.skip_optimizer_enable:
            # Skip the update when the batch is already "solved"
            # (Train_model_pipeline.py:598-639): loss_min below epi_min.
            skip = jnp.min(metrics["loss_min_batch"]) <= (
                cfg.training.skip_optimizer_epi_min
            )
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(skip, old, new),
                new_params,
                state.params,
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(skip, old, new),
                opt_state,
                state.opt_state,
            )
            metrics["skipped"] = skip

        new_state = state.replace(
            params=new_params, opt_state=opt_state, n_iter=state.n_iter + 1
        )
        return new_state, metrics

    return train_step


def make_eval_step(net, cfg: Config) -> Callable:
    @jax.jit
    def eval_step(params, batch):
        _, metrics = compute_losses(
            net,
            params,
            batch,
            cfg,
            float(cfg.training.clamp_q_params[-1]),
            float(cfg.training.clamp_t_params[-1]),
        )
        return metrics

    return eval_step
