"""Joint SuperPoint + DeepF end-to-end training (one jitted step).

Port of the reference's if_SP path (`Train_model_pipeline.train_val_batch`
:367-386 + the separate optimizers/flags machinery: `optimizer` vs
`optimizer_SP`, `train`/`train_SP`, prepare_model x2 in train_good.py:230-251).
The frontend runs inside the same jitted step as the solver, so the gradient
flows loss -> solver -> matches (xs + offsets) -> soft-argmax -> SuperPoint
CNN with no host round trips (the reference detours through numpy matching
per batch, train_good_utils.py:685-713).

Batch schema adds 'imgs_grey' [B, 2, H, W] in [0, 1] to the solver batch
keys (Ks, gt E/F/q/t, virtual points).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..frontend import FrontendParams, get_matches_from_sp
from .config import Config
from .engine import compute_losses


class JointTrainState(struct.PyTreeNode):
    deepf_params: Any
    deepf_opt: Any
    sp_params: Any
    sp_opt: Any
    n_iter: jnp.ndarray

    @classmethod
    def create(cls, deepf_params, sp_params, tx_deepf, tx_sp):
        return cls(
            deepf_params=deepf_params,
            deepf_opt=tx_deepf.init(deepf_params),
            sp_params=sp_params,
            sp_opt=tx_sp.init(sp_params),
            n_iter=jnp.zeros((), jnp.int32),
        )


def build_solver_batch(sp_out: Dict, batch: Dict) -> Dict:
    """Assemble the solver data_batch from frontend outputs + gt tensors."""
    db = dict(batch)
    db["matches_xy_ori"] = sp_out["matches_xy_ori"]
    db["quality"] = sp_out["quality"]
    db["matches_good_unique_nums"] = jnp.sum(
        sp_out["valid"].astype(jnp.int32), axis=-1
    )
    return db


def make_joint_train_step(
    deepf_net,
    sp_net,
    fp: FrontendParams,
    tx_deepf: optax.GradientTransformation,
    tx_sp: optax.GradientTransformation,
    cfg: Config,
    train_deepf: bool = True,
    train_sp: bool = True,
    bn_mode: str = "train",
) -> Callable:
    """(state, batch, q_clamp, t_clamp) -> (state, metrics), fully jitted.

    The clamps are TRACED scalars (not static): the quantile-tied clamp
    scheduler (train/clamp.py) emits a continuum of values and static
    clamps would recompile the step at every tightening.

    `bn_mode` (BatchNorm frontends only, i.e. sp_params carries a
    'batch_stats' collection):

    - 'train' (default — the reference's behavior): the SP forward runs
      BN on BATCH statistics and the momentum-updated running buffers
      are written back to the state each step, exactly as torch
      train-mode BN does during the reference's end-to-end fine-tune
      (`net_SP.eval()` appears only in the frozen no-grad branch,
      Train_model_pipeline.py:367-377). Buffer updates ride the same
      non-finite/min-matches guard as the parameter update.
    - 'frozen': inference-mode BN on fixed running stats (the round-4
      behavior; useful for ablation and for frontends without BN).

    Either way the OPTIMIZER never walks the buffers
    (freeze_batch_stats_grads — torch optimizers don't see BN buffers).
    """
    if bn_mode not in ("train", "frozen"):
        raise ValueError(f"bn_mode must be 'train' or 'frozen', got {bn_mode}")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: JointTrainState, batch, q_clamp, t_clamp):
        imgs = batch["imgs_grey"]  # [B, 2, H, W]
        step_rng = jax.random.fold_in(jax.random.PRNGKey(23), state.n_iter)
        # train-mode BN only while SP itself trains: the reference applies
        # net_SP.eval() exactly in the frozen no-grad branch
        # (Train_model_pipeline.py:367-377), so stage-1 (SP frozen) runs
        # inference BN and stage-2 (end-to-end) runs batch-stat BN.
        bn_train = (
            bn_mode == "train"
            and train_sp
            and isinstance(state.sp_params, dict)
            and "batch_stats" in state.sp_params
        )

        def loss_fn(deepf_params, sp_params):
            sp_out = get_matches_from_sp(
                sp_net, sp_params, (imgs[:, 0], imgs[:, 1]), fp,
                bn_train=bn_train,
            )
            new_stats = sp_out.pop("new_batch_stats", None)
            db = build_solver_batch(sp_out, batch)
            loss, metrics = compute_losses(
                deepf_net, deepf_params, db, cfg, q_clamp, t_clamp,
                rng=step_rng,
            )
            per_item = jnp.sum(sp_out["valid"], axis=-1).astype(jnp.float32)
            metrics["num_matches"] = jnp.mean(per_item)
            metrics["min_matches_item"] = jnp.min(per_item)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), (g_deepf, g_sp) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.deepf_params, state.sp_params)
        # BN running statistics are buffers, not parameters: inference-mode
        # BN has real gradients w.r.t. mean/var, but the optimizer must
        # never walk them (torch parity; Adam steps corrupt the stats and
        # can drive var -> 0). In train mode their grads are zero anyway
        # (batch stats are used instead), and the buffers advance by the
        # momentum write-back below.
        from ..frontend.train_sp import freeze_batch_stats_grads

        g_sp = freeze_batch_stats_grads(g_sp)
        # Gradient-noise telemetry: the weighted-8-point VJP is heavy-tailed
        # on outlier-dense matches (near-degenerate Gram spectra), which is
        # what the reference's skip-optimizer guards against
        # (Train_model_pipeline.py:598-639).
        metrics["g_deepf_norm"] = optax.global_norm(g_deepf)
        metrics["g_sp_norm"] = optax.global_norm(g_sp)

        # Update guard (jit-safe): skip the whole update when the loss or a
        # gradient is non-finite, or when the frontend produced too few
        # matches for a stable fit — the reference's check_num_of_matches
        # thd=100 batch skip (Train_model_pipeline.py:113-115) and NaN-loss
        # pause (train_good_utils.py:986-987) combined.
        # Guard on the per-item MIN (one degenerate item is what
        # destabilizes the weighted-8-point VJP), matching the reference's
        # per-sample check; the mean stays as the logged metric.
        min_matches = float(getattr(cfg.training, "min_matches", 0))
        enough = metrics["min_matches_item"] >= min_matches
        finite = (
            jnp.isfinite(loss)
            & jnp.isfinite(metrics["g_deepf_norm"])
            & jnp.isfinite(metrics["g_sp_norm"])
        )
        ok = finite & enough
        metrics["skipped_update"] = (~ok).astype(jnp.float32)

        def _guard(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )

        deepf_params, deepf_opt = state.deepf_params, state.deepf_opt
        if train_deepf:
            upd, new_opt = tx_deepf.update(g_deepf, deepf_opt, deepf_params)
            deepf_params = _guard(
                optax.apply_updates(deepf_params, upd), deepf_params
            )
            deepf_opt = _guard(new_opt, deepf_opt)
        sp_params, sp_opt = state.sp_params, state.sp_opt
        if train_sp:
            upd, new_opt = tx_sp.update(g_sp, sp_opt, sp_params)
            sp_params = _guard(
                optax.apply_updates(sp_params, upd), sp_params
            )
            sp_opt = _guard(new_opt, sp_opt)
        if bn_train and new_stats is not None:
            # Momentum buffer write-back (torch train-mode BN updates the
            # buffers in forward; here it is a buffer assignment outside
            # the optimizer). Guarded like the parameter update so a
            # non-finite batch can't poison the running statistics.
            sp_params = dict(sp_params)
            sp_params["batch_stats"] = _guard(
                new_stats, state.sp_params["batch_stats"]
            )

        new_state = state.replace(
            deepf_params=deepf_params,
            deepf_opt=deepf_opt,
            sp_params=sp_params,
            sp_opt=sp_opt,
            n_iter=state.n_iter + 1,
        )
        return new_state, metrics

    return step


def make_joint_eval_step(deepf_net, sp_net, fp: FrontendParams, cfg: Config):
    @jax.jit
    def eval_step(deepf_params, sp_params, batch):
        imgs = batch["imgs_grey"]
        sp_out = get_matches_from_sp(
            sp_net, sp_params, (imgs[:, 0], imgs[:, 1]), fp
        )
        db = build_solver_batch(sp_out, batch)
        _, metrics = compute_losses(
            deepf_net, deepf_params, db, cfg,
            float(cfg.training.clamp_q_params[-1]),
            float(cfg.training.clamp_t_params[-1]),
        )
        metrics["matches_xy"] = sp_out["matches_xy_ori"]
        metrics["num_matches"] = jnp.mean(
            jnp.sum(sp_out["valid"], axis=-1).astype(jnp.float32)
        )
        return metrics

    return eval_step
