"""The outer training loop: epochs, validation cadence, checkpointing, logs.

Port of `Train_model_pipeline.train_epoch` (:163-305) and the checkpoint
machinery (`save_model` :56, `pretrainedLoader_net/opt`, loader.py:196-229 —
SURVEY.md §5.4): periodic validation over the val stream, periodic
checkpoints keyed by n_iter, JSONL metric logging (the reference's
TensorBoard scalars), resume from a saved state.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..parallel.mesh import make_mesh, shard_batch, shard_params
from .config import Config, qt_clamps
from .engine import TrainState, make_eval_step, make_optimizer, make_train_step


def save_checkpoint(path: str, state: TrainState) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def load_checkpoint(path: str, state_template: TrainState) -> TrainState:
    """Restore a TrainState; params-only checkpoints (opt_state: None) keep
    the template's fresh optimizer state — the reference restores net and
    optimizer separately (pretrainedLoader_net/_opt, utils/loader.py:196,215)
    and eval/fine-tune flows routinely carry net-only files."""
    if path.endswith(".pth") or path.endswith(".pth.tar"):
        # Reference torch checkpoints (model zoo / user files,
        # README.md:104-169): convert the state_dict in place; optimizer
        # state is torch Adam moments and is intentionally not carried over.
        from ..utils.torch_import import load_reference_checkpoint

        variables, n_iter = load_reference_checkpoint(path, kind="deepf")
        params = serialization.from_state_dict(
            state_template.params, variables
        )
        return state_template.replace(
            params=params,
            n_iter=jnp.asarray(
                n_iter if n_iter is not None else state_template.n_iter
            ),
        )
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and raw.get("opt_state") is None:
        params = serialization.from_state_dict(
            state_template.params, raw["params"]
        )
        n_iter = raw.get("n_iter", state_template.n_iter)
        return state_template.replace(
            params=params, n_iter=jnp.asarray(n_iter)
        )
    return serialization.from_state_dict(state_template, raw)


class MetricLogger:
    """Dual metric sink: JSONL (machine-readable) plus first-party
    tfevents scalars (the reference's tensorboardX workflow,
    `tensorboard --logdir` per README.md:244-247 — SURVEY.md §5.5)."""

    def __init__(
        self,
        path: Optional[str] = None,
        echo_every: int = 50,
        tb_dir: Optional[str] = None,
    ):
        self.path = path
        self.echo_every = echo_every
        self._f = None
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            self._f = open(path, "a")
        if tb_dir:
            from ..utils.tb_writer import TBWriter

            self._tb = TBWriter(tb_dir)

    def log(self, n_iter: int, tag: str, metrics: Dict) -> None:
        scalars = {
            k: float(np.asarray(v))
            for k, v in metrics.items()
            if np.ndim(v) == 0
        }
        rec = {"iter": n_iter, "tag": tag, **scalars}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{tag}/{k}", v, n_iter)
        if n_iter % self.echo_every == 0:
            brief = {k: round(v, 6) for k, v in scalars.items()}
            print(f"[{tag}] iter={n_iter} {brief}", flush=True)

    def log_histogram(self, n_iter: int, tag: str, values) -> None:
        """Weight/residual histograms (Train_model_pipeline.py:772-815)."""
        if self._tb:
            self._tb.add_histogram(tag, values, n_iter)

    def log_image(self, n_iter: int, tag: str, img) -> None:
        """Weight-heatmap images (Train_model_pipeline.py:998-1035)."""
        if self._tb:
            self._tb.add_image(tag, img, n_iter)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()


class Trainer:
    """Single- or multi-device trainer for the DeepFNet pipeline."""

    def __init__(
        self,
        net,
        cfg: Config,
        save_dir: Optional[str] = None,
        mesh=None,
        rng_seed: int = 0,
    ):
        self.net = net
        self.cfg = cfg
        self.save_dir = save_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = make_optimizer(cfg)
        self.train_step = make_train_step(net, self.tx, cfg)
        self.eval_step = make_eval_step(net, cfg)
        self.logger = MetricLogger(
            os.path.join(save_dir, "metrics.jsonl") if save_dir else None,
            tb_dir=(
                os.path.join(save_dir, "runs")
                if save_dir and cfg.training.tensorboard
                else None
            ),
        )
        self.rng_seed = rng_seed
        self.state: Optional[TrainState] = None
        self._best_val = float("inf")

    def init_state(self, example_batch: Dict) -> TrainState:
        batch = shard_batch(self.mesh, example_batch)
        init_rngs = {
            "params": jax.random.PRNGKey(self.rng_seed),
            "sample": jax.random.PRNGKey(self.rng_seed + 1),
        }
        params = self.net.init(init_rngs, batch)
        state = TrainState.create(params, self.tx)
        self.state = shard_params(self.mesh, state)
        return self.state

    def restore(self, path: str, example_batch: Dict) -> TrainState:
        template = self.init_state(example_batch)
        self.state = shard_params(self.mesh, load_checkpoint(path, template))
        return self.state

    @property
    def n_iter(self) -> int:
        return int(self.state.n_iter)

    def fit(
        self,
        train_stream: Iterable[Dict],
        val_stream_fn: Optional[Callable[[], Iterable[Dict]]] = None,
        max_iters: Optional[int] = None,
    ) -> Dict:
        cfg = self.cfg
        max_iters = max_iters or cfg.training.train_iter
        t0 = time.time()
        last = {}
        prof = cfg.training.profile_dir
        tracing = False
        for batch in train_stream:
            if self.state is None:
                self.init_state(batch)
            n_iter = self.n_iter
            if n_iter >= max_iters:
                break
            if prof and n_iter == cfg.training.profile_start:
                jax.profiler.start_trace(prof)
                tracing = True
            if tracing and n_iter == (
                cfg.training.profile_start + cfg.training.profile_steps
            ):
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                tracing = False
                prof = ""  # one capture per fit
            q_clamp, t_clamp = qt_clamps(cfg.training, n_iter)
            sharded = shard_batch(self.mesh, batch)
            self.state, metrics = self.train_step(
                self.state, sharded, q_clamp, t_clamp
            )
            self.logger.log(n_iter, "train", metrics)
            last = metrics

            # Val-in-train telemetry (Train_model_pipeline.py:197-233):
            # every val_interval_in_train steps, run the val-metric
            # computation over the next val_batches TRAINING batches and
            # flush the means under the reference's 'training' task tag.
            # (Deviation: the reference also flips the net to eval() for
            # the training updates inside the window; we keep the update
            # in train mode and only ADD the eval-mode telemetry pass.)
            vit = getattr(cfg.training, "val_interval_in_train", 0)
            if vit and vit > 0:
                if n_iter != 0 and n_iter % vit == 0:
                    self._vit_accum: Dict = {}
                    self._vit_count = 0
                if getattr(self, "_vit_count", None) is not None:
                    em = self.eval_step(self.state.params, sharded)
                    for k, v in em.items():
                        if np.ndim(v) == 0:
                            self._vit_accum[k] = (
                                self._vit_accum.get(k, 0.0)
                                + float(np.asarray(v))
                            )
                    self._vit_count += 1
                    if self._vit_count > cfg.training.val_batches:
                        means = {
                            k: v / self._vit_count
                            for k, v in self._vit_accum.items()
                        }
                        self.logger.log(n_iter, "training", means)
                        self._vit_count = None

            if (
                val_stream_fn is not None
                and cfg.training.val_interval > 0
                and (n_iter + 1) % cfg.training.val_interval == 0
            ):
                self.validate(val_stream_fn())
            if (
                self.save_dir
                and cfg.training.save_interval > 0
                and (n_iter + 1) % cfg.training.save_interval == 0
            ):
                self.save(n_iter + 1)
        if tracing:  # run ended inside the capture window
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        last["wall_s"] = time.time() - t0
        return last

    def validate(self, val_stream: Iterable[Dict]) -> Dict:
        accum, count = {}, 0
        first_sharded = None
        limit = self.cfg.training.val_batches
        for i, batch in enumerate(val_stream):
            if limit >= 0 and i >= limit:
                break
            sharded = shard_batch(self.mesh, batch)
            if first_sharded is None:
                first_sharded = sharded
            metrics = self.eval_step(self.state.params, sharded)
            for k, v in metrics.items():
                if np.ndim(v) == 0:
                    accum[k] = accum.get(k, 0.0) + float(np.asarray(v))
            count += 1
        means = {k: v / max(count, 1) for k, v in accum.items()}
        self.logger.log(self.n_iter, "val", means)
        # val_show_interval (Train_model_pipeline TB-image cadence): only
        # emit the heavy image/histogram summaries when this validation's
        # window crosses a multiple of the show interval.
        vsi = getattr(self.cfg.training, "val_show_interval", 0)
        show = (
            vsi <= 0
            or (self.n_iter % vsi) < max(self.cfg.training.val_interval, 1)
        )
        if self.logger._tb is not None and first_sharded is not None and show:
            self._log_val_inspection(first_sharded)
        # Best-checkpoint selection (the reference's model zoo picks specific
        # iterations by val; here it's automatic): keep the lowest val loss.
        key = "loss" if "loss" in means else "loss_F"
        if self.save_dir and means.get(key) is not None:
            if means[key] < self._best_val:
                self._best_val = means[key]
                save_checkpoint(
                    os.path.join(
                        self.save_dir, "checkpoints", "deepFNet_best_checkpoint.msgpack"
                    ),
                    self.state,
                )
        return means

    def _log_val_inspection(self, sharded_batch: Dict) -> None:
        """Predicted-weight / residual histograms and a per-item weight
        strip image for one val batch (the reference's per-layer histogram
        and weight-heatmap summaries, Train_model_pipeline.py:772-815,
        998-1035)."""
        if not hasattr(self, "_inspect_step"):
            mcfg = self.cfg.model

            @jax.jit
            def inspect(params, batch):
                rngs = (
                    {"sample": jax.random.PRNGKey(0)}
                    if mcfg.if_sample_loss
                    else None
                )
                outs = self.net.apply(params, batch, rngs=rngs)
                return {
                    "weights": outs["weights"],
                    "epi_res": outs["epi_res_layers"][-1],
                    "residual": outs["residual_layers"][-1],
                }

            self._inspect_step = inspect
        outs = jax.device_get(
            self._inspect_step(self.state.params, sharded_batch)
        )
        n = self.n_iter
        w = np.asarray(outs["weights"])  # [B, N] softmax weights
        self.logger.log_histogram(n, "val/weights", w)
        self.logger.log_histogram(n, "val/epi_res", outs["epi_res"])
        self.logger.log_histogram(n, "val/residual", outs["residual"])
        # Weight strip: rows = batch items, columns = points sorted by
        # weight, intensity normalized per item — shows how peaked the
        # correspondence weighting is at a glance.
        w2 = w.reshape(w.shape[0], -1)
        strip = np.sort(w2, axis=1)[:, ::-1]
        strip = strip / (strip.max(axis=1, keepdims=True) + 1e-12)
        self.logger.log_image(n, "val/weights_strip", strip.astype(np.float32))

    def save(self, n_iter: int) -> str:
        path = os.path.join(
            self.save_dir, "checkpoints", f"deepFNet_{n_iter}_checkpoint.msgpack"
        )
        save_checkpoint(path, self.state)
        return path
