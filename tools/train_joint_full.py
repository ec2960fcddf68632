"""Full-pipeline (SuperPoint frontend + DeepF solver) staged training.

The reference's end-to-end recipe steps 2-3 (README.md:95-119): start
from a pretrained SuperPoint and a (optionally pretrained) DeepF, first
train the solver with the frontend FROZEN, then fine-tune both
end-to-end (gradients flow loss -> solver -> matches = xs + offsets ->
soft-argmax -> CNN inside one jitted step, train/joint.py).

Data: textured synthetic image pairs with exact gt geometry
(data/synthetic_images.py). Eval: median err_q/err_t of the solver's E
vs gt, plus the vmapped RANSAC baseline on the SAME SuperPoint matches.

Usage:
  python tools/train_joint_full.py --sp experiments/sp_full/sp_final.msgpack \
      --out experiments/joint_full --stage1_iters 2000 --stage2_iters 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from flax import serialization

from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
from deepfepe_tpu.frontend import (
    FrontendParams,
    SuperPointNet,
    SuperPointNetGauss2,
    get_matches_from_sp,
)
from deepfepe_tpu.models import DeepFNet
from deepfepe_tpu.train import Config
from deepfepe_tpu.train.joint import (
    JointTrainState,
    build_solver_batch,
    make_joint_eval_step,
    make_joint_train_step,
)

IMG = (120, 160)  # default; override with --image
NPTS = 200        # default; override with --npts


def evaluate(deepf_net, sp_net, fp, cfg, state, ds_eval, batches, key):
    from deepfepe_tpu.eval import val_rt_batch

    from deepfepe_tpu.geometry import sym_epi_dist

    ev = make_joint_eval_step(deepf_net, sp_net, fp, cfg)
    eq, et, eqb, etb, nmatch, inl = [], [], [], [], [], []
    for _ in range(batches):
        b = {k: jnp.asarray(v) for k, v in ds_eval.batch(8).items()}
        m = ev(state.deepf_params, state.sp_params, b)
        key, sub = jax.random.split(key)
        rt = val_rt_batch(
            m["E_ests"], b["Ks"], m["matches_xy"], b["E_gts"],
            b["delta_Rtijs_4_4"], ransac_key=sub,
        )
        eq.append(np.asarray(rt["err_q_est"]))
        et.append(np.asarray(rt["err_t_est"]))
        eqb.append(np.asarray(rt["err_q_base"]))
        etb.append(np.asarray(rt["err_t_base"]))
        nmatch.append(float(np.asarray(m["num_matches"])))
        # Match quality vs gt epipolar geometry (diagnoses the frontend
        # separately from the solver): fraction of matches within 1 px.
        d = np.asarray(sym_epi_dist(  # squared symmetric epi distance
            b["F_gts"], m["matches_xy"][..., :2], m["matches_xy"][..., 2:],
            if_homo=False,
        ))
        inl.append(float((d < 1.0).mean()))
    return {
        "median_err_q": round(float(np.median(np.concatenate(eq))), 4),
        "median_err_t": round(float(np.median(np.concatenate(et))), 4),
        "median_err_q_ransac": round(float(np.median(np.concatenate(eqb))), 4),
        "median_err_t_ransac": round(float(np.median(np.concatenate(etb))), 4),
        "mean_num_matches": round(float(np.mean(nmatch)), 1),
        "gt_epi_inlier_1px": round(float(np.mean(inl)), 4),
    }


def main():
    global IMG, NPTS
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", default="", help="pretrained SP msgpack "
                    "('' = random init)")
    ap.add_argument("--deepf", default="", help="optional DeepF msgpack")
    ap.add_argument("--out", default="experiments/joint_full")
    ap.add_argument("--stage1_iters", type=int, default=2000)
    ap.add_argument("--stage2_iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr_deepf", type=float, default=1e-4)
    ap.add_argument("--lr_sp", type=float, default=1e-6)
    ap.add_argument("--grad_clip", type=float, default=1.0,
                    help="global-norm gradient clip (0 disables); the "
                         "8-point VJP is heavy-tailed on outlier-dense SP "
                         "matches and un-clipped Adam random-walks uphill")
    ap.add_argument("--eval_batches", type=int, default=6)
    ap.add_argument("--image", type=int, nargs=2, default=list(IMG))
    ap.add_argument("--npts", type=int, default=NPTS)
    ap.add_argument("--t_scale", type=float, default=0.15)
    ap.add_argument("--depths", type=float, nargs="+", default=[6.0, 12.0],
                    help="plane depths; translation observability ~ "
                         "focal*t_scale*(1/min-1/max) px of parallax")
    ap.add_argument("--depth_jitter", type=float, default=0.0)
    ap.add_argument("--n_blobs", type=int, default=60)
    ap.add_argument("--n_corners", type=int, default=0,
                    help="hard-edged corner stamps per plane texture; "
                         "pure blobs starve the detector (~20 matches/pair)")
    ap.add_argument("--conf", type=float, default=0.010)
    ap.add_argument("--nn_thresh", type=float, default=0.9)
    ap.add_argument("--clamp_at", type=float, default=0.02,
                    help="F-loss residual clamp; the reference's 0.02 "
                         "saturates on noisy SP matches — a looser clamp "
                         "gives the early iterations gradient signal")
    ap.add_argument("--qt", action="store_true",
                    help="train with the pose (q,t) loss instead of the "
                         "F-loss (the reference's stage-2 recipe) — "
                         "optimizes the eval metric directly, which the "
                         "clamped F-loss only tracks loosely on noisy SP "
                         "matches (see ROADMAP joint-fine-tune study)")
    ap.add_argument("--balance_q", type=float, default=1.0)
    ap.add_argument("--balance_t", type=float, default=1.0)
    ap.add_argument("--gauss2", action="store_true",
                    help="SuperPointNetGauss2 bf16 frontend (the "
                         "reference production net; BN on running stats)")
    ap.add_argument("--clamp_curriculum", action="store_true",
                    help="use the reference qt-clamp curriculum "
                         "(Train_model_pipeline.py:467-489 via "
                         "config.qt_clamps) instead of fixed (0.1, 0.5)")
    ap.add_argument("--clamp_iter1", type=int, default=3000)
    ap.add_argument("--clamp_iter2", type=int, default=6000)
    ap.add_argument("--clamp_quantile", type=float, default=0.0,
                    help=">0 enables the quantile-tied clamp scheduler "
                         "(train/clamp.py): clamps tighten only when the "
                         "measured per-item error quantile (this value, "
                         "e.g. 0.7) is inside them — fixes the round-4 "
                         "saturation failure of iteration schedules on "
                         "short runs. Overrides --clamp_curriculum.")
    ap.add_argument("--clamp_headroom", type=float, default=1.5)
    ap.add_argument("--clamp_check_every", type=int, default=50)
    ap.add_argument("--clamp_q0", type=float, default=0.1,
                    help="scheduler start q clamp (reference loosest)")
    ap.add_argument("--clamp_t0", type=float, default=0.5,
                    help="scheduler start t clamp; when median t errors "
                         "exceed the reference's loosest 0.5 (chord "
                         "units; 0.5 ~ 29 deg) a looser start keeps "
                         "gradient signal — measured: r5_long_qt slid "
                         "into full saturation at 0.5")
    ap.add_argument("--save_every", type=int, default=0,
                    help="also checkpoint every N iters inside a stage "
                         "(tag <stage>_it<N>); 0 = stage-end only")
    ap.add_argument("--bn_recalib", type=int, default=0,
                    help="before the end-to-end stage, run N buffer-only "
                         "train-mode BN forwards (no optimizer) so the "
                         "running stats converge to the production data "
                         "domain first — removes the eval->train BN mode "
                         "shock when the pretrain's stats are stale "
                         "(measured: matches halve at stage-2 iter 0 "
                         "without it, experiments/r5_bn_train_ab)")
    ap.add_argument("--bn_mode", default="train",
                    choices=["train", "frozen"],
                    help="BatchNorm mode while SP trains end-to-end: "
                         "'train' = reference parity (batch stats + "
                         "momentum buffer updates, "
                         "Train_model_pipeline.py:367-377), 'frozen' = "
                         "round-4 inference-BN behavior")
    args = ap.parse_args()
    IMG = tuple(args.image)
    NPTS = args.npts
    os.makedirs(args.out, exist_ok=True)
    mf = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        print(json.dumps(rec), flush=True)
        mf.write(json.dumps(rec) + "\n")
        mf.flush()

    cfg = Config()
    cfg.model.depth = 5
    cfg.model.if_quality = True
    cfg.model.clamp_at = args.clamp_at
    cfg.training.clamp_iter1 = args.clamp_iter1
    cfg.training.clamp_iter2 = args.clamp_iter2
    cfg.data.good_num = NPTS
    cfg.data.batch_size = args.batch
    if args.qt:
        cfg.model.if_qt_loss = True
        cfg.model.balance_q = args.balance_q
        cfg.model.balance_t = args.balance_t

    focal = 140.0 * IMG[1] / 160.0
    mk = dict(image_size=IMG, focal=focal, t_scale=args.t_scale,
              depths=tuple(args.depths), depth_jitter=args.depth_jitter,
              n_blobs=args.n_blobs, n_corners=args.n_corners)
    ds = SyntheticImagePairs(**mk, seed=0)
    ds_eval = SyntheticImagePairs(**mk, seed=777)

    sp_net = SuperPointNetGauss2(dtype=jnp.bfloat16) if args.gauss2 \
        else SuperPointNet()
    deepf_net = DeepFNet(
        depth=5, image_size=IMG, if_quality=True, mlp_dtype=jnp.bfloat16
    )
    fp = FrontendParams(out_num_points=NPTS, conf_thresh=args.conf,
                        nn_thresh=args.nn_thresh)

    batch = {k: jnp.asarray(v) for k, v in ds.batch(args.batch).items()}
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    if args.sp:
        with open(args.sp, "rb") as f:
            sp_params = serialization.from_bytes(sp_params, f.read())
    sp_out = get_matches_from_sp(
        sp_net, sp_params, (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]),
        fp,
    )
    db = build_solver_batch(sp_out, batch)
    deepf_params = deepf_net.init(jax.random.PRNGKey(1), db)
    if args.deepf:
        with open(args.deepf, "rb") as f:
            deepf_params = serialization.from_bytes(deepf_params, f.read())

    def make_tx(lr):
        if args.grad_clip > 0:
            return optax.chain(
                optax.clip_by_global_norm(args.grad_clip), optax.adam(lr)
            )
        return optax.adam(lr)

    tx_deepf = make_tx(args.lr_deepf)
    tx_sp = make_tx(args.lr_sp)
    state = JointTrainState.create(deepf_params, sp_params, tx_deepf, tx_sp)

    def save(tag):
        for name, params in [
            ("deepF", state.deepf_params), ("superPoint", state.sp_params)
        ]:
            p = os.path.join(args.out, f"{name}_{tag}.msgpack")
            with open(p, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(params)))

    key = jax.random.PRNGKey(3)
    global_it = 0
    from deepfepe_tpu.train.clamp import QuantileClampScheduler

    # One scheduler across stages: the clamps carry over (monotone
    # tightening follows the error distribution, not stage boundaries).
    sched = None
    if args.clamp_quantile > 0 and args.qt:
        sched = QuantileClampScheduler(
            q0=args.clamp_q0, t0=args.clamp_t0,
            quantile=args.clamp_quantile,
            headroom=args.clamp_headroom,
            check_every=args.clamp_check_every,
        )
    log({"stage": "eval_init",
         **evaluate(deepf_net, sp_net, fp, cfg, state, ds_eval,
                    args.eval_batches, key)})

    for stage, iters, train_sp in [
        ("stage1_frozen_sp", args.stage1_iters, False),
        ("stage2_end_to_end", args.stage2_iters, True),
    ]:
        if iters == 0:
            continue
        step = make_joint_train_step(
            deepf_net, sp_net, fp, tx_deepf, tx_sp, cfg,
            train_deepf=True, train_sp=train_sp, bn_mode=args.bn_mode,
        )
        if (
            train_sp and args.bn_recalib > 0 and args.bn_mode == "train"
            and isinstance(state.sp_params, dict)
            and "batch_stats" in state.sp_params
        ):
            @jax.jit
            def _recalib(sp_params, imgs):
                out = get_matches_from_sp(
                    sp_net, sp_params, (imgs[:, 0], imgs[:, 1]), fp,
                    bn_train=True,
                )
                sp_params = dict(sp_params)
                sp_params["batch_stats"] = out["new_batch_stats"]
                return sp_params, jnp.sum(
                    out["valid"].astype(jnp.float32)
                ) / imgs.shape[0]

            sp_params = state.sp_params
            nm = -1.0
            for _ in range(args.bn_recalib):
                rb = {k: jnp.asarray(v)
                      for k, v in ds.batch(args.batch).items()}
                sp_params, nm = _recalib(sp_params, rb["imgs_grey"])
            state = state.replace(sp_params=sp_params)
            log({"stage": f"bn_recalib_before_{stage}",
                 "iters": args.bn_recalib,
                 "train_mode_matches": round(float(np.asarray(nm)), 1)})
        # Host-side threaded prefetch: rendering is numpy (releases the
        # GIL), so 3 workers overlap data gen with the device step.
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue(maxsize=6)
        stop = _threading.Event()

        def _worker(wseed):
            wds = SyntheticImagePairs(**mk, seed=wseed)
            while not stop.is_set():
                try:
                    q.put(wds.batch(args.batch), timeout=1.0)
                except _queue.Full:
                    continue

        workers = [
            _threading.Thread(target=_worker, args=(1000 + w,), daemon=True)
            for w in range(3)
        ]
        for w in workers:
            w.start()
        t0 = time.time()
        from deepfepe_tpu.train.config import qt_clamps

        skipped = 0
        qc, tc = 0.1, 0.5
        for it in range(iters):
            b = {k: jnp.asarray(v) for k, v in q.get().items()}
            if sched is not None:
                qc, tc = sched.clamps
            elif args.clamp_curriculum:
                qc, tc = qt_clamps(cfg.training, global_it)
            state, m = step(state, b, qc, tc)
            global_it += 1
            if args.save_every > 0 and (it + 1) % args.save_every == 0:
                save(f"{stage}_it{it + 1}")
            skipped += int(float(np.asarray(m.get("skipped_update", 0.0))))
            if sched is not None:
                sched.update(np.asarray(m["q_l2_final"]),
                             np.asarray(m["t_l2_final"]))
            if it % 100 == 0 or it == iters - 1:
                log({"stage": stage, "iter": it,
                     "loss": round(float(np.asarray(m["loss"])), 6),
                     "q_clamp": round(qc, 5), "t_clamp": round(tc, 5),
                     "num_matches": round(float(np.asarray(
                         m.get("num_matches", -1.0))), 1),
                     "skipped_total": skipped,
                     **({"clamp_tightenings": sched.n_tightenings,
                         "clamp_loosenings": sched.n_loosenings}
                        if sched is not None else {}),
                     "g_deepf": round(float(np.asarray(m["g_deepf_norm"])), 3),
                     "g_sp": round(float(np.asarray(m["g_sp_norm"])), 3),
                     "elapsed_s": round(time.time() - t0, 1)})
        stop.set()
        save(stage)
        key, sub = jax.random.split(key)
        log({"stage": f"eval_after_{stage}",
             **evaluate(deepf_net, sp_net, fp, cfg, state, ds_eval,
                        args.eval_batches, sub)})
    mf.close()


if __name__ == "__main__":
    main()
