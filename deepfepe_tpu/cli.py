"""Command-line entry points (parity: deepFEPE/train_good.py :339-400).

Subcommands:
  train_good <config.yaml> <exper_name>   — train (and periodically validate)
  eval_good  <config.yaml> <exper_name>   — full-validation eval + npz dumps

Usage: python -m deepfepe_tpu.cli train_good configs/synthetic_baseline.yaml exp0
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

import jax


def _build(args):
    import yaml

    from .loader import data_loader, model_loader
    from .train import Trainer, load_config

    cfg = load_config(args.config)
    if getattr(args, "train_iter", None) is not None:
        cfg.training.train_iter = args.train_iter
    if getattr(args, "profile_dir", ""):
        cfg.training.profile_dir = args.profile_dir
    save_dir = os.path.join("logs", args.exper_name)
    os.makedirs(save_dir, exist_ok=True)
    # Snapshot the config (ref: train_good.py:114).
    with open(os.path.join(save_dir, "config.yml"), "w") as f:
        yaml.safe_dump(json.loads(json.dumps(cfg, default=vars)), f)

    net = model_loader(cfg)
    trainer = Trainer(net, cfg, save_dir=save_dir)
    return cfg, net, trainer, save_dir


def cmd_train(args):
    from .train import load_config

    cfg = load_config(args.config)
    if cfg.model.if_SP:
        # The reference's flagship end-to-end mode (if_SP=true in
        # kitti_corr_baseline.yaml): joint SuperPoint + DeepF training.
        return _train_joint_from_config(args)
    cfg, net, trainer, save_dir = _build(args)
    from .loader import data_loader

    train_ds = data_loader(cfg, "train")
    val_ds = data_loader(cfg, "val")
    bs = cfg.data.batch_size

    # Checkpoint restore: CLI flag first, else the config's
    # pretrained/retrain pair (train_good.py:282-336 prepare_model —
    # retrain=true means fresh model, reset_iter zeroes the counter).
    pre = args.pretrained or (
        "" if cfg.training.retrain else cfg.training.pretrained
    )
    if pre:
        first = next(iter(train_ds.batches(bs)))
        trainer.restore(pre, first)
        if cfg.training.reset_iter and trainer.state is not None:
            trainer.state = trainer.state.replace(
                n_iter=jax.numpy.zeros_like(trainer.state.n_iter)
            )
        print(f"restored from {pre} @ iter {trainer.n_iter}")

    def cycle():
        # Epoch datasets (the dump loaders) yield ONE pass per batches()
        # call; fit() must see an endless stream up to train_iter, as the
        # reference's `while True: train_epoch()` loop does
        # (train_good.py:270-276).
        while True:
            empty = True
            for b in train_ds.batches(bs):
                empty = False
                yield b
            if empty:
                raise RuntimeError("train dataset produced no batches")

    from .data.prefetch import prefetch_batches

    last = trainer.fit(
        # Background producer ahead of the device (data/prefetch.py — the
        # DataLoader-workers role; workers_train bounds the queue depth).
        prefetch_batches(
            cycle(),
            depth=max(2, min(int(cfg.training.workers_train), 8)),
        ),
        val_stream_fn=lambda: val_ds.batches(bs),
        max_iters=cfg.training.train_iter,
    )
    trainer.save(trainer.n_iter)
    print(json.dumps({k: float(np.asarray(v)) for k, v in last.items()
                      if np.ndim(v) == 0}))


def _train_joint_from_config(args):
    """Config-driven joint SuperPoint + DeepF training (model.if_SP=true
    — the reference's end-to-end mode, train_good.py:198-251:
    SuperPointNet_gauss2 + SP_processer/tracker + two optimizers with
    train/train_SP gating, pretrained/pretrained_SP restore).

    Frontend flags consumed from the config: training.SP_params ->
    FrontendParams, pretrained_SP/retrain_SP (msgpack or reference
    .pth.tar), train_SP (frozen stage-1 vs end-to-end stage-2),
    reset_iter. BatchNorm runs the reference's train-mode semantics
    while SP trains (train/joint.py bn_mode='train')."""
    import optax
    import yaml
    from flax import serialization

    from .frontend import (
        SuperPointNetGauss2,
        frontend_params_from_config,
        get_matches_from_sp,
    )
    from .loader import data_loader, model_loader
    from .train import MetricLogger, load_config
    from .train.config import qt_clamps
    from .train.joint import (
        JointTrainState,
        build_solver_batch,
        make_joint_train_step,
    )

    cfg = load_config(args.config)
    if getattr(args, "train_iter", None) is not None:
        cfg.training.train_iter = args.train_iter
    cfg.data.with_imgs = True  # the SP path needs the grayscale frames
    save_dir = os.path.join("logs", args.exper_name)
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "config.yml"), "w") as f:
        yaml.safe_dump(json.loads(json.dumps(cfg, default=vars)), f)

    train_ds = data_loader(cfg, "train")
    bs = cfg.data.batch_size
    batch0 = next(iter(train_ds.batches(bs)))
    if "imgs_grey" not in batch0:
        raise SystemExit(
            "if_SP training needs image batches: use a dump dataset "
            "with read_what.with_imgs or dataset: synthetic_images"
        )
    import jax.numpy as jnp

    batch0 = {k: jnp.asarray(v) for k, v in batch0.items()}

    mlp_bf16 = cfg.model.mlp_dtype == "bfloat16"
    sp_net = SuperPointNetGauss2(
        dtype=jnp.bfloat16 if mlp_bf16 else jnp.float32
    )
    deepf_net = model_loader(cfg)
    fp = frontend_params_from_config(cfg)

    sp_vars = sp_net.init(
        jax.random.PRNGKey(cfg.training.seed),
        batch0["imgs_grey"][:, 0][..., None],
    )
    if not cfg.training.retrain_SP and cfg.training.pretrained_SP:
        path = cfg.training.pretrained_SP
        if path.endswith((".pth", ".pth.tar")):
            from .utils.torch_import import load_reference_checkpoint

            sp_vars, _ = load_reference_checkpoint(path, kind="auto")
        else:
            with open(path, "rb") as f:
                sp_vars = serialization.from_bytes(sp_vars, f.read())
    sp_out = get_matches_from_sp(
        sp_net, sp_vars,
        (batch0["imgs_grey"][:, 0], batch0["imgs_grey"][:, 1]), fp,
    )
    db = build_solver_batch(sp_out, batch0)
    deepf_params = deepf_net.init(jax.random.PRNGKey(1), db)
    pre = args.pretrained or (
        "" if cfg.training.retrain else cfg.training.pretrained
    )
    if pre:
        if pre.endswith((".pth", ".pth.tar")):
            from .utils.torch_import import load_reference_checkpoint

            deepf_params, _ = load_reference_checkpoint(pre, kind="deepf")
        else:
            with open(pre, "rb") as f:
                deepf_params = serialization.from_bytes(
                    deepf_params, f.read()
                )

    # Reference parity: BOTH optimizers use training.learning_rate
    # (prepare_model builds each Adam from the same config knob,
    # train_good.py:317).
    tx_deepf = optax.adam(cfg.training.learning_rate)
    tx_sp = optax.adam(cfg.training.learning_rate)
    state = JointTrainState.create(deepf_params, sp_vars, tx_deepf, tx_sp)
    step = make_joint_train_step(
        deepf_net, sp_net, fp, tx_deepf, tx_sp, cfg,
        train_deepf=cfg.training.train,
        train_sp=cfg.training.train_SP,
    )
    logger = MetricLogger(
        os.path.join(save_dir, "metrics.jsonl"),
        tb_dir=os.path.join(save_dir, "runs")
        if cfg.training.tensorboard else None,
    )

    def save(n):
        ckpt_dir = os.path.join(save_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        for name, params in [
            ("deepFNet", state.deepf_params),
            ("superPointNet", state.sp_params),
        ]:
            p = os.path.join(ckpt_dir, f"{name}_{n}_checkpoint.msgpack")
            with open(p, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(params)))

    def cycle():
        while True:
            empty = True
            for b in train_ds.batches(bs):
                empty = False
                yield b
            if empty:
                raise RuntimeError("train dataset produced no batches")

    from .data.prefetch import prefetch_batches

    last = {}
    stream = prefetch_batches(
        cycle(), depth=max(2, min(int(cfg.training.workers_train), 8))
    )
    for it, b in enumerate(stream):
        if it >= cfg.training.train_iter:
            break
        b = {k: jnp.asarray(v) for k, v in b.items()}
        qc, tc = qt_clamps(cfg.training, it)
        state, m = step(state, b, qc, tc)
        logger.log(it, "train", m)
        last = m
        if (
            cfg.training.save_interval > 0
            and (it + 1) % cfg.training.save_interval == 0
        ):
            save(it + 1)
    save(int(np.asarray(state.n_iter)))
    out = {k: float(np.asarray(v)) for k, v in last.items()
           if np.ndim(v) == 0}
    print(json.dumps(out))
    return out


def cmd_eval(args):
    cfg, net, trainer, save_dir = _build(args)
    from .eval import inlier_ratios, val_rt_batch
    from .loader import data_loader
    from .parallel import shard_batch

    val_ds = data_loader(cfg, "test")
    bs = cfg.data.batch_size
    first = next(iter(val_ds.batches(bs)))
    if args.pretrained:
        trainer.restore(args.pretrained, first)
    else:
        trainer.init_state(first)

    refine_fn = None
    if getattr(args, "refine_ba", False):
        from .eval.refine import refine_two_view_batch

        min_m = int(getattr(args, "refine_min_matches", 200))
        refine_fn = jax.jit(
            lambda m, w, K, R, t: refine_two_view_batch(
                m, w, K, R, t, iters=5, min_matches=min_m
            )
        )

    results = {"err_q": [], "err_t": [], "err_q_base": [], "err_t_base": [],
               "err_q_gt": [], "err_t_gt": [], "M_cam_est": [],
               "M_cam_base": [], "epi_dists_est": [], "epi_dists_base": [],
               "Rt_cam2_gt": []}
    key = jax.random.PRNGKey(0)
    count = 0
    try:
        # Deterministic pair order + keep the tail: the reference's eval
        # iterates the whole val split unshuffled (train_good.py
        # val_shuffle=False under --test, torch DataLoader drop_last
        # default False), and the npz dumps are consumed positionally by
        # the VO chain / parity diffs.
        batch_iter = val_ds.batches(bs, shuffle=False, drop_last=False)
    except TypeError:  # synthetic stream: infinite, already deterministic
        batch_iter = val_ds.batches(bs)

    def _pad_batch(batch, n_real):
        # A short final batch is padded by repeating its last item so the
        # jitted eval keeps one static shape; padded rows are trimmed from
        # the results below.
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if v.ndim and v.shape[0] == n_real:
                reps = np.repeat(v[-1:], bs - n_real, axis=0)
                v = np.concatenate([v, reps], axis=0)
            out[k] = v
        return out

    for batch in batch_iter:
        if args.max_batches and count >= args.max_batches:
            break
        n_real = int(np.asarray(batch["Ks"]).shape[0])
        if n_real < bs:
            batch = _pad_batch(batch, n_real)
        sharded = shard_batch(trainer.mesh, batch)
        metrics = trainer.eval_step(trainer.state.params, sharded)
        key, sub = jax.random.split(key)
        rt = val_rt_batch(
            metrics["E_ests"],
            sharded["Ks"],
            sharded["matches_xy_ori"],
            sharded["E_gts"],
            sharded["delta_Rtijs_4_4"],
            ransac_key=sub,
            five_point=cfg.exps.five_point,
        )
        eq_est = np.asarray(rt["err_q_est"])
        et_est = np.asarray(rt["err_t_est"])
        M_cam_est = np.asarray(rt["M_cam_est"])
        if refine_fn is not None:
            import jax.numpy as jnp

            from .geometry.basic import rt_inverse
            from .geometry.rotations import rotation_angle_error, vector_angle

            # Refine the FORWARD (i->j) pose M_est; the npz schema and the
            # reference's error stats use the inverted (camera) convention
            # (val_rt._pose_errors), so invert after.
            M_fwd = np.asarray(rt["M_est"])
            R_ref, t_ref, _ = refine_fn(
                jnp.asarray(sharded["matches_xy_ori"], jnp.float32),
                jnp.asarray(metrics["weights"], jnp.float32),
                jnp.asarray(sharded["Ks"], jnp.float32),
                jnp.asarray(M_fwd[:, :3, :3], jnp.float32),
                jnp.asarray(M_fwd[:, :3, 3], jnp.float32),
            )
            Rt_fwd = jnp.concatenate([R_ref, t_ref[..., None]], axis=-1)
            Rt_cam = rt_inverse(Rt_fwd)
            M_cam_est = np.asarray(Rt_cam).astype(np.float32)
            gt_inv = np.linalg.inv(np.asarray(sharded["delta_Rtijs_4_4"]))
            eq_est = np.asarray(
                rotation_angle_error(
                    Rt_cam[:, :3, :3], jnp.asarray(gt_inv[:, :3, :3])
                )
            )
            et_raw = np.asarray(
                vector_angle(
                    Rt_cam[:, :3, 3], jnp.asarray(gt_inv[:, :3, 3])
                )
            )
            et_est = np.minimum(et_raw, 180.0 - et_raw)
        results["err_q"].append(eq_est[:n_real])
        results["err_t"].append(et_est[:n_real])
        results["err_q_base"].append(np.asarray(rt["err_q_base"])[:n_real])
        results["err_t_base"].append(np.asarray(rt["err_t_base"])[:n_real])
        results["err_q_gt"].append(np.asarray(rt["err_q_gt"])[:n_real])
        results["err_t_gt"].append(np.asarray(rt["err_t_gt"])[:n_real])
        results["M_cam_est"].append(M_cam_est[:n_real])
        results["M_cam_base"].append(np.asarray(rt["M_cam_base"])[:n_real])
        results["epi_dists_est"].append(
            np.asarray(rt["epi_dists_est"])[:n_real]
        )
        results["epi_dists_base"].append(
            np.asarray(rt["epi_dists_base"])[:n_real]
        )
        results["Rt_cam2_gt"].append(
            (np.asarray(sharded["Rt_cam2_gt"])
             if "Rt_cam2_gt" in sharded
             else np.tile(np.eye(4, dtype=np.float32), (bs, 1, 1)))[:n_real]
        )
        count += 1

    out = {k: np.concatenate(v) for k, v in results.items() if v}

    def to_body(M_cam, Rt2):
        """Camera-frame -> body-frame relative pose: inv(Rt_cam2_gt) @ M @
        Rt_cam2_gt (Train_model_pipeline.py:1098-1119), [B, 3, 4] in/out."""
        pad = np.tile(np.array([[[0.0, 0, 0, 1]]]), (len(M_cam), 1, 1))
        M44 = np.concatenate([M_cam, pad], axis=1)
        body = np.linalg.inv(Rt2) @ M44 @ Rt2
        return body[:, :3, :]

    # npz dumps named as the reference does ({our,base}_name + filename),
    # with the reference's key set: err_q/err_t, epi_dists (first 10 pts),
    # relative_poses_cam and relative_poses_body.
    np.savez(
        Path(save_dir) / f"{cfg.exps.our_name}_{cfg.exps.filename}",
        err_q=out["err_q"], err_t=out["err_t"],
        epi_dists=out["epi_dists_est"][:, :10],
        relative_poses_cam=out["M_cam_est"],
        relative_poses_body=to_body(out["M_cam_est"], out["Rt_cam2_gt"]),
    )
    np.savez(
        Path(save_dir) / f"{cfg.exps.base_name}_{cfg.exps.filename}",
        err_q=out["err_q_base"], err_t=out["err_t_base"],
        epi_dists=out["epi_dists_base"][:, :10],
        relative_poses_cam=out["M_cam_base"],
        relative_poses_body=to_body(out["M_cam_base"], out["Rt_cam2_gt"]),
    )
    summary = {
        "median_err_q": float(np.median(out["err_q"])),
        "median_err_t": float(np.median(out["err_t"])),
        "median_err_q_base": float(np.median(out["err_q_base"])),
        "median_err_t_base": float(np.median(out["err_t_base"])),
        "median_err_q_gt": float(np.median(out["err_q_gt"])),
        "pairs": int(len(out["err_q"])),
    }
    print(json.dumps(summary))
    return summary


def cmd_eval_vo(args):
    """Full VO evaluation: estimate every consecutive pair, chain, export the
    KITTI 12-col trajectory, report trans%/rot/ATE/RPE (the reference's
    eval_good -> notebook -> kitti-odom-eval pipeline as ONE command)."""
    import jax.numpy as jnp

    from .eval import (
        chain_relative_poses,
        evaluate_sequence,
        export_poses_kitti,
        val_rt_batch,
    )
    from .parallel import shard_batch
    from .train import load_config

    cfg, net, trainer, save_dir = _build(args)
    bs = cfg.data.batch_size

    if cfg.data.dataset == "synthetic":
        from .data.synthetic_sequence import SyntheticSequence

        seq = SyntheticSequence(
            n_frames=args.n_frames or 60,
            good_num=cfg.data.good_num,
            noise_px=cfg.data.noise_px,
            outlier_frac=cfg.data.outlier_frac,
            seed=123,
        )
        batch_iter = seq.pair_batches(bs)
        gt_traj = seq.gt_trajectory()
        lengths = (5.0, 10.0, 20.0, 40.0)
    else:
        from .loader import data_loader

        ds = data_loader(cfg, "test")
        batch_iter = ds.ordered_pair_batches(bs, scene_name=args.scene or None)
        gt_traj = None  # chained below from gt relative poses
        lengths = None  # KITTI default 100..800m
    if args.lengths:
        lengths = tuple(float(x) for x in args.lengths.split(","))

    first = None
    key = jax.random.PRNGKey(0)
    use_baseline = args.baseline
    refine_fn = None
    if getattr(args, "refine_ba", False):
        from .eval.refine import refine_two_view_batch

        min_m = int(getattr(args, "refine_min_matches", 200))
        refine_fn = jax.jit(
            lambda m, w, K, R, t: refine_two_view_batch(
                m, w, K, R, t, iters=5, min_matches=min_m
            )
        )

    def run_pass(batch_iter):
        """One ordered sweep: per-pair M estimates (+gt, errors, gt scale)."""
        nonlocal first, key
        rels_est, rels_gt, errqs, errts, scales = [], [], [], [], []
        for batch in batch_iter:
            b = shard_batch(trainer.mesh, batch)
            if first is None:
                first = batch
                if trainer.state is None:
                    if args.pretrained:
                        trainer.restore(args.pretrained, batch)
                    else:
                        trainer.init_state(batch)
            key, sub = jax.random.split(key)
            metrics = trainer.eval_step(trainer.state.params, b)
            E_est = metrics["E_ests"]
            rt = val_rt_batch(
                E_est, b["Ks"], b["matches_xy_ori"], b["E_gts"],
                b["delta_Rtijs_4_4"],
                ransac_key=sub if use_baseline else None,
                five_point=cfg.exps.five_point,
            )
            M = np.asarray(rt["M_base" if use_baseline else "M_est"])
            eq = np.asarray(rt["err_q_base" if use_baseline else "err_q_est"])
            et = np.asarray(rt["err_t_base" if use_baseline else "err_t_est"])
            if refine_fn is not None and not use_baseline:
                # Two-view sqrt-BA polish (eval/refine.py): triangulate with
                # the solver pose, few damped-GN iterations, learned weights
                # as robust residual weights.
                from .geometry.rotations import (
                    rotation_angle_error,
                    vector_angle,
                )

                # f32 throughout: the square-root formulation keeps GN
                # convergence without f64 (the point of ba/sqrt_ba.py).
                R_ref, t_ref, _ = refine_fn(
                    b["matches_xy_ori"].astype(jnp.float32),
                    metrics["weights"].astype(jnp.float32),
                    b["Ks"].astype(jnp.float32),
                    jnp.asarray(M[:, :3, :3], jnp.float32),
                    jnp.asarray(M[:, :3, 3], jnp.float32),
                )
                M = np.concatenate(
                    [np.asarray(R_ref), np.asarray(t_ref)[..., None]], -1
                ).astype(np.float32)
                gtR = jnp.asarray(
                    np.asarray(batch["delta_Rtijs_4_4"])[:, :3, :3]
                )
                gtt = jnp.asarray(
                    np.asarray(batch["delta_Rtijs_4_4"])[:, :3, 3]
                )
                eq = np.asarray(rotation_angle_error(R_ref, gtR))
                et_raw = np.asarray(vector_angle(t_ref, gtt))
                et = np.minimum(et_raw, 180.0 - et_raw)
            frames = (
                np.asarray(batch["frame_i"]) if "frame_i" in batch else None
            )
            for i in range(M.shape[0]):
                fidx = int(frames[i]) if frames is not None else len(rels_est)
                if fidx == len(rels_est):  # skip padded duplicates
                    rels_est.append(M[i])
                    rels_gt.append(np.asarray(batch["delta_Rtijs_4_4"][i]))
                    errqs.append(float(eq[i]))
                    errts.append(float(et[i]))
                    scales.append(
                        float(batch["t_scene_scale"][i])
                        if "t_scene_scale" in batch
                        else float(np.linalg.norm(
                            np.asarray(batch["delta_Rtijs_4_4"][i][:3, 3])
                        ))
                    )
        return rels_est, rels_gt, errqs, errts, scales

    rels_est, rels_gt, errqs, errts, scales1 = run_pass(batch_iter)
    traj_est = chain_relative_poses(np.stack(rels_est))
    if gt_traj is None:
        gt_traj = chain_relative_poses(np.stack(rels_gt))
    export_poses_kitti(traj_est, os.path.join(save_dir, "trajectory_est.txt"))
    export_poses_kitti(gt_traj, os.path.join(save_dir, "trajectory_gt.txt"))

    kw = {"lengths": lengths} if lengths else {}
    report = evaluate_sequence(gt_traj, traj_est, align="scale", **kw)
    report["median_err_q"] = float(np.median(errqs))
    report["median_err_t"] = float(np.median(errts))
    report["n_pairs"] = len(rels_est)

    if args.pose_graph:
        # Multi-frame fusion (new capability beyond the reference's chaining,
        # SURVEY.md §5.7): a second (i, i+2) sweep provides skip edges; the
        # two-stage solve (rotation averaging, then frozen-R translation
        # refinement) averages down translation noise without bending
        # rotations. Monocular convention: per-edge gt translation scale.
        import copy

        import jax.numpy as jnp

        from .ba.pose_graph import (
            graph_from_odometry,
            optimize_pose_graph_two_stage,
        )

        if cfg.data.dataset == "synthetic":
            delta2_iter = seq.pair_batches(bs, delta=2)
        else:
            # Dump-backed: the reference's trees carry per-delta match
            # files (ij_match_quality_{i}-{i+2}_* — dumps exist for
            # delta 1/2/3/5/8/10, kitti_corr_baselineEval.yaml:7); a
            # second loader over the SAME tree with delta_ij=2 provides
            # the skip edges.
            from .loader import data_loader

            cfg2 = copy.deepcopy(cfg)
            cfg2.data.delta_ij = 2
            ds2 = data_loader(cfg2, "test")
            if len(ds2) == 0:
                raise SystemExit(
                    "--pose_graph needs delta-2 pairs but the dump tree "
                    f"{cfg.data.dump_root} has no "
                    "ij_match_quality_{i}-{i+2}_* files; re-dump with "
                    "delta_ijs=(1, 2) (data/dump_kitti.dump_sequence)"
                )
            delta2_iter = ds2.ordered_pair_batches(
                bs, scene_name=args.scene or None
            )

        rels2, _, _, _, scales2 = run_pass(delta2_iter)
        if len(rels2) != len(rels_est) - 1:
            raise SystemExit(
                f"pose graph needs a delta-2 edge per frame triple: got "
                f"{len(rels2)} skip edges for {len(rels_est)} odometry "
                "edges (incomplete delta-2 dump?)"
            )

        def scaled(Ms, ss):
            out = []
            for M, s in zip(Ms, ss):
                T = np.eye(4)
                T[:3, :3] = M[:3, :3]
                tn = M[:3, 3]
                T[:3, 3] = tn / max(np.linalg.norm(tn), 1e-9) * s
                out.append(T)
            return np.stack(out).astype(np.float32)

        n = len(rels_est) + 1
        graph = graph_from_odometry(
            jnp.asarray(scaled(rels_est, scales1)),
            loop_edges=jnp.asarray(
                np.stack([np.arange(n - 2), np.arange(2, n)], -1), jnp.int32
            ),
            loop_measurements=jnp.asarray(scaled(rels2, scales2)),
            odo_weight=1.0,
            loop_weight=jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0]),
        )
        graph, _ = optimize_pose_graph_two_stage(graph, huber_delta=0.05)
        traj_fused = np.asarray(jnp.linalg.inv(graph.poses))
        export_poses_kitti(
            traj_fused, os.path.join(save_dir, "trajectory_pose_graph.txt")
        )
        fused = evaluate_sequence(gt_traj, traj_fused, align="scale", **kw)
        report["pose_graph"] = {
            k: round(float(v), 4) for k, v in fused.items()
        }
    # result.txt in the reference's format (results/*/result.txt).
    with open(os.path.join(save_dir, "result.txt"), "w") as f:
        f.write(f"Sequence: \t {args.scene or 'synthetic'} \n")
        f.write(f"Trans. err. (%): \t {report['trans_err_pct']:.3f} \n")
        f.write(
            f"Rot. err. (deg/100m): \t {report['rot_err_deg_per_100m']:.3f} \n"
        )
        f.write(f"ATE (m): \t {report['ATE_m']:.3f} \n")
        f.write(f"RPE (m): \t {report['RPE_m']:.3f} \n")
        f.write(f"RPE (deg): \t {report['RPE_deg']:.3f} \n")
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in report.items()}))
    return report


def cmd_val_feature(args):
    """Frontend-only correspondence-quality eval
    (parity: evaluation_epiDist.py val_feature :40-250)."""
    import jax.numpy as jnp

    from .data.synthetic_images import SyntheticImagePairs
    from .eval.frontend_eval import frontend_epidist_eval
    from .frontend import FrontendParams, SuperPointNet

    save_dir = os.path.join("logs", args.exper_name)
    os.makedirs(save_dir, exist_ok=True)
    if getattr(args, "config", ""):
        # Real-data path (evaluation_epiDist.py evaluates the dataset's
        # image pairs against the gt F): dump loader with images on.
        from .loader import data_loader
        from .train.config import load_config

        cfg = load_config(args.config)
        cfg.data.with_imgs = True
        ds = data_loader(cfg, task="test")

        def batch_iter():
            for b in ds.batches(cfg.data.batch_size, shuffle=False,
                                drop_last=False):
                yield {k: jnp.asarray(v) for k, v in b.items()}
    else:
        gen = SyntheticImagePairs(seed=0)

        def batch_iter():
            while True:
                yield {k: jnp.asarray(v) for k, v in gen.batch(2).items()}

    stream = batch_iter()
    sp_net = SuperPointNet()
    # Honor the config's SP_params knob set when present (the reference's
    # val_feature reads the same training.SP_params block,
    # evaluation_epiDist.py:98-102); CLI default otherwise.
    if getattr(args, "config", "") and getattr(
        cfg.training, "sp_params", None
    ):
        from .frontend import frontend_params_from_config

        fp = frontend_params_from_config(cfg)
    else:
        fp = FrontendParams(out_num_points=300, conf_thresh=1e-3)

    batch = next(stream)
    converted = None
    if args.pretrained and args.pretrained.endswith((".pth", ".pth.tar")):
        # Reference/magicleap SuperPoint torch checkpoints
        # (utils/torch_import.py); the gauss2 BN layout — the variant the
        # reference's pretrained_SP zoo ships (train_good.py:224) — is
        # auto-detected and gets the matching flax net.
        from .utils.torch_import import load_reference_checkpoint

        converted, _ = load_reference_checkpoint(args.pretrained, kind="auto")
        if "batch_stats" in converted:
            from .frontend import SuperPointNetGauss2

            sp_net = SuperPointNetGauss2()

    params = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    if args.pretrained:
        from flax import serialization

        if converted is not None:
            params = serialization.from_state_dict(params, converted)
        else:
            with open(args.pretrained, "rb") as f:
                params = serialization.from_bytes(params, f.read())

    accum = {}
    n_batches = args.max_batches or 5
    i = 0
    while batch is not None and i < n_batches:
        out = frontend_epidist_eval(
            sp_net, params,
            (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]),
            jnp.asarray(batch["F_gts"]),
            fp,
            noise_std=args.rand_noise,
            noise_key=jax.random.PRNGKey(i) if args.rand_noise else None,
        )
        for k, v in out.items():
            if k.startswith("ratio") or k == "num_matches":
                accum.setdefault(k, []).append(np.mean(np.asarray(v)))
        i += 1
        batch = next(stream, None)
    summary = {k: float(np.mean(v)) for k, v in accum.items()}

    if getattr(args, "homography", 0):
        # The reference's evaluate_frontend metric surface (repeatability,
        # localization error, H-correctness, matching score, detection
        # mAP — evaluate_frontend.py:26-276) over synthetic
        # homography-warped pairs.
        from .eval.frontend_eval import evaluate_homography_pair

        rng = np.random.RandomState(7)
        hp = {}
        for j in range(args.homography):
            img = np.asarray(
                SyntheticImagePairs(seed=100 + j)
                .batch(1)["imgs_grey"][0, 0]
            )
            Hh, Ww = img.shape
            # Mild random perspective warp around the image center.
            pert = rng.uniform(-0.08, 0.08, (4, 2)) * [Ww, Hh]
            src = np.array(
                [[0, 0], [Ww, 0], [0, Hh], [Ww, Hh]], np.float32
            )
            import cv2

            H_gt = cv2.getPerspectiveTransform(
                src, (src + pert).astype(np.float32)
            )
            res = evaluate_homography_pair(sp_net, params, img, H_gt, fp)
            for k, v in res.items():
                hp.setdefault(k, []).append(float(v))
        summary.update(
            {f"h_{k}": float(np.mean(v)) for k, v in hp.items()}
        )
    np.savez(Path(save_dir) / "result_dict_all.npz", **summary)
    print(json.dumps(summary))
    return summary


def cmd_infer(args):
    """Serving entry: two images (+ intrinsics) -> relative pose JSON.

    Frontend: SuperPoint when --pretrained_SP is given (classic or gauss2
    .pth[.tar]/msgpack auto-detected), SIFT+ratio-match otherwise. Solver:
    the trained DeepFNet; E decomposed with cheirality voting
    (geometry.recover_pose). The single-shot product surface the reference
    only offers through notebooks (eval_tools.py:587-2100)."""
    import cv2
    import jax.numpy as jnp
    from flax import serialization

    from .data.kitti import crop_or_pad_choice
    from .geometry.decompose import recover_pose
    from .geometry.epipolar import F_to_E, epi_distance
    from .models import DeepFNet

    g1 = cv2.imread(args.img1, cv2.IMREAD_GRAYSCALE)
    g2 = cv2.imread(args.img2, cv2.IMREAD_GRAYSCALE)
    if g1 is None or g2 is None:
        raise SystemExit(f"cannot read {args.img1} / {args.img2}")
    H, W = g1.shape[:2]
    if args.K:
        fx, fy, cx, cy = (float(v) for v in args.K.split(","))
    else:
        fx = fy = 1.2 * max(H, W)
        cx, cy = W / 2.0, H / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float64)

    N = args.good_num
    if args.pretrained_SP:
        from .frontend import (
            FrontendParams,
            SuperPointNet,
            SuperPointNetGauss2,
            get_matches_from_sp,
        )

        imgs = np.stack([g1, g2]).astype(np.float32) / 255.0
        sp_net = SuperPointNet()
        converted = None
        if args.pretrained_SP.endswith((".pth", ".pth.tar")):
            from .utils.torch_import import load_reference_checkpoint

            converted, _ = load_reference_checkpoint(
                args.pretrained_SP, kind="auto"
            )
            if "batch_stats" in converted:
                sp_net = SuperPointNetGauss2()
        sp_params = sp_net.init(
            jax.random.PRNGKey(0), jnp.asarray(imgs[:1])[..., None]
        )
        if converted is not None:
            sp_params = serialization.from_state_dict(sp_params, converted)
        elif args.pretrained_SP:
            with open(args.pretrained_SP, "rb") as f:
                sp_params = serialization.from_bytes(sp_params, f.read())
        fp = FrontendParams(out_num_points=N, conf_thresh=1e-3)
        sp_out = get_matches_from_sp(
            sp_net, sp_params,
            (jnp.asarray(imgs[0])[None], jnp.asarray(imgs[1])[None]),
            fp,
        )
        matches = np.asarray(sp_out["matches_xy_ori"][0])
        quality = np.asarray(sp_out["quality"][0])
        n_real = int(np.asarray(sp_out["valid"][0]).sum())
        if n_real < 8:
            raise SystemExit(
                f"only {n_real} SuperPoint matches — image pair unsuitable "
                "for this frontend (try the SIFT path or a lower "
                "conf threshold)"
            )
    else:
        from .data.dump_kitti import match_pair

        good = match_pair(g1, g2, n_features=2 * N)[1]
        n_real = len(good)
        if n_real < 8:
            raise SystemExit(f"only {n_real} matches")
        choice = crop_or_pad_choice(n_real, N, np.random.RandomState(0))
        matches = good[choice, :4].astype(np.float32)
        quality = (good[choice, 4:5] / 300.0).astype(np.float32)

    db = {
        "matches_xy_ori": jnp.asarray(matches)[None],
        "quality": jnp.asarray(quality)[None],
        "matches_good_unique_nums": jnp.asarray([min(n_real, N)]),
        "Ks": jnp.asarray(K, jnp.float32)[None],
        "t_scene_scale": jnp.ones((1, 1), jnp.float32),
    }

    cfg = None
    if args.config:
        from .train.config import load_config

        cfg = load_config(args.config)
        from .loader import model_loader

        net = model_loader(cfg).clone(image_size=(H, W))
    else:
        net = DeepFNet(depth=5, image_size=(H, W), if_quality=True)

    template = net.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        db,
    )
    if args.pretrained.endswith((".pth", ".pth.tar")):
        from .utils.torch_import import load_reference_checkpoint

        variables, _ = load_reference_checkpoint(args.pretrained, kind="deepf")
        params = serialization.from_state_dict(template, variables)
    else:
        from .eval.val_pipeline import load_params_msgpack

        params = load_params_msgpack(args.pretrained, template)

    outs = net.apply(params, db)
    F_pix = jnp.swapaxes(outs["T2"], -1, -2) @ outs["F_est"] @ outs["T1"]
    E = F_to_E(F_pix, db["Ks"])

    K_inv = np.linalg.inv(K)
    homo = lambda x: np.concatenate([x, np.ones_like(x[..., :1])], -1)
    x1n = homo(matches[:, :2]) @ K_inv.T
    x2n = homo(matches[:, 2:4]) @ K_inv.T
    rec = recover_pose(
        E.astype(jnp.float64), jnp.asarray(x1n)[None], jnp.asarray(x2n)[None]
    )
    d, _, _ = epi_distance(
        F_pix[0].astype(jnp.float64),
        jnp.asarray(matches[:, :2], jnp.float64),
        jnp.asarray(matches[:, 2:4], jnp.float64),
    )
    d = np.asarray(d)
    out = {
        "R": np.asarray(rec.R[0]).tolist(),
        "t_unit": np.asarray(rec.t[0]).tolist(),
        "E": np.asarray(E[0]).tolist(),
        "num_matches": n_real,
        "epi_inlier_ratio_1px": float(np.mean(d < 1.0)),
        "epi_median_px": float(np.median(d)),
        "frontend": "superpoint" if args.pretrained_SP else "sift",
    }
    txt = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
    print(txt)
    return out


def cmd_export_torch(args):
    """Export a trained checkpoint to the reference's .pth.tar format,
    so models trained HERE run in the reference stack unmodified (the
    inverse of --pretrained's torch import). --superpoint exports a
    gauss2 SuperPoint checkpoint (incl. BN running statistics) instead
    of the solver."""
    import jax.numpy as jnp

    from .data import SyntheticPairs
    from .loader import model_loader
    from .train import load_config
    from .utils.torch_import import save_reference_checkpoint

    if getattr(args, "superpoint", False):
        from flax import serialization

        from .frontend import SuperPointNetGauss2
        from .utils.torch_import import save_superpoint_checkpoint

        sp_net = SuperPointNetGauss2()
        template = sp_net.init(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, 64, 96, 1), jax.numpy.float32),
        )
        with open(args.checkpoint, "rb") as f:
            variables = serialization.from_bytes(template, f.read())
        save_superpoint_checkpoint(variables, args.out, n_iter=args.n_iter)
        print(json.dumps({"out": args.out, "n_iter": args.n_iter,
                          "kind": "superpoint_gauss2"}))
        return args.out

    cfg = load_config(args.config)
    net = model_loader(cfg)
    batch = SyntheticPairs(good_num=cfg.data.good_num, seed=0).batch(2)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    template = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        db,
    )
    from .eval.val_pipeline import load_params_msgpack

    variables = load_params_msgpack(args.checkpoint, template)
    save_reference_checkpoint(variables, args.out, n_iter=args.n_iter)
    print(json.dumps({"out": args.out, "n_iter": args.n_iter}))
    return args.out


def cmd_verify_dump(args):
    """Dump-tree integrity check — step 0 of the real-data playbook
    (README §readiness): per scene, validate cam/poses/Rt_cam2_gt shapes,
    count per-delta match files, report match-count statistics and any
    frame gaps. Exits non-zero on a malformed tree."""
    from pathlib import Path as _P

    root = _P(args.dump_root)
    scenes = sorted(d for d in root.iterdir() if d.is_dir())
    if not scenes:
        raise SystemExit(f"no scene directories under {root}")
    report = {"root": str(root), "scenes": {}}
    ok = True
    for scene in scenes:
        s = {"errors": []}
        try:
            K = np.load(scene / "cam.npy")
            s["K_shape"] = list(K.shape)
            if K.reshape(-1).shape[0] != 9:
                s["errors"].append("cam.npy is not 3x3")
            poses = np.load(scene / "poses.npy")
            poses = poses.reshape(-1, 3, 4)
            s["n_frames"] = int(len(poses))
            if not np.all(np.isfinite(poses)):
                s["errors"].append("poses.npy has non-finite entries")
            Rt2 = np.load(scene / "Rt_cam2_gt.npy")
            if Rt2.shape != (4, 4):
                s["errors"].append(f"Rt_cam2_gt shape {Rt2.shape}")
        except FileNotFoundError as e:
            s["errors"].append(f"missing: {e.filename}")
            report["scenes"][scene.name] = s
            ok = False
            continue
        for delta in (int(d) for d in args.deltas.split(",")):
            counts = []
            missing = []
            for i in range(len(poses) - delta):
                j = i + delta
                f_npy = scene / f"ij_match_quality_{i}-{j}_good.npy"
                f_h5 = scene / f"ij_match_quality_{i}-{j}_good.h5"
                if f_npy.is_file():
                    counts.append(int(len(np.load(f_npy))))
                elif f_h5.is_file():
                    counts.append(-1)  # present, not parsed here
                else:
                    missing.append(i)
            key = f"delta_{delta}"
            s[key] = {
                "pairs": len(counts),
                "missing": missing[:10],
                "n_missing": len(missing),
            }
            if counts and min(counts) >= 0:
                s[key]["matches_min"] = int(np.min(counts))
                s[key]["matches_median"] = float(np.median(counts))
                if np.min(counts) < args.min_matches:
                    s["errors"].append(
                        f"delta {delta}: a pair has only "
                        f"{np.min(counts)} matches (< {args.min_matches})"
                    )
            if delta == 1 and len(missing) > 0:
                s["errors"].append(
                    f"delta 1: {len(missing)} missing pair files"
                )
        if s["errors"]:
            ok = False
        report["scenes"][scene.name] = s
    report["ok"] = ok
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)
    return report


def cmd_tables(args):
    """Multi-experiment comparison tables from eval npz dumps
    (ref: the table notebooks over Exp_table_processor,
    eval_tools.py:181-585, as one command)."""
    import yaml

    from .eval.results import ExpTableProcessor

    with open(args.config) as f:
        config = yaml.safe_load(f)
    tp = ExpTableProcessor.from_config(config)
    metrics = tuple(
        args.metrics.split(",")
    ) if args.metrics else ("err_q_median", "err_t_median")
    md = tp.to_markdown(metrics, top_k=args.top_k)
    print(md)
    if args.latex:
        print()
        print(tp.to_latex(metrics))
    if args.plot:
        fig = tp.plot_metrics(metrics, save_path=args.plot)
        if fig is not None:
            print(f"# wrote {args.plot}")
    return md


# BASELINE.md targets (the reference's committed kitti-odom-eval outputs,
# results/{deepF,deepFEPE}_kitti/{09,10}/result.txt:2-6).
_BASELINE_TARGETS = {
    "deepF": {
        "09": {"trans_err_pct": 9.706, "rot_err_deg_per_100m": 0.889,
               "ATE_m": 80.157, "RPE_m": 0.211, "RPE_deg": 0.051},
        "10": {"trans_err_pct": 11.206, "rot_err_deg_per_100m": 1.546,
               "ATE_m": 34.342, "RPE_m": 0.253, "RPE_deg": 0.362},
    },
    "deepFEPE": {
        "09": {"trans_err_pct": 8.639, "rot_err_deg_per_100m": 0.664,
               "ATE_m": 52.576, "RPE_m": 0.214, "RPE_deg": 0.054},
        "10": {"trans_err_pct": 11.719, "rot_err_deg_per_100m": 0.945,
               "ATE_m": 35.325, "RPE_m": 0.252, "RPE_deg": 0.212},
    },
}


def cmd_baseline_gate(args):
    """One-command BASELINE verdict (VERDICT r3 next-step #8): take
    eval_good output dirs (the reference-schema npz dumps), run the VO
    chain per sequence, and emit the BASELINE.md seq-09/10 comparison
    table with pass/fail deltas — so the first session with real KITTI
    dumps produces the SURVEY §6 verdict with zero plumbing.

        cli baseline_gate 09=logs/eval09 10=logs/eval10 \\
            --gt_dir <dir with 09.txt/10.txt> [--baseline deepF]

    Each eval dir must contain `<exp>_<filename>` (default
    DeepF_err_ratio.npz) with `relative_poses_body`; gt files are KITTI
    12-col trajectories (the reference commits them under
    datasets/kitti_gt_poses/). Pass = metric <= target * (1 + tol).
    """
    from .eval.kitti_odometry import evaluate_sequence, load_poses_txt
    from .eval.vo import chain_relative_poses

    targets_all = _BASELINE_TARGETS[args.baseline]
    tol = args.tol
    report = {"baseline": args.baseline, "tol": tol, "sequences": {},
              "ok": True}
    rows = []
    metrics = ("trans_err_pct", "rot_err_deg_per_100m", "ATE_m",
               "RPE_m", "RPE_deg")
    for spec in args.seq_dirs:
        seq, _, d = spec.partition("=")
        if not d:
            raise SystemExit(f"seq_dirs entries are seq=dir, got {spec!r}")
        npz_path = Path(d) / f"{args.exp}_{args.filename}"
        data = np.load(npz_path)
        rels = data["relative_poses_body"]
        est = chain_relative_poses(rels)
        gt = load_poses_txt(str(Path(args.gt_dir) / f"{seq}.txt"))
        n = min(len(gt), len(est))
        lengths = (
            tuple(float(x) for x in args.lengths.split(","))
            if args.lengths else None
        )
        kw = {"lengths": lengths} if lengths else {}
        res = evaluate_sequence(gt[:n], est[:n], **kw)
        target = targets_all.get(seq, {})
        seq_rep = {"measured": res, "target": target, "deltas": {},
                   "pass": {}}
        for m in metrics:
            if m not in target:
                continue
            # A non-finite measurement means the evaluation itself broke
            # (e.g. no valid trajectory segments) — that is a FAIL, not
            # a skip.
            finite = bool(np.isfinite(res[m]))
            delta = res[m] - target[m] if finite else float("nan")
            ok = bool(finite and res[m] <= target[m] * (1.0 + tol))
            seq_rep["deltas"][m] = round(float(delta), 4)
            seq_rep["pass"][m] = ok
            report["ok"] = bool(report["ok"] and ok)
            rows.append((seq, m, res[m], target[m], delta, ok))
        report["sequences"][seq] = seq_rep

    print(f"# BASELINE gate vs {args.baseline} "
          f"(tol {tol:+.0%} relative)")
    print("| seq | metric | ours | baseline | delta | verdict |")
    print("|---|---|---|---|---|---|")
    for seq, m, v, t, delta, ok in rows:
        print(f"| {seq} | {m} | {v:.3f} | {t:.3f} | {delta:+.3f} | "
              f"{'PASS' if ok else 'FAIL'} |")
    print(json.dumps(report))
    if args.strict and not report["ok"]:
        raise SystemExit(1)
    return report


def main(argv=None):
    p = argparse.ArgumentParser("deepfepe_tpu")
    sub = p.add_subparsers(dest="command", required=True)
    sp = sub.add_parser("val_feature")
    sp.add_argument("exper_name")
    sp.add_argument("--config", default="",
                    help="eval a dump dataset (read_what.with_imgs forced) "
                         "instead of the synthetic generator")
    sp.add_argument("--pretrained", default="")
    sp.add_argument("--max_batches", type=int, default=0)
    sp.add_argument("--rand_noise", type=float, default=0.0)
    sp.add_argument("--homography", type=int, default=0,
                    help="also evaluate N synthetic homography-warped "
                         "pairs: repeatability, localization, "
                         "H-correctness, matching score, detection mAP "
                         "(the reference's evaluate_frontend surface)")
    sp.set_defaults(fn=cmd_val_feature)
    sp = sub.add_parser("eval_vo")
    sp.add_argument("config")
    sp.add_argument("exper_name")
    sp.add_argument("--pretrained", default="")
    sp.add_argument("--scene", default="")
    sp.add_argument("--n_frames", type=int, default=0)
    sp.add_argument("--lengths", default="",
                    help="comma list of segment lengths for trans/rot "
                         "errors (default: KITTI 100..800m)")
    sp.add_argument("--pose_graph", action="store_true",
                    help="fuse a second delta-2 sweep via the two-stage "
                         "pose-graph solve (synthetic sequences)")
    sp.add_argument("--baseline", action="store_true",
                    help="use the RANSAC-8pt baseline instead of the net")
    sp.add_argument("--refine_ba", action="store_true",
                    help="two-view sqrt-BA polish of each pair's pose "
                         "(triangulate + damped GN, learned weights as "
                         "robust residual weights); per-pair acceptance "
                         "keeps the solver pose where the polish does not "
                         "reduce the robust cost")
    sp.add_argument("--refine_min_matches", type=int, default=200,
                    help="polish only pairs with >= this many effective "
                         "matches (the measured sparse-SP regression "
                         "domain sits at ~140)")
    sp.set_defaults(fn=cmd_eval_vo)
    for name, fn in (("train_good", cmd_train), ("eval_good", cmd_eval)):
        sp = sub.add_parser(name)
        sp.add_argument("config")
        sp.add_argument("exper_name")
        sp.add_argument("--pretrained", default="")
        sp.add_argument("--train_iter", type=int, default=None)
        sp.add_argument("--max_batches", type=int, default=0)
        sp.add_argument("--profile_dir", default="",
                        help="capture an xprof device trace of a few "
                             "training iterations into this directory")
        sp.add_argument("--refine_ba", action="store_true",
                        help="(eval_good) two-view sqrt-BA polish of each "
                             "pair's pose before the error stats (per-pair "
                             "acceptance guard, see eval/refine.py)")
        sp.add_argument("--refine_min_matches", type=int, default=200,
                        help="polish only pairs with >= this many "
                             "effective matches")
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("export_torch",
                        help="export a solver (or --superpoint gauss2) "
                             "checkpoint to the reference .pth.tar format")
    sp.add_argument("config", help="model config YAML (arch must match; "
                                   "ignored with --superpoint)")
    sp.add_argument("checkpoint", help="our .msgpack checkpoint")
    sp.add_argument("out", help="output .pth.tar path")
    sp.add_argument("--n_iter", type=int, default=0)
    sp.add_argument("--superpoint", action="store_true",
                    help="the checkpoint is a SuperPointNetGauss2 "
                         "frontend (exports conv + BN params AND the "
                         "running statistics)")
    sp.set_defaults(fn=cmd_export_torch)
    sp = sub.add_parser("verify_dump",
                        help="dump-tree integrity check (playbook step 0)")
    sp.add_argument("dump_root")
    sp.add_argument("--deltas", default="1",
                    help="comma list of delta_ij gaps to check (e.g. 1,2)")
    sp.add_argument("--min_matches", type=int, default=8)
    sp.set_defaults(fn=cmd_verify_dump)
    sp = sub.add_parser("tables", help="multi-experiment result tables")
    sp.add_argument("config", help="table config YAML (data.base_path + "
                                   "data.seq_dict, reference schema)")
    sp.add_argument("--metrics", default="",
                    help="comma list (default err_q_median,err_t_median)")
    sp.add_argument("--top_k", type=int, default=1)
    sp.add_argument("--latex", action="store_true")
    sp.add_argument("--plot", default="", help="save a bar-panel figure here")
    sp.set_defaults(fn=cmd_tables)
    sp = sub.add_parser(
        "baseline_gate",
        help="BASELINE.md seq-09/10 verdict from eval_good output dirs",
    )
    sp.add_argument("seq_dirs", nargs="+",
                    help="seq=dir pairs, e.g. 09=logs/eval09 10=logs/eval10")
    sp.add_argument("--gt_dir", required=True,
                    help="dir with <seq>.txt KITTI 12-col gt trajectories")
    sp.add_argument("--baseline", default="deepF",
                    choices=sorted(_BASELINE_TARGETS))
    sp.add_argument("--exp", default="DeepF",
                    help="npz prefix (exps.our_name)")
    sp.add_argument("--filename", default="err_ratio.npz")
    sp.add_argument("--tol", type=float, default=0.05,
                    help="relative pass tolerance vs the baseline value")
    sp.add_argument("--lengths", default="",
                    help="comma list of segment lengths (default KITTI "
                         "100..800 m)")
    sp.add_argument("--strict", action="store_true",
                    help="exit 1 if any metric fails the gate")
    sp.set_defaults(fn=cmd_baseline_gate)
    sp = sub.add_parser("infer", help="two images -> relative pose JSON")
    sp.add_argument("img1")
    sp.add_argument("img2")
    sp.add_argument("--pretrained", required=True,
                    help="DeepF checkpoint (.msgpack or reference .pth.tar)")
    sp.add_argument("--pretrained_SP", default="",
                    help="SuperPoint checkpoint; SIFT frontend when absent")
    sp.add_argument("--K", default="",
                    help="fx,fy,cx,cy (default: 1.2*max(H,W) focal, center pp)")
    sp.add_argument("--config", default="",
                    help="model config YAML (default: flagship depth-5)")
    sp.add_argument("--good_num", type=int, default=1000)
    sp.add_argument("--out", default="", help="also write JSON here")
    sp.set_defaults(fn=cmd_infer)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
