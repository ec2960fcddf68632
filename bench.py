"""Benchmark: two-view pose pipeline throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: end-to-end training-step throughput (forward + F-loss +
backward + Adam) of the flagship DeepFNet pipeline at the reference's
production shapes (configs/kitti_corr_baseline.yaml: good_num=1000,
depth=5).

vs_baseline is MEASURED: the live reference implementation at
/root/reference (torch, the default if_cpu_svd=true path the reference
README prescribes, Train_model_pipeline.py:495) is timed in this same
container on the same shapes (B=4 — its per-item SVD loop makes larger
batches proportionally slower). If the reference import fails, falls back
to the round-1 conservative estimate of 25 pairs/s and says so.

extra metrics (same JSON line):
- joint_pairs_per_s: full joint SP(240x320) + matching + DeepF train step
  (BASELINE.md's "frames/s for the two-view pose pipeline incl. frontend")
- ransac_pairs_per_s: vmapped fixed-budget 8-point RANSAC eval throughput
  at B=64, N=1000, 512 hypotheses
"""

import json
import os
import sys
import time

import numpy as np

import jax

# Persistent XLA compilation cache: bench compiles are large and the
# tunnel makes them slow on bad chip days; cached executables cut a rerun's
# warmup from minutes to seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 — older jax; cache is best-effort
    pass

import jax.numpy as jnp

FALLBACK_REFERENCE_PAIRS_PER_S = 25.0

BATCH = 64  # throughput-optimal on v5e (5089 pairs/s vs 3239 at B=32)
N_POINTS = 1000
DEPTH = 5
WARMUP = 3
ITERS = 50
REPEATS = 5

# Throughput-optimal after the round-3 backward fixes (measured on v5e:
# B=8 380, B=16 435, B=32 428 pairs/s) — B=8 saturated the OLD step.
JOINT_BATCH = 16
JOINT_HW = (240, 320)
JOINT_N = 300

# Reference production operating point (kitti_corr_baselineEval.yaml:7,24:
# image 376x1241 resized to 376x1240, good_num=1000, SuperPointNet_gauss2,
# SP batch 4).
FULLRES_BATCH = 4
FULLRES_HW = (376, 1240)
FULLRES_N = 1000

# One v5e chip, dense bf16 peak (for the MFU denominator).
PEAK_BF16_TFLOPS = 197.0


def measure_roofline():
    """Fixed bf16 matmul fingerprint: achieved TFLOP/s on a 4096^3 chain.

    Normalizes chip-day variance out of round-over-round comparisons
    (3,046-5,089 pairs/s measured on identical code across days): report
    throughput alongside the same-day roofline.
    """
    n, chain = 4096, 64
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16) / n

    @jax.jit
    def run(a, b):
        def body(_, x):
            return (x @ b).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, chain, body, a)

    x = run(a, b)
    float(np.asarray(x[0, 0]))  # compile + sync

    def once():
        t0 = time.perf_counter()
        x = run(a, b)
        float(np.asarray(x[0, 0]))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = run(run(a, b), b)
        float(np.asarray(x[0, 0]))
        t2 = time.perf_counter() - t0
        return max(t2 - t1, 1e-9)  # marginal cost of one extra chain

    # Tunnel RTT noise is tens of ms against a ~50 ms chain: a single
    # marginal sample can be arbitrarily wrong (one run read 731 TFLOP/s,
    # 3.7x the physical peak). Take the median of 5.
    dt = float(np.median([once() for _ in range(5)]))
    tflops = 2.0 * n**3 * chain / dt / 1e12
    if tflops > 250.0:  # v5e bf16 peak is 197; anything above is noise
        print(f"# roofline sample suspect ({tflops:.0f} TFLOP/s > peak); "
              "re-sampling", file=sys.stderr)
        dt = float(np.median([once() for _ in range(9)]))
        tflops = 2.0 * n**3 * chain / dt / 1e12
    return tflops


def _cost_analysis_flops(lowered_compiled):
    """Best-effort FLOP count from XLA cost analysis (None if unsupported
    on this backend)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:  # noqa: BLE001
        return None


def measure_reference_baseline():
    """Time the live torch reference train step (CPU, if_cpu_svd) in-env.

    Returns (pairs_per_s, "measured") or (fallback, "estimated")."""
    try:
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests")
        )
        import torch

        from _reference_oracle import load_reference

        ref = load_reference()
        from deepfepe_tpu.data import SyntheticPairs

        B = 4
        net = ref.DeepFNet(
            depth=DEPTH, image_size=[376, 1241, 3], if_quality=False,
            is_cuda=False, is_test=False, if_cpu_svd=True,
        )
        opt = torch.optim.Adam(net.parameters(), lr=1e-4)
        ds = SyntheticPairs(good_num=N_POINTS, seed=0)
        b = ds.batch(B)
        tt = lambda k: torch.tensor(np.asarray(b[k]))
        data_batch = {
            "matches_xy_ori": tt("matches_xy_ori").float(),
            "matches_good_unique_nums": torch.full((B,), N_POINTS),
            "t_scene_scale": torch.ones(B, 1),
        }
        virt1 = torch.tensor(np.asarray(b["pts1_virt"])).float()
        virt2 = torch.tensor(np.asarray(b["pts2_virt"])).float()
        Ks = tt("Ks").float()
        loss_params = {
            "depth": DEPTH, "clamp_at": 0.02,
            "if_tri_depth": False, "if_sample_loss": False,
        }

        def step():
            opt.zero_grad()
            preds = net(data_batch)
            outs = dict(preds)
            outs["weights"] = preds["weights_layers"][-1]
            loss = ref.tgu.get_all_loss_DeepF(
                outs, virt1, virt2, Ks, loss_params,
                get_residual_summaries=False,
            )[0]["loss_F"]
            loss.backward()
            opt.step()

        step()  # warmup
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            step()
        dt = (time.perf_counter() - t0) / n
        return B / dt, "measured"
    except Exception as e:  # noqa: BLE001 — bench must always print
        import sys

        # stderr: stdout carries exactly ONE JSON line (driver contract).
        print(f"# reference baseline unavailable: {e!r}", file=sys.stderr)
        return FALLBACK_REFERENCE_PAIRS_PER_S, "estimated"


def bench_solver_step():
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.parallel import make_mesh, shard_batch
    from deepfepe_tpu.train import Config, Trainer

    cfg = Config()
    cfg.data.good_num = N_POINTS
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    net = DeepFNet(
        depth=DEPTH,
        image_size=(376, 1241),
        if_quality=True,
        mlp_dtype=jnp.bfloat16,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev)
    trainer = Trainer(net, cfg, mesh=mesh)

    ds = SyntheticPairs(good_num=N_POINTS, seed=0)
    batch = ds.batch(BATCH)
    trainer.init_state(batch)
    sharded = shard_batch(mesh, batch)

    # FLOPs of one step from XLA's own cost model (for the MFU line).
    step_flops = None
    try:
        step_flops = _cost_analysis_flops(
            trainer.train_step.lower(
                trainer.state, sharded, 0.1, 0.5
            ).compile()
        )
    except Exception:  # noqa: BLE001
        pass

    # Warm up (compile) and force real execution with a host transfer —
    # block_until_ready alone does not synchronize on tunneled platforms.
    for _ in range(WARMUP):
        trainer.state, m = trainer.train_step(trainer.state, sharded, 0.1, 0.5)
    float(np.asarray(m["loss"]))

    # Adapt the iteration budget to the observed per-step wall time: on a
    # pathological tunnel day a fixed 50/100-iter protocol can run for an
    # hour; the marginal-cost math is the same at smaller k.
    t0 = time.perf_counter()
    for _ in range(3):
        trainer.state, m = trainer.train_step(trainer.state, sharded, 0.1, 0.5)
    float(np.asarray(m["loss"]))
    per_step = (time.perf_counter() - t0) / 3
    iters = ITERS
    repeats = REPEATS
    if per_step > 0.1:
        iters = max(5, int(6.0 / per_step))
        repeats = 1
        import sys

        print(
            f"# slow device ({per_step*1e3:.0f} ms/step observed); "
            f"reducing to {iters} iters x {repeats}",
            file=sys.stderr,
            flush=True,
        )

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        m_local = None
        for _ in range(iters):
            trainer.state, m_local = trainer.train_step(
                trainer.state, sharded, 0.1, 0.5
            )
        # The state chains step-to-step, so syncing the last loss waits for
        # the whole sequence.
        float(np.asarray(m_local["loss"]))
        return time.perf_counter() - t0

    # Marginal-cost protocol: (t[2k] - t[k]) / k cancels the fixed
    # enqueue/sync overhead of the host<->device link. The final sync's
    # latency is noisy on tunneled platforms, so take the best of several
    # repeats (min marginal time).
    dts = []
    for _ in range(repeats):
        t_short = run(iters)
        t_long = run(2 * iters)
        dts.append(max(t_long - t_short, 1e-9) / iters)
    # Median of k=5 marginal samples + within-session spread (VERDICT r3
    # next-step #3): the 3.0k<->4.9k pairs/s swing across chip-days was
    # unexplained; the spread field separates within-session tunnel noise
    # from genuine cross-day device-state variance. MFU stays the
    # cross-round comparison metric.
    dt = float(np.median(dts))
    spread = (max(dts) - min(dts)) / dt if len(dts) > 1 else 0.0
    mfu = (
        step_flops / dt / (PEAK_BF16_TFLOPS * 1e12)
        if step_flops
        else None
    )
    return BATCH / dt, mfu, step_flops, spread


def bench_joint_step():
    """Joint SP + matching + solver train step at 240x320."""
    import optax

    from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
    from deepfepe_tpu.frontend import FrontendParams, SuperPointNet
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config
    from deepfepe_tpu.train.joint import (
        JointTrainState,
        make_joint_train_step,
    )

    cfg = Config()
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    cfg.data.good_num = JOINT_N

    ds = SyntheticImagePairs(image_size=JOINT_HW, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(JOINT_BATCH).items()}

    sp_net = SuperPointNet(dtype=jnp.bfloat16)  # +9% measured on v5e
    deepf_net = DeepFNet(
        depth=DEPTH, image_size=JOINT_HW, if_quality=True,
        mlp_dtype=jnp.bfloat16,
    )
    fp = FrontendParams(out_num_points=JOINT_N, conf_thresh=1e-4)
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    from deepfepe_tpu.frontend import get_matches_from_sp

    sp_out = get_matches_from_sp(
        sp_net, sp_params,
        (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]), fp,
    )
    db = dict(batch)
    db["matches_xy_ori"] = sp_out["matches_xy_ori"]
    db["quality"] = sp_out["quality"]
    db["matches_good_unique_nums"] = jnp.sum(sp_out["valid"], axis=-1)
    deepf_params = deepf_net.init(jax.random.PRNGKey(1), db)

    tx1, tx2 = optax.adam(1e-4), optax.adam(1e-5)
    state = JointTrainState.create(deepf_params, sp_params, tx1, tx2)
    step = make_joint_train_step(
        deepf_net, sp_net, fp, tx1, tx2, cfg,
        train_deepf=True, train_sp=True,
    )

    for _ in range(2):
        state, m = step(state, batch, 0.1, 0.5)
    float(np.asarray(m["loss"]))

    def run(iters):
        # The jitted step donates its input state — re-thread it.
        nonlocal state
        t0 = time.perf_counter()
        m_l = None
        for _ in range(iters):
            state, m_l = step(state, batch, 0.1, 0.5)
        float(np.asarray(m_l["loss"]))
        return time.perf_counter() - t0

    k = 15
    t1, t2 = run(k), run(2 * k)
    dt = max(t2 - t1, 1e-9) / k
    return JOINT_BATCH / dt


def bench_joint_fullres():
    """Joint train step at the REFERENCE production operating point:
    SuperPointNet_gauss2 frontend, 376x1240 frames, N=1000 matches,
    SP batch 4 (kitti_corr_baselineEval.yaml:7,24 + SP_params) — the
    frames/s-for-the-full-pipeline number BASELINE.md asks for.

    Returns (pairs_per_s, mfu_or_None, flops_or_None)."""
    import optax

    from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
    from deepfepe_tpu.frontend import (
        FrontendParams,
        SuperPointNetGauss2,
        get_matches_from_sp,
    )
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config
    from deepfepe_tpu.train.joint import (
        JointTrainState,
        make_joint_train_step,
    )

    cfg = Config()
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    cfg.data.good_num = FULLRES_N

    ds = SyntheticImagePairs(image_size=FULLRES_HW, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(FULLRES_BATCH).items()}

    sp_net = SuperPointNetGauss2(dtype=jnp.bfloat16)
    deepf_net = DeepFNet(
        depth=DEPTH, image_size=FULLRES_HW, if_quality=True,
        mlp_dtype=jnp.bfloat16,
    )
    fp = FrontendParams(out_num_points=FULLRES_N, conf_thresh=1e-4,
                        nn_thresh=1.0)
    sp_vars = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
    sp_out = get_matches_from_sp(
        sp_net, sp_vars,
        (batch["imgs_grey"][:, 0], batch["imgs_grey"][:, 1]), fp,
    )
    db = dict(batch)
    db["matches_xy_ori"] = sp_out["matches_xy_ori"]
    db["quality"] = sp_out["quality"]
    db["matches_good_unique_nums"] = jnp.sum(sp_out["valid"], axis=-1)
    deepf_params = deepf_net.init(jax.random.PRNGKey(1), db)

    tx1, tx2 = optax.adam(1e-4), optax.adam(1e-5)
    state = JointTrainState.create(deepf_params, sp_vars, tx1, tx2)
    step = make_joint_train_step(
        deepf_net, sp_net, fp, tx1, tx2, cfg,
        train_deepf=True, train_sp=True,
    )
    flops = None
    try:
        flops = _cost_analysis_flops(
            step.lower(state, batch, 0.1, 0.5).compile()
        )
    except Exception:  # noqa: BLE001
        pass

    for _ in range(2):
        state, m = step(state, batch, 0.1, 0.5)
    float(np.asarray(m["loss"]))

    def run(iters):
        nonlocal state
        t0 = time.perf_counter()
        m_l = None
        for _ in range(iters):
            state, m_l = step(state, batch, 0.1, 0.5)
        float(np.asarray(m_l["loss"]))
        return time.perf_counter() - t0

    k = 8
    t1, t2 = run(k), run(2 * k)
    dt = max(t2 - t1, 1e-9) / k
    mfu = flops / dt / (PEAK_BF16_TFLOPS * 1e12) if flops else None
    return FULLRES_BATCH / dt, mfu, flops


def bench_ransac():
    """Vmapped fixed-budget 8-point RANSAC eval throughput."""
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.eval.ransac import ransac_f_batch

    ds = SyntheticPairs(good_num=N_POINTS, seed=1)
    b = ds.batch(BATCH)
    x = np.asarray(b["matches_xy_ori"])
    x1, x2 = jnp.asarray(x[..., :2]), jnp.asarray(x[..., 2:4])

    fn = jax.jit(
        lambda a, c, k: ransac_f_batch(a, c, k, num_hypotheses=512)
    )
    key = jax.random.PRNGKey(0)
    out = fn(x1, x2, key)
    float(np.asarray(out.num_inliers[0]))

    def run(iters):
        t0 = time.perf_counter()
        o = None
        for i in range(iters):
            o = fn(x1, x2, jax.random.fold_in(key, i))
        float(np.asarray(o.num_inliers[0]))
        return time.perf_counter() - t0

    k = 15
    t1, t2 = run(k), run(2 * k)
    dt = max(t2 - t1, 1e-9) / k
    return BATCH / dt


def bench_ba():
    """Schur-complement BA at SfM scale (C=100 keyframes, P=10k
    landmarks, windowed visibility): ms/iter + observations/s via the
    marginal-cost protocol. The full scaling table (P=1k/10k/100k,
    sqrt-BA, pose-graph) lives in tools/bench_ba.py; this row keeps the
    headline number flowing round over round (VERDICT r4 #4)."""
    from deepfepe_tpu import ba
    from deepfepe_tpu.ba import make_sfm_problem

    rng = np.random.RandomState(0)
    prob, _, _, _ = make_sfm_problem(rng, C=100, P=10_000)

    @jax.jit
    def step(p):
        p2, _ = ba.ba_step(p, damping=1e-3)
        return p2

    def run(n, x):
        for _ in range(n):
            x = step(x)
        return float(np.asarray(jnp.sum(x.points[0]))), x

    _ = run(2, prob)
    vals = []
    for _ in range(5):
        t0 = time.time()
        run(6, prob)
        t1 = time.time()
        run(12, prob)
        t2 = time.time()
        vals.append(((t2 - t1) - (t1 - t0)) / 6 * 1000.0)
    ms = float(np.median(vals))
    n_obs = float(np.asarray(prob.vis).sum())
    return ms, n_obs / (ms / 1e3)


def main():
    import sys

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    note("bench: roofline fingerprint...")
    try:
        roofline = measure_roofline()
    except Exception as e:  # noqa: BLE001
        note(f"roofline unavailable: {e!r}")
        roofline = None
    note(f"bench: roofline {roofline}; solver step...")
    pairs_per_s, solver_mfu, solver_flops, solver_spread = \
        bench_solver_step()
    note(f"bench: solver {pairs_per_s:.1f} pairs/s; reference baseline...")
    ref_pairs_per_s, ref_kind = measure_reference_baseline()
    note(f"bench: reference {ref_pairs_per_s:.2f} ({ref_kind}); joint step...")
    joint = bench_joint_step()
    note(f"bench: joint {joint:.2f} pairs/s; full-res joint...")
    try:
        joint_fullres, joint_fullres_mfu, _ = bench_joint_fullres()
    except Exception as e:  # noqa: BLE001
        note(f"full-res joint unavailable: {e!r}")
        joint_fullres, joint_fullres_mfu = None, None
    note(f"bench: full-res joint {joint_fullres}; ransac...")
    ransac = bench_ransac()
    note(f"bench: ransac {ransac:.1f}; BA (C=100, P=10k)...")
    try:
        ba_ms, ba_obs_per_s = bench_ba()
    except Exception as e:  # noqa: BLE001
        note(f"ba bench unavailable: {e!r}")
        ba_ms, ba_obs_per_s = None, None

    rnd = lambda v, k=2: None if v is None else round(v, k)
    print(
        json.dumps(
            {
                "metric": "train_step_pairs_per_s",
                "value": round(pairs_per_s, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / ref_pairs_per_s, 3),
                "extra": {
                    "reference_pairs_per_s": round(ref_pairs_per_s, 2),
                    "reference_baseline_kind": ref_kind,
                    "joint_pairs_per_s": round(joint, 2),
                    "joint_fullres_pairs_per_s": rnd(joint_fullres),
                    "ransac_pairs_per_s": round(ransac, 2),
                    "roofline_tflops": rnd(roofline, 1),
                    "mfu": rnd(solver_mfu, 4),
                    "joint_fullres_mfu": rnd(joint_fullres_mfu, 4),
                    "solver_step_gflops": rnd(
                        None if solver_flops is None else solver_flops / 1e9,
                        1,
                    ),
                    "solver_spread": rnd(solver_spread, 3),
                    "ba_ms_per_iter": rnd(ba_ms),
                    "ba_obs_per_s": rnd(ba_obs_per_s, 0),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
