"""Full-res joint-step sweep: batch size x encoder remat policy.

Round-4 attack on the production-operating-point wall (VERDICT r3 next
-step #1): the joint train step at the reference's full-res point
(gauss2 bf16, 376x1240, N=1000) is HBM-bandwidth-bound in the SuperPoint
encoder backward. Two cheap levers before custom kernels:

  1. batch: XLA's conv strategy choice is batch-dependent (B=4 full-res
     chains picked a ~3x-worse schedule than B=8 in round 3); the bench
     metric is pairs/s, so the throughput-optimal batch is fair game.
  2. remat: jax.checkpoint per double-conv block ('block') or over the
     whole CNN ('full') trades recompute FLOPs for saved-activation HBM
     traffic.

    python tools/bench_fullres_sweep.py [--quick]
Prints one JSON line per config: {"pairs", "remat", "ms_per_step",
"pairs_per_s"}. Timing: marginal-cost protocol (bench.py convention),
scalar-only host transfers (axon tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np

HW = (376, 1240)
N = 1000
DEPTH = 5


def build_step(n_pairs: int, remat: str):
    import optax

    from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs
    from deepfepe_tpu.frontend import FrontendParams, SuperPointNetGauss2
    from deepfepe_tpu.frontend import get_matches_from_sp
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.train import Config
    from deepfepe_tpu.train.joint import JointTrainState, make_joint_train_step

    cfg = Config()
    cfg.model.depth = DEPTH
    cfg.model.if_quality = True
    cfg.data.good_num = N

    ds = SyntheticImagePairs(image_size=HW, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(n_pairs).items()}

    sp_net = SuperPointNetGauss2(dtype=jnp.bfloat16)
    deepf_net = DeepFNet(depth=DEPTH, image_size=HW, if_quality=True,
                         mlp_dtype=jnp.bfloat16)
    fp = FrontendParams(out_num_points=N, conf_thresh=1e-4, remat=remat)
    sp_params = sp_net.init(
        jax.random.PRNGKey(0), batch["imgs_grey"][:, 0][..., None]
    )
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
    step = make_joint_train_step(deepf_net, sp_net, fp, tx1, tx2, cfg)
    return step, state, batch


def time_step(step, state, batch, iters=12):
    for _ in range(2):
        state, m = step(state, batch, 0.1, 0.5)
    float(np.asarray(m["loss"]))

    def run(k):
        nonlocal state
        t0 = time.perf_counter()
        m_l = None
        for _ in range(k):
            state, m_l = step(state, batch, 0.1, 0.5)
        float(np.asarray(m_l["loss"]))
        return time.perf_counter() - t0

    t1, t2 = run(iters), run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def main():
    quick = "--quick" in sys.argv
    pairs_list = (4, 8) if quick else (4, 8, 16)
    remats = ("none", "block", "full")
    for n_pairs in pairs_list:
        for remat in remats:
            step = state = batch = None
            try:
                step, state, batch = build_step(n_pairs, remat)
                dt = time_step(step, state, batch)
                print(json.dumps({
                    "pairs": n_pairs, "remat": remat,
                    "ms_per_step": round(dt * 1e3, 2),
                    "pairs_per_s": round(n_pairs / dt, 2),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "pairs": n_pairs, "remat": remat,
                    "error": repr(e)[:300],
                }), flush=True)
            finally:
                step = state = batch = None


if __name__ == "__main__":
    main()
