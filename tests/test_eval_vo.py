"""Eval-stack parity tests.

The strongest oracle available: the reference repo commits both the exported
trajectories (results/*/09.txt, 10.txt) and the metric reports
(results/*/09/result.txt) produced by kitti-odom-eval. Our re-implemented
metrics must reproduce those numbers from the same inputs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import synthetic_pair
from deepfepe_tpu import eval as ev
from deepfepe_tpu import geometry as geo

REF = "/root/reference"
GT_DIR = f"{REF}/deepFEPE/deepFEPE/datasets/kitti_gt_poses"


def _gt_poses_path():
    for cand in (
        f"{REF}/deepFEPE/datasets/kitti_gt_poses",
        f"{REF}/deepFEPE/deepFEPE/datasets/kitti_gt_poses",
    ):
        if os.path.isdir(cand):
            return cand
    pytest.skip("reference gt poses not found")


def _parse_result_txt(path):
    vals = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                key = parts[0].strip().rstrip(":").strip()
                try:
                    vals[key] = float(parts[-1])
                except ValueError:
                    pass
    return vals


@pytest.mark.parametrize("model,seq", [
    ("deepF_kitti", "09"), ("deepF_kitti", "10"),
    ("deepFEPE_kitti", "09"), ("deepFEPE_kitti", "10"),
])
def test_kitti_metrics_reproduce_reference_results(model, seq):
    gt_dir = _gt_poses_path()
    est_path = f"{REF}/results/{model}/{seq}/{seq}.txt"
    res_path = f"{REF}/results/{model}/{seq}/result.txt"
    if not os.path.isfile(est_path):
        pytest.skip("committed trajectory not found")
    gt = ev.load_poses_txt(f"{gt_dir}/{seq}.txt")
    est = ev.load_poses_txt(est_path)
    ref = _parse_result_txt(res_path)

    got = ev.evaluate_sequence(gt, est, align="scale")
    assert abs(got["trans_err_pct"] - ref["Trans. err. (%)"]) < 5e-3, got
    assert abs(got["rot_err_deg_per_100m"] - ref["Rot. err. (deg/100m)"]) < 5e-3, got
    assert abs(got["ATE_m"] - ref["ATE (m)"]) < 5e-3, got
    assert abs(got["RPE_m"] - ref["RPE (m)"]) < 5e-3, got
    assert abs(got["RPE_deg"] - ref["RPE (deg)"]) < 5e-3, got


def test_chain_relative_poses_roundtrip(rng):
    from conftest import random_pose

    # Build a gt trajectory, derive relative poses, chain them back.
    abs_poses = [np.eye(4)]
    for _ in range(10):
        R, t = random_pose(rng, max_angle_deg=5)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        abs_poses.append(abs_poses[-1] @ T)
    abs_poses = np.stack(abs_poses)

    # relative i->i+1 transform in the framework convention:
    # x_{i+1} = T_rel x_i  =>  T_rel = inv(abs_{i+1}) @ abs_i
    rels = np.stack(
        [np.linalg.inv(abs_poses[i + 1]) @ abs_poses[i] for i in range(10)]
    )
    chained = ev.chain_relative_poses(rels)
    np.testing.assert_allclose(chained, abs_poses, atol=1e-8)


def test_snippet_ate_zero_for_perfect(rng):
    from conftest import random_pose

    abs_poses = [np.eye(4)[:3]]
    T_acc = np.eye(4)
    for _ in range(12):
        R, t = random_pose(rng, max_angle_deg=3)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        T_acc = T_acc @ T
        abs_poses.append(T_acc[:3].copy())
    poses = np.stack(abs_poses)
    res = ev.pose_seq_ate(poses, poses, seq_length=5)
    assert res["mean"][0] < 1e-6
    assert res["mean"][1] < 1e-6


@pytest.mark.slow
def test_ransac_f_rejects_outliers(rng):
    s = synthetic_pair(rng, n=256, noise=0.5, outlier_frac=0.4)
    res = ev.ransac_f(
        jnp.asarray(s["x1"], jnp.float32),
        jnp.asarray(s["x2"], jnp.float32),
        jax.random.PRNGKey(0),
        num_hypotheses=512,
        threshold=1.5,
    )
    # Should find most true inliers (60% of points).
    assert int(res.num_inliers) > 0.45 * 256
    # Estimated F should be closer to gt than chance: check mean epi distance
    # of the true inliers under the estimated F.
    mask_true = np.ones(256, bool)
    d = np.asarray(
        geo.epi_distance(
            res.F,
            jnp.asarray(s["x1"], jnp.float32),
            jnp.asarray(s["x2"], jnp.float32),
        )[0]
    )
    assert np.median(d) < 2.0


@pytest.mark.slow
def test_val_rt_gt_sanity(rng):
    # The reference invariant: evaluating with gt E must give ~0 errors.
    pairs = [synthetic_pair(rng, n=128, noise=0.2) for _ in range(3)]
    E = jnp.asarray(np.stack([p["E"] for p in pairs]), jnp.float32)
    K = jnp.asarray(np.stack([p["K"] for p in pairs]), jnp.float32)
    matches = jnp.asarray(
        np.stack([np.concatenate([p["x1"], p["x2"]], -1) for p in pairs]),
        jnp.float32,
    )
    T = np.tile(np.eye(4), (3, 1, 1))
    for i, p in enumerate(pairs):
        T[i, :3, :3], T[i, :3, 3] = p["R"], p["t"]
    out = ev.val_rt_batch(
        E, K, matches, E, jnp.asarray(T, jnp.float32),
        ransac_key=jax.random.PRNGKey(1),
    )
    assert float(jnp.max(out["err_q_gt"])) < 0.5
    assert float(jnp.max(out["err_t_gt"])) < 1.0
    # RANSAC baseline close to gt as well on mostly-clean data.
    assert float(jnp.median(out["err_q_base"])) < 1.0
    ratios = ev.inlier_ratios(out["epi_dists_gt"])
    assert float(jnp.min(ratios["ratio@1.0"])) > 0.9


def test_tum_ate_rpe(rng):
    from conftest import random_pose

    from deepfepe_tpu.eval import tum

    # Identical trajectories -> zero errors.
    T_acc = np.eye(4)
    poses = [T_acc.copy()]
    for _ in range(20):
        R, t = random_pose(rng, max_angle_deg=4)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        T_acc = T_acc @ T
        poses.append(T_acc.copy())
    poses = np.stack(poses)
    a = tum.ate(poses[:, :3, 3], poses[:, :3, 3])
    assert a["rmse"] < 1e-9
    r = tum.rpe(poses, poses)
    assert r["trans_rmse"] < 1e-9

    # A rigidly transformed copy still has ~zero ATE (alignment removes it).
    Rg, tg = random_pose(rng, max_angle_deg=50)
    M = np.eye(4)
    M[:3, :3], M[:3, 3] = Rg, tg
    moved = np.einsum("ij,njk->nik", M, poses)
    a2 = tum.ate(poses[:, :3, 3], moved[:, :3, 3])
    assert a2["rmse"] < 1e-6


def test_result_processor_and_tables(tmp_path, rng):
    from deepfepe_tpu.eval.results import ExpTableProcessor, ResultProcessor

    for name, scale in (("expA", 1.0), ("expB", 3.0)):
        np.savez(
            tmp_path / f"{name}.npz",
            err_q=rng.rand(50) * scale,
            err_t=rng.rand(50) * scale,
            epi_dists=rng.rand(50, 10) * scale,
        )
    rp = ResultProcessor.from_npz(str(tmp_path / "expA.npz"))
    ir = rp.inlier_ratio((0.5, 1.0))
    assert 0 < ir[0.5] < ir[1.0] <= 1.0
    stats = rp.pose_error_stats()
    assert "err_q_median" in stats
    curve = rp.ratio_curve("err_q", (0.25, 0.5, 1.0))
    assert curve[1.0] >= curve[0.5] >= curve[0.25]

    tp = ExpTableProcessor(
        {
            "expA": ResultProcessor.from_npz(str(tmp_path / "expA.npz")),
            "expB": ResultProcessor.from_npz(str(tmp_path / "expB.npz")),
        }
    )
    assert tp.highlights("err_q_median") == "expA"
    latex = tp.to_latex()
    assert "textbf" in latex and "expA" in latex


@pytest.mark.slow
def test_dsac_essential(rng):
    from deepfepe_tpu.models.dsac import dsac_essential

    s = synthetic_pair(rng, n=100, noise=0.3, outlier_frac=0.3)
    K_inv = np.linalg.inv(s["K"])
    xh = lambda x: (np.hstack([x, np.ones((len(x), 1))]) @ K_inv.T)[:, :2]
    E_gt = jnp.asarray(s["E"] / np.linalg.norm(s["E"]), jnp.float32)

    def loss_fn(E):
        En = E / (jnp.linalg.norm(E) + 1e-9)
        return jnp.minimum(
            jnp.sum((En - E_gt) ** 2), jnp.sum((En + E_gt) ** 2)
        )

    out = dsac_essential(
        jnp.asarray(xh(s["x1"]), jnp.float32),
        jnp.asarray(xh(s["x2"]), jnp.float32),
        jax.random.PRNGKey(3),
        loss_fn=loss_fn,
        hyps=128,
    )
    assert np.isfinite(float(out["exp_loss"]))
    # The best hypothesis should be decent.
    assert float(out["top_loss"]) < 0.5, float(out["top_loss"])
    # Expected loss differentiable wrt inputs.
    g = jax.grad(
        lambda x: dsac_essential(
            x,
            jnp.asarray(xh(s["x2"]), jnp.float32),
            jax.random.PRNGKey(3),
            loss_fn=loss_fn,
            hyps=64,
        )["exp_loss"]
    )(jnp.asarray(xh(s["x1"]), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_frontend_eval_and_repeatability(rng):
    from deepfepe_tpu.eval.frontend_eval import (
        compute_repeatability,
        homography_correctness,
        warp_keypoints,
    )

    # Repeatability: same keypoints warped by H -> repeatability 1.
    H = np.array([[1.0, 0, 5.0], [0, 1.0, -3.0], [0, 0, 1]])
    k1 = rng.rand(50, 2) * np.array([80, 60]) + 10
    k2 = warp_keypoints(k1, H)
    rep = compute_repeatability(k1, k2, H, (100, 120), distance_thresh=1.0)
    assert rep["repeatability"] > 0.95
    assert rep["localization_error"] < 0.1

    # Homography correctness from perfect matches.
    matches = np.concatenate([k1, k2], axis=1)
    hc = homography_correctness(matches, H, (100, 120))
    assert hc["corner_error"] < 0.5
    assert hc["correct@3.0"] == 1.0


def test_warp_utils(rng):
    import jax.numpy as jnp

    from deepfepe_tpu.utils import warp as W

    # vec<->mtrx roundtrip for all warp types.
    for wt in ("translation", "similarity", "affine", "homography"):
        k = {"translation": 2, "similarity": 4, "affine": 6, "homography": 8}[wt]
        p = jnp.asarray(rng.randn(3, k) * 0.1, jnp.float32)
        back = W.mtrx2vec(W.vec2mtrx(p, wt), wt)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)

    # Affine fit recovers a known warp.
    M_true = np.array([[1.1, 0.05, 3.0], [-0.02, 0.95, -2.0], [0, 0, 1]])
    src = rng.rand(30, 2) * 50
    dst = (np.hstack([src, np.ones((30, 1))]) @ M_true.T)[:, :2]
    M_fit = np.asarray(
        W.fit_affine(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    )
    np.testing.assert_allclose(M_fit, M_true, atol=1e-3)

    # transform_image: identity warp is a no-op.
    img = jnp.asarray(rng.rand(16, 20, 3), jnp.float32)
    out = W.transform_image(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_io_utils(tmp_path, rng):
    from deepfepe_tpu.utils import io

    d = {"a": rng.rand(3, 4), "nested": {"b": np.arange(5)}}
    io.saveh5(d, str(tmp_path / "t.h5"))
    back = io.loadh5(str(tmp_path / "t.h5"))
    np.testing.assert_allclose(back["a"], d["a"])
    np.testing.assert_array_equal(back["nested"]["b"], d["nested"]["b"])

    io.savepklz(d, str(tmp_path / "t.pklz"))
    back2 = io.loadpklz(str(tmp_path / "t.pklz"))
    np.testing.assert_allclose(back2["a"], d["a"])

    merged = io.dict_update({"x": 1, "y": {"z": 2}}, {"y": {"w": 3}})
    assert merged == {"x": 1, "y": {"z": 2, "w": 3}}


def test_metrics_summary(rng):
    from deepfepe_tpu.eval.metrics_summary import summarize, weight_f1

    err_q = rng.rand(100) * 5
    err_t = rng.rand(100) * 20
    s = summarize(err_q, err_t, epi_dists=rng.rand(100, 50) * 2)
    assert s["ratio_q@5"] >= s["ratio_q@1"]
    assert 0 <= s["epi_ratio@0.1"] <= s["epi_ratio@1.0"] <= 1

    # weight F1: perfect weights (high exactly on inliers) -> F1 = 1.
    N = 64
    d_gt = np.where(np.arange(N) < 32, 0.1, 10.0)
    w = np.where(np.arange(N) < 32, 2.0 / N, 1e-6)
    f = weight_f1(w[None], d_gt[None])
    assert f["weight_f1"] > 0.99


@pytest.mark.slow
def test_goodcorres_arch_variant():
    from deepfepe_tpu.data import SyntheticPairs
    from deepfepe_tpu.models import DeepFNet

    ds = SyntheticPairs(good_num=64, seed=12)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(2).items()}
    net = DeepFNet(
        depth=2, image_size=(376, 1241), if_quality=True, if_goodCorresArch=True
    )
    params = net.init(jax.random.PRNGKey(0), batch)
    outs = net.apply(params, batch)
    assert np.all(np.isfinite(np.asarray(outs["F_est"])))


def test_recover_camera_opencv_baseline(rng):
    from deepfepe_tpu.eval.opencv_baseline import recover_camera_opencv

    s = synthetic_pair(rng, n=200, noise=0.3, outlier_frac=0.2)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = s["R"], s["t"]
    delta_inv = np.linalg.inv(T)

    for five_point in (False, True):
        M, (err_R, err_t), mask, E_ret = recover_camera_opencv(
            s["K"], s["x1"], s["x2"], delta_inv,
            five_point=five_point, threshold=0.5,
        )
        assert M.shape == (3, 4)
        assert err_R < 1.0, (five_point, err_R)
        assert err_t < 5.0, (five_point, err_t)
        assert mask.sum() > 10  # cv2 recoverPose mask chains RANSAC+cheirality
        if five_point:
            assert np.asarray(E_ret).shape == (3, 3)
        else:
            assert len(E_ret) == 2


def test_exp_table_from_config(tmp_path, rng):
    """Table assembly from the reference table-config schema
    (configs/table_*.yaml: data.base_path + seq_dict symbol -> [folder,
    filename, extra...]; eval_tools.py:181-243)."""
    from deepfepe_tpu.eval.results import ExpTableProcessor

    for folder, scale in (("exp_sift", 2.0), ("exp_deepf", 1.0)):
        d = tmp_path / folder
        d.mkdir()
        np.savez(
            d / "DeepF_err_ratio.npz",
            err_q=rng.rand(40) * scale,
            err_t=rng.rand(40) * scale,
            epi_dists=rng.rand(40, 10) * scale,
        )
    config = {
        "data": {
            "base_path": str(tmp_path),
            "seq_dict": {
                # extra entries (ckpt iters etc.) must be tolerated
                "s.k": ["exp_sift", "DeepF_err_ratio.npz", "src", 50000],
                "d.k": ["exp_deepf", "DeepF_err_ratio.npz"],
                "missing": ["no_such_dir", "DeepF_err_ratio.npz"],
            },
        }
    }
    tp = ExpTableProcessor.from_config(config)
    assert set(tp.experiments) == {"s.k", "d.k"}  # missing one skipped
    assert tp.highlights("err_q_median") == "d.k"
    t = tp.table()
    assert t["s.k"]["err_q_median"] > t["d.k"]["err_q_median"]


@pytest.mark.slow
def test_eval_good_npz_body_frame_conjugation(tmp_path, monkeypatch):
    """eval_good npz dumps: relative_poses_body must equal
    inv(Rt_cam2_gt) @ M_cam @ Rt_cam2_gt for a non-identity Rt_cam2_gt
    (Train_model_pipeline.py:1098-1119)."""
    import cv2  # noqa: F401  (dump tooling dependency)
    import yaml

    from deepfepe_tpu.cli import main
    from deepfepe_tpu.data import SyntheticPairs

    # Non-identity cam0->cam2 transform: small rotation + lateral offset.
    th = 0.1
    Rt2 = np.eye(4)
    Rt2[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    Rt2[:3, 3] = [0.06, 0.0, 0.0]

    H, W, f = 94, 310, 180.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    gen = SyntheticPairs(image_size=(H, W), good_num=300, noise_px=0.0,
                         outlier_frac=0.0, seed=5)
    scene = tmp_path / "00"
    scene.mkdir()
    np.save(scene / "cam.npy", K)
    np.save(scene / "Rt_cam2_gt.npy", Rt2)
    poses = [np.eye(4)]
    for _ in range(9):
        R, tv = gen._sample_pose()
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, tv
        poses.append(poses[-1] @ np.linalg.inv(T))
    poses34 = np.stack([p[:3] for p in poses]).astype(np.float32)
    np.save(scene / "poses.npy", poses34)
    for i in range(9):
        j = i + 1
        rel = np.linalg.inv(np.vstack([poses34[j], [0, 0, 0, 1]])) @ (
            np.vstack([poses34[i], [0, 0, 0, 1]])
        )
        # matches must live in the cam2 frame the loader labels with.
        rel_c2 = Rt2 @ rel @ np.linalg.inv(Rt2)
        R, tv = rel_c2[:3, :3], rel_c2[:3, 3]
        n = 160
        X1 = np.stack([gen.rng.uniform(-15, 15, n),
                       gen.rng.uniform(-4, 2, n),
                       gen.rng.uniform(6, 50, n)], -1)
        X2 = X1 @ R.T + tv
        ok = (X1[:, 2] > 1) & (X2[:, 2] > 1)
        x1 = (X1[ok] / X1[ok, 2:3]) @ K.T
        x2 = (X2[ok] / X2[ok, 2:3]) @ K.T
        m = np.concatenate(
            [x1[:, :2], x2[:, :2], np.ones((ok.sum(), 1)) * 150.0], -1
        ).astype(np.float32)
        np.save(scene / f"ij_match_quality_{i}-{j}_all.npy", m)
        np.save(scene / f"ij_match_quality_{i}-{j}_good.npy", m)

    cfg = {
        "data": {"dataset": "kitti_odo_corr", "dump_root": str(tmp_path),
                 "good_num": 128, "batch_size": 8,
                 "image": {"size": [H, W]},
                 "preprocessing": {"resize": [H, W]},
                 "train_scenes": ["00"], "val_scenes": ["00"],
                 "test_scenes": ["00"]},
        "model": {"depth": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    monkeypatch.chdir(tmp_path)
    main(["eval_good", str(cfg_path), "expbody", "--max_batches", "1"])

    d = np.load(tmp_path / "logs" / "expbody" / "DeepF_err_ratio.npz")
    M = d["relative_poses_cam"]
    body = d["relative_poses_body"]
    pad = np.tile(np.array([[[0.0, 0, 0, 1]]]), (len(M), 1, 1))
    want = (np.linalg.inv(Rt2)[None] @ np.concatenate([M, pad], 1)
            @ Rt2[None])[:, :3]
    np.testing.assert_allclose(body, want, atol=1e-5)
    # And it is genuinely different from the cam-frame pose.
    assert np.abs(body - M).max() > 1e-3


def test_rpe_full_surface_matches_reference_script():
    """evaluate_trajectory vs the reference's vendored TUM script on the
    same trajectory, across delta units and the all-pairs mode
    (ref: evaluations/evaluate_rpe.py:204-297)."""
    import types

    # The script's __main__ block is Python 2 (print statements); exec only
    # the function definitions above it.
    src = open("/root/reference/evaluations/evaluate_rpe.py").read()
    src = src.split("if __name__")[0]
    ref_rpe = types.ModuleType("ref_evaluate_rpe")
    exec(compile(src, "ref_evaluate_rpe", "exec"), ref_rpe.__dict__)

    rng = np.random.RandomState(3)
    n = 40
    stamps = np.cumsum(0.1 + 0.01 * rng.rand(n))
    gt, est = [], []
    T_g, T_e = np.eye(4), np.eye(4)
    for k in range(n):
        def step(mag_r, mag_t):
            ax = rng.randn(3); ax /= np.linalg.norm(ax)
            a = mag_r * rng.rand()
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            R = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K
            T = np.eye(4); T[:3, :3] = R
            T[:3, 3] = rng.randn(3) * mag_t + [0, 0, 0.3]
            return T
        T_g = T_g @ step(0.05, 0.01)
        T_e = T_e @ step(0.055, 0.012)
        gt.append(T_g.copy()); est.append(T_e.copy())
    gt, est = np.stack(gt), np.stack(est)

    class Py2Dict(dict):
        # The vendored script is Python 2: it calls traj.keys().sort().
        def keys(self):
            return sorted(super().keys())

    traj_gt = Py2Dict({s: g for s, g in zip(stamps, gt)})
    traj_est = Py2Dict({s: e for s, e in zip(stamps, est)})

    from deepfepe_tpu.eval import tum

    cases = [
        dict(fixed_delta=True, delta=0.35, delta_unit="s"),
        dict(fixed_delta=True, delta=1.0, delta_unit="m"),
        dict(fixed_delta=True, delta=0.1, delta_unit="rad"),
        dict(fixed_delta=True, delta=3.0, delta_unit="f"),
        dict(fixed_delta=False, max_pairs=0),  # deterministic all-pairs
    ]
    for case in cases:
        res_ref = np.asarray(
            ref_rpe.evaluate_trajectory(
                traj_gt, traj_est,
                param_max_pairs=case.get("max_pairs", 10000),
                param_fixed_delta=case.get("fixed_delta", False),
                param_delta=case.get("delta", 1.0),
                param_delta_unit=case.get("delta_unit", "s"),
            )
        )
        res_ours = tum.evaluate_trajectory(
            gt, est, gt_stamps=stamps, est_stamps=stamps, **case
        )
        assert res_ours.shape == res_ref.shape, (case, res_ours.shape,
                                                 res_ref.shape)
        # Same pair set and identical errors.
        np.testing.assert_allclose(res_ours, res_ref, atol=1e-9,
                                   err_msg=str(case))


def test_rpe_max_pairs_sampling_and_scale():
    rng = np.random.RandomState(0)
    n = 30
    poses = []
    T = np.eye(4)
    for _ in range(n):
        T = T.copy(); T[:3, 3] += [0.1, 0, 0.5]
        poses.append(T.copy())
    poses = np.stack(poses)
    from deepfepe_tpu.eval import tum

    r = tum.rpe(poses, poses, fixed_delta=True, delta=2, delta_unit="f",
                max_pairs=5)
    assert r["num_pairs"] == 5
    assert r["trans_rmse"] < 1e-12

    # scale: est with halved translations at scale=2 matches gt exactly.
    est = poses.copy()
    est[:, :3, 3] *= 0.5
    res = tum.evaluate_trajectory(
        poses, est, fixed_delta=True, delta=1, delta_unit="f", scale=2.0
    )
    assert np.abs(res[:, 4]).max() < 1e-12


def test_results_extended_table_surface(tmp_path, rng):
    """AP-style masked inlier tables, top-k highlights, markdown with
    summary rows, figure assembly (ref: eval_tools.py:113-139, 452-572)."""
    from deepfepe_tpu.eval.results import ExpTableProcessor, ResultProcessor

    S, N = 6, 50
    d = np.abs(rng.randn(S, N)) * 0.8
    scores = rng.rand(S, N)
    eq, et = np.abs(rng.randn(S)), np.abs(rng.randn(S))
    np.savez(tmp_path / "a.npz", epi_dists=d, mscores=scores,
             err_q=eq, err_t=et)
    np.savez(tmp_path / "b.npz", epi_dists=d * 0.5, mscores=scores,
             err_q=eq * 0.5, err_t=et * 0.5)

    rp = ResultProcessor.from_npz(str(tmp_path / "a.npz"))
    ap = rp.ap_inlier_thd(
        inlier_thds=(0.5, 1.0), mask_thds=(0.0, 0.5), mask_key="mscores"
    )
    assert ap["inlier_thd"].shape == (2, 2, S)
    assert ap["num_corrs"].shape == (2, S)
    # Unmasked row counts every correspondence; 0.5-mask keeps ~half.
    assert np.all(ap["num_corrs"][0] == N)
    assert np.all(ap["num_corrs"][1] < N)
    # Masked-threshold selectivity changes ratios only through the subset.
    r_all = rp.inlier_ratio_masked((1.0,))["inlier_ratio"]
    assert r_all.shape == (1, S)

    tp = ExpTableProcessor({
        "a": ResultProcessor.from_npz(str(tmp_path / "a.npz")),
        "b": ResultProcessor.from_npz(str(tmp_path / "b.npz")),
    })
    hi = tp.highlights_table([[1.0, 2.0], [2.0, 1.0]], top_k=1)
    assert hi["table_highlights"].tolist() == [[True, False], [False, True]]
    hi2 = tp.highlights_table(
        [[1.0, 2.0], [2.0, 1.0]], reverse_arr=[1, -1], top_k=1
    )
    assert hi2["table_highlights"].tolist() == [[False, False],
                                                [True, True]]

    md = tp.to_markdown(("err_q_median", "err_t_median"), top_k=1)
    assert md.count("**") == 4  # one bold entry per column
    assert "_mean_" in md and "_median_" in md
    # b dominates (halved errors) -> both bolds on b's row.
    b_row = [l for l in md.split("\n") if l.startswith("| b ")][0]
    assert b_row.count("**") == 4

    fig = tp.plot_metrics(save_path=str(tmp_path / "t.png"))
    if fig is not None:
        assert (tmp_path / "t.png").stat().st_size > 1000


def test_cli_tables(tmp_path, rng):
    """`tables <config>` prints markdown (+latex, +figure) from npz dumps."""
    import yaml

    from deepfepe_tpu.cli import main

    for name, sc in (("expA", 1.0), ("expB", 0.5)):
        (tmp_path / name).mkdir()
        eq = np.abs(rng.randn(8))
        np.savez(tmp_path / name / "DeepF_err_ratio.npz",
                 err_q=eq * sc, err_t=eq * 2 * sc,
                 epi_dists=np.abs(rng.randn(8, 10)))
    cfg = {"data": {"base_path": str(tmp_path), "seq_dict": {
        "A": ["expA", "DeepF_err_ratio.npz"],
        "B": ["expB", "DeepF_err_ratio.npz"]}}}
    cfgp = tmp_path / "t.yaml"
    with open(cfgp, "w") as f:
        yaml.safe_dump(cfg, f)
    md = main(["tables", str(cfgp), "--plot", str(tmp_path / "f.png")])
    assert "| exp |" in md and "_median_" in md
    # B has strictly halved errors -> both bolds on B.
    b_row = [l for l in md.split("\n") if l.startswith("| B ")][0]
    assert b_row.count("**") == 4
    assert (tmp_path / "f.png").stat().st_size > 1000


@pytest.mark.slow
def test_eval_vo_pose_graph_on_dump_tree(tmp_path, monkeypatch):
    """`eval_vo --pose_graph` runs on a DUMP-BACKED dataset as one command
    (VERDICT r2 next-step #5): the delta-2 skip edges come from a second
    loader pass over the same tree's ij_match_quality_{i}-{i+2}_* files,
    and the two-stage solve keeps rotations frozen (its rot drift equals
    the chained sweep's)."""
    import cv2  # noqa: F401
    import yaml

    from deepfepe_tpu.cli import main
    from deepfepe_tpu.data import SyntheticPairs

    H, W, f = 94, 310, 180.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    gen = SyntheticPairs(image_size=(H, W), good_num=300, noise_px=0.0,
                         outlier_frac=0.0, seed=9)
    scene = tmp_path / "00"
    scene.mkdir()
    np.save(scene / "cam.npy", K)
    np.save(scene / "Rt_cam2_gt.npy", np.eye(4))
    n_frames = 17
    poses = [np.eye(4)]
    for _ in range(n_frames - 1):
        R, tv = gen._sample_pose()
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, tv
        poses.append(poses[-1] @ np.linalg.inv(T))
    poses34 = np.stack([p[:3] for p in poses]).astype(np.float32)
    np.save(scene / "poses.npy", poses34)

    def write_pair(i, j):
        rel = np.linalg.inv(np.vstack([poses34[j], [0, 0, 0, 1]])) @ (
            np.vstack([poses34[i], [0, 0, 0, 1]])
        )
        R, tv = rel[:3, :3], rel[:3, 3]
        n = 200
        X1 = np.stack([gen.rng.uniform(-15, 15, n),
                       gen.rng.uniform(-4, 2, n),
                       gen.rng.uniform(6, 50, n)], -1)
        X2 = X1 @ R.T + tv
        ok = (X1[:, 2] > 1) & (X2[:, 2] > 1)
        x1 = (X1[ok] / X1[ok, 2:3]) @ K.T
        x2 = (X2[ok] / X2[ok, 2:3]) @ K.T
        m = np.concatenate(
            [x1[:, :2], x2[:, :2], np.ones((ok.sum(), 1)) * 150.0], -1
        ).astype(np.float32)
        np.save(scene / f"ij_match_quality_{i}-{j}_all.npy", m)
        np.save(scene / f"ij_match_quality_{i}-{j}_good.npy", m)

    for i in range(n_frames - 1):
        write_pair(i, i + 1)
    for i in range(n_frames - 2):
        write_pair(i, i + 2)

    cfg = {
        "data": {"dataset": "kitti_odo_corr", "dump_root": str(tmp_path),
                 "good_num": 128, "batch_size": 8,
                 "image": {"size": [H, W]},
                 "preprocessing": {"resize": [H, W]},
                 "train_scenes": ["00"], "val_scenes": ["00"],
                 "test_scenes": ["00"]},
        "model": {"depth": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    monkeypatch.chdir(tmp_path)
    report = main(["eval_vo", str(cfg_path), "pgdump", "--pose_graph",
                   "--lengths", "0.3,0.6,1.0"])

    out = tmp_path / "logs" / "pgdump"
    assert (out / "trajectory_pose_graph.txt").is_file()
    assert (out / "result.txt").is_file()
    assert "pose_graph" in report
    # Two-stage solve freezes rotations: the fused trajectory's per-frame
    # rotation blocks equal the chained sweep's (the segment-based
    # rot/100m SCALAR can still shift because the improved translations
    # change the segment boundaries it averages over).
    def rot_blocks(path):
        rows = np.loadtxt(path).reshape(-1, 3, 4)
        return rows[:, :, :3]

    Rc = rot_blocks(out / "trajectory_est.txt")
    Rf = rot_blocks(out / "trajectory_pose_graph.txt")
    np.testing.assert_allclose(Rf, Rc, atol=5e-4)
    # Skip edges average down translation noise: fused trans error is
    # far below chained (measured here: 41.7% -> ~0.01%).
    assert (
        report["pose_graph"]["trans_err_pct"]
        < 0.2 * report["trans_err_pct"]
    )
    assert np.isfinite(report["pose_graph"]["trans_err_pct"])


def test_average_precision_oracle():
    """First-party AP equals hand-computed values (the reference uses
    sklearn.average_precision_score, evaluate_frontend.py:225-232)."""
    from deepfepe_tpu.eval.frontend_eval import average_precision

    # Perfect ranking: all positives first -> AP = 1.
    assert average_precision(np.array([1, 1, 0, 0]),
                             np.array([4.0, 3.0, 2.0, 1.0])) == 1.0
    # Worst ranking: positives last. AP = mean of precision at each
    # positive = (1/3 + 2/4)/2.
    ap = average_precision(np.array([0, 0, 1, 1]),
                           np.array([4.0, 3.0, 2.0, 1.0]))
    np.testing.assert_allclose(ap, (1 / 3 + 2 / 4) / 2, atol=1e-12)
    # Interleaved: P@1=1, P@3=2/3 -> AP = (1 + 2/3)/2.
    ap = average_precision(np.array([1, 0, 1, 0]),
                           np.array([4.0, 3.0, 2.0, 1.0]))
    np.testing.assert_allclose(ap, (1 + 2 / 3) / 2, atol=1e-12)
    # No positives -> 0.
    assert average_precision(np.zeros(3), np.arange(3.0)) == 0.0


def test_matching_score_and_map_oracle(rng):
    """mscore + mAP under a known homography with planted descriptors
    (ref semantics: evaluate_frontend.eva_mscore :178-276)."""
    from deepfepe_tpu.eval.frontend_eval import (
        matching_score_and_map,
        warp_keypoints,
    )

    K, D = 32, 16
    Hh, Ww = 120, 160
    H_gt = np.array([[1.0, 0.02, 3.0], [-0.01, 1.0, -2.0], [0, 0, 1.0]])
    k1 = np.stack(
        [rng.uniform(10, Ww - 10, K), rng.uniform(10, Hh - 10, K)], -1
    ).astype(np.float32)
    k2 = warp_keypoints(k1, H_gt).astype(np.float32)
    # Distinct unit descriptors; copy to image 2 so every pair matches.
    d1 = rng.randn(K, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d1.copy()
    # Break half the matches geometrically: displace those keypoints far.
    k2[: K // 2] += 50.0
    valid = np.ones(K, bool)

    out = matching_score_and_map(k1, d1, valid, k2, d2, valid, H_gt,
                                 (Hh, Ww))
    # All K descriptor matches form; half are geometric inliers.
    assert out["num_matches"] == K
    np.testing.assert_allclose(out["match_inlier_ratio"], 0.5, atol=1e-6)
    # Denominator = K + (in-bounds unwarped k2). mscore = 2*inl/denom.
    back = warp_keypoints(k2, np.linalg.inv(H_gt))
    inb = ((back[:, 0] >= 0) & (back[:, 0] < Ww)
           & (back[:, 1] >= 0) & (back[:, 1] < Hh)).sum()
    np.testing.assert_allclose(
        out["mscore"], 2 * (K // 2) / (K + inb), atol=1e-6
    )
    # Identical descriptor distances (all ~0) give no ranking signal;
    # mAP is the precision of a random-order ranking ~ inlier fraction.
    assert 0.0 <= out["mAP"] <= 1.0

    # Now plant a ranking: inlier matches get closer descriptors.
    d2_noisy = d1 + 0.3 * rng.randn(K, D).astype(np.float32)
    d2_noisy[K // 2:] = d1[K // 2:]  # inliers: exact copies (dist 0)
    d2_noisy /= np.linalg.norm(d2_noisy, axis=-1, keepdims=True)
    out2 = matching_score_and_map(k1, d1, valid, k2, d2_noisy, valid,
                                  H_gt, (Hh, Ww))
    # Perfect ranking (all inliers first) -> mAP = 1.
    assert out2["mAP"] > 0.99, out2


def test_val_feature_homography_surface(monkeypatch, tmp_path):
    """val_feature --homography emits the full evaluate_frontend metric
    set (repeatability/localization/correctness/mscore/mAP)."""
    from deepfepe_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    summary = main(["val_feature", "vfh", "--max_batches", "1",
                    "--homography", "1"])
    for key in ("h_repeatability", "h_localization_error", "h_mscore",
                "h_mAP", "h_corner_error", "h_correct@3.0"):
        assert key in summary, key


def test_baseline_gate_nonfinite_metric_fails_cleanly(tmp_path, monkeypatch):
    """A non-finite measured metric must FAIL the gate and still print a
    JSON-serializable report (ADVICE r4 medium: np.isfinite's numpy.bool_
    leaked into report['ok'] and json.dumps raised TypeError on exactly
    the failure path the non-finite check was added to report)."""
    import json

    from deepfepe_tpu import cli
    from deepfepe_tpu.eval import kitti_odometry as ko

    d = tmp_path / "eval"
    d.mkdir()
    rels = np.tile(np.eye(4)[None, :3, :], (3, 1, 1))
    np.savez(d / "DeepF_err_ratio.npz", relative_poses_body=rels)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    row = " ".join(["1 0 0 0", "0 1 0 0", "0 0 1 0"])
    (gt_dir / "09.txt").write_text("\n".join([row] * 4) + "\n")

    bad = {"trans_err_pct": float("nan"), "rot_err_deg_per_100m": 0.1,
           "ATE_m": 0.1, "RPE_m": 0.1, "RPE_deg": 0.1}
    monkeypatch.setattr(ko, "evaluate_sequence", lambda *a, **k: dict(bad))
    report = cli.main([
        "baseline_gate", f"09={d}", "--gt_dir", str(gt_dir),
    ])
    assert report["ok"] is False
    assert report["sequences"]["09"]["pass"]["trans_err_pct"] is False
    json.dumps(report)  # the report must serialize on the failure path

    with pytest.raises(SystemExit):
        cli.main(["baseline_gate", f"09={d}", "--gt_dir", str(gt_dir),
                  "--strict"])
