"""Apollo / EuRoC / TUM dataset geometries driven end-to-end (VERDICT r3
next-step #5).

The reference serves four datasets through ONE dataset class, switched by
config (SURVEY §2.6): KITTI 376x1241, ApolloScape dumped at 2710x3384 and
RESIZED to 600x800 (apollo_train_corr_baseline.yaml:28-34, the only config
where zoom_xy != 1), TUM 480x640, EuRoC 480x752. Apollo scene directories
carry the reference's Record naming with `_1`/`_5` camera suffixes
(kitti_odo_corr.py:66-69) and — unlike KITTI cam-02 scenes — get NO
cam0->cam2 conjugation (:202-207).

Each test here builds a mini synthetic dump tree shaped exactly like the
dataset (native dump resolution, plausible intrinsics, reference naming),
runs `eval_good` through the CLI, and asserts the standing gt sanity
invariant median_err_q_gt ~ 0 — which fails loudly if the K-scaling
(zoom), the conjugation rule, or the virtual-point geometry is wrong for
that dataset's shape. TUM additionally drives `eval_vo` over the ordered
pair stream.
"""

from __future__ import annotations

import numpy as np
import pytest
import yaml

from deepfepe_tpu.data.kitti import KittiCorrDataset


def _smooth_poses(rng, n_frames):
    """Absolute [N, 3, 4] cam-to-? poses with small relative motion."""
    import cv2

    poses = [np.eye(4)]
    for _ in range(n_frames - 1):
        rvec = rng.randn(3) * 0.02
        R = cv2.Rodrigues(rvec)[0]
        t = np.array([0.05, 0.02, 0.4]) + rng.randn(3) * 0.05
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        poses.append(poses[-1] @ np.linalg.inv(T))
    return np.stack([p[:3] for p in poses]).astype(np.float32)


def _make_dump(root, scene_name, K, size_hw, n_frames, rng,
               Rt_cam2_gt=None, conjugate=False):
    """Write a reference-layout dump tree at the dataset's NATIVE dump
    resolution. Matches are exact projections of shared 3D points, so the
    gt F (as the loader derives it, incl. conjugation) must put them at
    ~zero epipolar distance."""
    H, W = size_hw
    scene = root / scene_name
    scene.mkdir(parents=True)
    np.save(scene / "cam.npy", K.astype(np.float32))
    Rt2 = np.eye(4) if Rt_cam2_gt is None else Rt_cam2_gt
    np.save(scene / "Rt_cam2_gt.npy", Rt2)
    poses = _smooth_poses(rng, n_frames)
    np.save(scene / "poses.npy", poses)
    K_inv = np.linalg.inv(K)

    for i in range(n_frames - 1):
        j = i + 1
        rel = np.linalg.inv(np.vstack([poses[j], [0, 0, 0, 1]])) @ \
            np.vstack([poses[i], [0, 0, 0, 1]])
        if conjugate:
            # The loader will conjugate rel by Rt_cam2_gt for cam-02
            # scenes; generate matches in the CONJUGATED camera frame so
            # gt sanity only holds if the loader applies it.
            rel = Rt2 @ rel @ np.linalg.inv(Rt2)
        R, t = rel[:3, :3], rel[:3, 3]
        # Backproject pixels of frame i at random depth, reproject into j.
        n = 400
        px = np.stack([
            rng.uniform(0.05 * W, 0.95 * W, n),
            rng.uniform(0.05 * H, 0.95 * H, n),
            np.ones(n),
        ], -1)
        Z = rng.uniform(8, 40, n)[:, None]
        X1 = (px @ K_inv.T) * Z
        X2 = X1 @ R.T + t
        ok = X2[:, 2] > 1
        x2 = (X2[ok] / X2[ok, 2:3]) @ K.T
        inb = (
            (x2[:, 0] > 0) & (x2[:, 0] < W - 1)
            & (x2[:, 1] > 0) & (x2[:, 1] < H - 1)
        )
        m = np.concatenate(
            [px[ok][inb, :2], x2[inb, :2],
             np.full((inb.sum(), 1), 150.0)], -1
        ).astype(np.float32)
        assert len(m) >= 60, f"too few in-bounds matches ({len(m)})"
        np.save(scene / f"ij_match_quality_{i}-{j}_all.npy", m)
        np.save(scene / f"ij_match_quality_{i}-{j}_good.npy", m)
    return scene


def _write_config(tmp, tree, scene, image_hw, resize_hw, good_num=100,
                  batch_size=8):
    cfg = {
        "data": {"dataset": "kitti_odo_corr", "dump_root": str(tree),
                 "sequence_length": 2, "delta_ij": 1,
                 "batch_size": batch_size, "good_num": good_num,
                 "image": {"size": [image_hw[0], image_hw[1], 3]},
                 "preprocessing": {"resize": list(resize_hw)},
                 "test_scenes": [scene]},
        "model": {"depth": 3, "clamp_at": 0.02, "if_quality": False},
        "exps": {"five_point": False, "base_name": "opencv_8p",
                 "our_name": "DeepF", "filename": "err_ratio.npz"},
        "training": {"learning_rate": 1.0e-4, "train_iter": 0,
                     "reproduce": True, "seed": 0},
    }
    p = tmp / "geo.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def _run_eval_good(tmp_path, monkeypatch, cfg_path, name):
    from deepfepe_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    return main(["eval_good", str(cfg_path), name, "--max_batches", "1"])


def test_apollo_geometry_eval_good(tmp_path, rng, monkeypatch):
    """Apollo: 2710x3384 dumps resized to 600x800 (zoom != 1 on both
    axes), Record naming with a `_1` cam suffix, Rt_cam2_gt present but
    NOT applied (non-02 camera). A wrong zoom or a wrongly-applied
    conjugation breaks the gt invariant."""
    pytest.importorskip("cv2")
    H, W = 2710, 3384
    K = np.array([[2304.0, 0, W / 2 - 3.0], [0, 2305.5, H / 2 + 2.0],
                  [0, 0, 1]], np.float64)
    # Non-identity Rt_cam2_gt: must be ignored for a `_1` scene.
    import cv2
    Rt2 = np.eye(4)
    Rt2[:3, :3] = cv2.Rodrigues(np.array([0.0, 0.3, 0.0]))[0]
    Rt2[:3, 3] = [0.5, 0.0, 0.1]
    _make_dump(tmp_path / "apollo", "Record028_1", K, (H, W), 9, rng,
               Rt_cam2_gt=Rt2, conjugate=False)
    cfg = _write_config(tmp_path, tmp_path / "apollo", "Record028_1",
                        (H, W), (600, 800))
    summary = _run_eval_good(tmp_path, monkeypatch, cfg, "apollo_eval")
    assert summary["median_err_q_gt"] < 0.1, summary
    # OpenCV-RANSAC baseline on the scaled K must recover the pose too.
    assert summary["median_err_q_base"] < 2.0, summary


def test_apollo_cam5_suffix_inference(tmp_path, rng):
    """A `_5` Record scene must also skip the cam-02 conjugation (loader
    cam-id inference, data/kitti.py:160-176): with a non-identity
    Rt_cam2_gt, the gt F only matches the dumped matches if it was NOT
    conjugated."""
    pytest.importorskip("cv2")
    import cv2

    from deepfepe_tpu.geometry import sym_epi_dist

    import jax.numpy as jnp

    H, W = 2710, 3384
    K = np.array([[2304.0, 0, W / 2], [0, 2304.0, H / 2], [0, 0, 1]],
                 np.float64)
    Rt2 = np.eye(4)
    Rt2[:3, :3] = cv2.Rodrigues(np.array([0.2, 0.0, 0.1]))[0]
    Rt2[:3, 3] = [0.3, 0.1, 0.0]
    _make_dump(tmp_path / "apollo", "Record001_5", K, (H, W), 3, rng,
               Rt_cam2_gt=Rt2, conjugate=False)
    ds = KittiCorrDataset(
        str(tmp_path / "apollo"), scenes=["Record001_5"], good_num=100,
        image_size=(H, W), resize=(600, 800), cam_id="02", seed=0,
    )
    item = ds.get_item(0)
    x1 = np.concatenate([item["matches_xy_ori"][:, :2],
                         np.ones((100, 1), np.float32)], -1)
    x2 = np.concatenate([item["matches_xy_ori"][:, 2:4],
                         np.ones((100, 1), np.float32)], -1)
    d = np.asarray(sym_epi_dist(
        jnp.asarray(item["F_gts"])[None], jnp.asarray(x1)[None],
        jnp.asarray(x2)[None], if_homo=True,
    ))
    assert float(np.median(d)) < 1e-3, float(np.median(d))


def test_euroc_geometry_eval_good(tmp_path, rng, monkeypatch):
    """EuRoC: 480x752 dumps evaluated at native size (no resize)."""
    pytest.importorskip("cv2")
    H, W = 480, 752
    K = np.array([[458.6, 0, 367.2], [0, 457.3, 248.4], [0, 0, 1]],
                 np.float64)
    _make_dump(tmp_path / "euroc", "MH_01", K, (H, W), 9, rng)
    cfg = _write_config(tmp_path, tmp_path / "euroc", "MH_01",
                        (H, W), (H, W))
    summary = _run_eval_good(tmp_path, monkeypatch, cfg, "euroc_eval")
    assert summary["median_err_q_gt"] < 0.1, summary
    assert summary["median_err_q_base"] < 2.0, summary


def test_tum_geometry_eval_good_and_vo(tmp_path, rng, monkeypatch):
    """TUM: 480x640; eval_good + the ordered-pair eval_vo chain (VO
    export + KITTI-metric evaluation over the dump scene)."""
    pytest.importorskip("cv2")
    from deepfepe_tpu.cli import main

    H, W = 480, 640
    K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]],
                 np.float64)
    _make_dump(tmp_path / "tum", "rgbd_fr1", K, (H, W), 9, rng)
    cfg = _write_config(tmp_path, tmp_path / "tum", "rgbd_fr1",
                        (H, W), (H, W))
    summary = _run_eval_good(tmp_path, monkeypatch, cfg, "tum_eval")
    assert summary["median_err_q_gt"] < 0.1, summary

    report = main(["eval_vo", str(cfg), "tum_vo", "--scene", "rgbd_fr1"])
    # Chained gt trajectory exists and the estimated chain is finite
    # (trans%/rot need >=100 m of trajectory — NaN on a mini scene).
    assert np.isfinite(report["ATE_m"]), report
    assert report["n_pairs"] == 8
