"""Real-data readiness playbook rehearsal (VERDICT r2 next-step #9).

Exercises the EXACT command sequence documented in README §"Real-KITTI
readiness playbook" end-to-end on a synthetic stand-in tree, so the first
session that gets real KITTI dumps produces BASELINE.md numbers
immediately instead of debugging plumbing:

  1. verify_dump  — tree integrity (frames, per-delta pair files, counts)
  2. eval_good    — per-pair errors + reference-schema npz dumps
  3. eval_vo --pose_graph --refine_ba — trajectory + result.txt

Every step runs through `cli.main` exactly as the documented commands do.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.slow

H, W = 240, 320
N_FRAMES = 17
GOOD_NUM = 64
BATCH = 8


@pytest.fixture(scope="module")
def kitti_like_tree(tmp_path_factory):
    """A dump tree in the exact reference layout, with delta-1 AND delta-2
    match files (what a real `dump_sequence` run over KITTI produces)."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence

    root = tmp_path_factory.mktemp("kitti_like")
    seq = SyntheticImageSequence(n_frames=N_FRAMES, image_size=(H, W),
                                 step_length=0.45, seed=31)
    files = []
    for i, im in enumerate(seq.frames()):
        f = root / f"src_{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        files.append(str(f))
    scene = root / "09_02"
    dump_sequence(files, seq.cam2world_poses(), seq.K, str(scene),
                  delta_ijs=(1, 2))
    return root


def _config(tree, tmp):
    cfg = {
        "data": {"dataset": "kitti_odo_corr", "dump_root": str(tree),
                 "sequence_length": 2, "delta_ij": 1,
                 "batch_size": BATCH, "good_num": GOOD_NUM,
                 "image": {"size": [H, W, 3]},
                 "preprocessing": {"resize": [H, W]},
                 "test_scenes": ["09_02"]},
        "model": {"depth": 5, "clamp_at": 0.02, "if_quality": True},
        "exps": {"five_point": False, "base_name": "opencv_8p",
                 "our_name": "DeepF", "filename": "err_ratio.npz"},
        "training": {"learning_rate": 1.0e-4, "train_iter": 0,
                     "reproduce": True, "seed": 0},
    }
    p = tmp / "playbook.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_step0_verify_dump(kitti_like_tree):
    from deepfepe_tpu.cli import main

    report = main(["verify_dump", str(kitti_like_tree), "--deltas", "1,2"])
    assert report["ok"]
    s = report["scenes"]["09_02"]
    assert s["n_frames"] == N_FRAMES
    assert s["delta_1"]["pairs"] == N_FRAMES - 1
    assert s["delta_2"]["pairs"] == N_FRAMES - 2
    assert s["delta_1"]["matches_min"] >= 8


def test_step0_verify_dump_catches_breakage(kitti_like_tree, tmp_path):
    """A broken tree (missing pair file) must fail loudly."""
    import shutil

    from deepfepe_tpu.cli import main

    broken = tmp_path / "broken"
    shutil.copytree(kitti_like_tree, broken)
    os.remove(broken / "09_02" / "ij_match_quality_3-4_good.npy")
    with pytest.raises(SystemExit):
        main(["verify_dump", str(broken), "--deltas", "1"])


def test_step1_eval_good(kitti_like_tree, tmp_path, monkeypatch):
    from deepfepe_tpu.cli import main

    cfg = _config(kitti_like_tree, tmp_path)
    monkeypatch.chdir(tmp_path)
    summary = main(["eval_good", str(cfg), "pb_eval"])
    # The reference's standing sanity invariant: gt-E errors ~ 0.
    assert summary["median_err_q_gt"] < 0.5
    assert summary["pairs"] == N_FRAMES - 1
    out = tmp_path / "logs" / "pb_eval"
    for fn in ("DeepF_err_ratio.npz", "opencv_8p_err_ratio.npz"):
        d = np.load(out / fn)
        assert d["err_q"].shape == (N_FRAMES - 1,)
        assert d["relative_poses_body"].shape[1:] == (3, 4)


def test_step2_eval_vo_pose_graph(kitti_like_tree, tmp_path, monkeypatch):
    from deepfepe_tpu.cli import main

    cfg = _config(kitti_like_tree, tmp_path)
    monkeypatch.chdir(tmp_path)
    report = main([
        "eval_vo", str(cfg), "pb_vo", "--pose_graph", "--refine_ba",
        "--lengths", "1.0,2.0,4.0",
    ])
    out = tmp_path / "logs" / "pb_vo"
    # The BASELINE.md-comparable artifact set.
    for fn in ("trajectory_est.txt", "trajectory_gt.txt",
               "trajectory_pose_graph.txt", "result.txt"):
        assert (out / fn).is_file(), fn
    txt = (out / "result.txt").read_text()
    assert "Trans. err. (%)" in txt and "ATE (m)" in txt
    assert np.isfinite(report["pose_graph"]["trans_err_pct"])
    assert report["n_pairs"] == N_FRAMES - 1


def test_step3_baseline_gate(kitti_like_tree, tmp_path, monkeypatch):
    """The one-command BASELINE verdict (cli baseline_gate): eval npz ->
    VO chain -> BASELINE.md comparison table with pass/fail deltas.
    Rehearsed here on the synthetic stand-in tree so the first real-KITTI
    session needs zero plumbing."""
    from deepfepe_tpu.cli import main
    from deepfepe_tpu.eval.vo import export_poses_kitti, rt_pad_np

    cfg = _config(kitti_like_tree, tmp_path)
    monkeypatch.chdir(tmp_path)
    main(["eval_good", str(cfg), "gate_eval"])

    # gt trajectory txt in the reference's kitti_gt_poses layout, named by
    # the two-digit sequence id (the gate strips the cam suffix itself).
    gt_dir = tmp_path / "gt_poses"
    gt_dir.mkdir()
    poses = np.load(kitti_like_tree / "09_02" / "poses.npy")
    export_poses_kitti(rt_pad_np(poses), str(gt_dir / "09.txt"))

    report = main([
        "baseline_gate", "09=logs/gate_eval", "--gt_dir", str(gt_dir),
        "--baseline", "deepF", "--lengths", "2.0,4.0",
    ])
    seq = report["sequences"]["09"]
    assert set(seq["deltas"]) == {
        "trans_err_pct", "rot_err_deg_per_100m", "ATE_m", "RPE_m",
        "RPE_deg",
    }
    for m, v in seq["measured"].items():
        assert np.isfinite(v), (m, v)
    assert isinstance(report["ok"], bool)
    # --strict exits non-zero iff the gate fails.
    if not report["ok"]:
        with pytest.raises(SystemExit):
            main([
                "baseline_gate", "09=logs/gate_eval", "--gt_dir",
                str(gt_dir), "--lengths", "2.0,4.0", "--strict",
            ])
