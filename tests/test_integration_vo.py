"""Full-pipeline VO integration test on a synthetic sequence.

Exercises the complete stack the reference runs for its headline numbers
(SURVEY.md §3.4): per-pair correspondences -> F/E estimation -> pose
recovery -> relative-pose chaining -> KITTI odometry metrics — against a
synthetic sequence with exact ground truth.
"""

import numpy as np

import jax
import jax.numpy as jnp

from deepfepe_tpu import eval as ev
from deepfepe_tpu.data.synthetic_sequence import SyntheticSequence
import pytest


pytestmark = pytest.mark.slow  # end-to-end: excluded from the core numeric suite

def test_sequence_generator_consistency():
    seq = SyntheticSequence(n_frames=8, good_num=128, noise_px=0.0,
                            outlier_frac=0.0, seed=5)
    # Relative poses chain to the gt trajectory.
    rels = np.stack(
        [seq.relative_pose(i, i + 1) for i in range(seq.n_frames - 1)]
    )
    chained = ev.chain_relative_poses(rels)
    np.testing.assert_allclose(chained, seq.gt_trajectory(), atol=1e-8)

    # Pair items geometrically consistent: x2' F x1 ~ 0.
    item = seq._pair_item(2)
    x1 = item["matches_xy_ori"][:, :2]
    x2 = item["matches_xy_ori"][:, 2:4]
    F = item["F_gts"].astype(np.float64)
    x1h = np.concatenate([x1, np.ones((len(x1), 1))], 1)
    x2h = np.concatenate([x2, np.ones((len(x2), 1))], 1)
    resid = np.abs(np.einsum("ni,ij,nj->n", x2h, F, x1h))
    l1 = (x1h @ F.T)[:, :2]
    d = resid / np.linalg.norm(l1, axis=1)
    assert np.median(d) < 0.05


def test_vo_pipeline_ransac_baseline_reaches_kitti_accuracy():
    # 30-frame sequence, mild noise/outliers; estimate every pair with the
    # RANSAC-8pt baseline + cheirality pose recovery, chain, score.
    seq = SyntheticSequence(
        n_frames=30, good_num=384, noise_px=0.3, outlier_frac=0.1, seed=6
    )
    key = jax.random.PRNGKey(0)
    rels = []
    for batch in seq.pair_batches(8):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        key, sub = jax.random.split(key)
        out = ev.val_rt_batch(
            b["E_gts"],  # placeholder est; we score the RANSAC baseline
            b["Ks"],
            b["matches_xy_ori"],
            b["E_gts"],
            b["delta_Rtijs_4_4"],
            ransac_key=sub,
            ransac_hypotheses=256,
            ransac_threshold_px=1.0,
        )
        M = np.asarray(out["M_base"])  # [B, 3, 4] est i->j, unit t
        errq = np.asarray(out["err_q_base"])
        for i in range(M.shape[0]):
            frame = int(batch["frame_i"][i])
            if len(rels) == frame:  # skip padded duplicates
                rels.append((M[i], errq[i]))
    assert len(rels) == seq.n_frames - 1
    med_err_q = float(np.median([e for _, e in rels]))
    assert med_err_q < 1.0, med_err_q

    # Chain with per-frame unit translations (the monocular protocol; global
    # scale recovered by the 'scale' alignment in the metrics).
    M_est = np.stack([m for m, _ in rels])
    traj = ev.chain_relative_poses(M_est)
    gt = seq.gt_trajectory()
    # The synthetic sequence is ~30 m; use matching sub-sequence lengths
    # (the KITTI defaults start at 100 m).
    report = ev.evaluate_sequence(
        gt, traj, align="scale", lengths=(5.0, 10.0, 20.0)
    )
    # Clean-ish synthetic data: strong accuracy expected end-to-end. (Short
    # 5-20 m windows amplify per-frame noise ~6x vs the 100 m protocol.)
    assert report["rot_err_deg_per_100m"] < 6.0, report
    assert report["trans_err_pct"] < 10.0, report
    assert report["ATE_m"] < 2.0, report


def test_cli_eval_vo_pose_graph_fusion(tmp_path, monkeypatch):
    """CLI surface for multi-frame fusion: eval_vo --pose_graph runs a
    delta-2 sweep and the two-stage solve. Invariant: skip edges carry zero
    rotation weight, so the fused trajectory's rotation metrics equal the
    chained ones (rotations untouched), while the fused trajectory file is
    exported alongside."""
    import os

    from deepfepe_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    report = main([
        "eval_vo", "/root/repo/configs/synthetic_baseline.yaml", "pgtest",
        "--n_frames", "8", "--pose_graph",
    ])
    assert "pose_graph" in report
    fused = report["pose_graph"]
    for k in ("trans_err_pct", "rot_err_deg_per_100m", "ATE_m"):
        assert np.isfinite(fused[k]), fused
    assert abs(
        fused["rot_err_deg_per_100m"] - report["rot_err_deg_per_100m"]
    ) < 0.1 * max(1.0, report["rot_err_deg_per_100m"]), (fused, report)
    assert os.path.isfile(
        os.path.join("logs", "pgtest", "trajectory_pose_graph.txt")
    )


def test_sequence_delta_pairs_consistent():
    """delta>1 pair items measure the composed relative pose: the delta-2
    measurement must equal rel(i+1,i+2) @ rel(i,i+1) exactly (gt), matching
    the reference's delta_ij dump semantics."""
    seq = SyntheticSequence(n_frames=6, good_num=64, noise_px=0.0,
                            outlier_frac=0.0, seed=9)
    for i in range(4):
        T2 = seq._pair_item(i, delta=2)["delta_Rtijs_4_4"]
        T_comp = seq.relative_pose(i + 1, i + 2) @ seq.relative_pose(i, i + 1)
        np.testing.assert_allclose(T2, T_comp, atol=1e-6)
    # Batches carry the right frame indices and count.
    batches = list(seq.pair_batches(2, delta=2))
    frames = np.concatenate([b["frame_i"] for b in batches])
    assert set(frames[:4].tolist()) == {0, 1, 2, 3}
