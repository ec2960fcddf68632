"""KITTI dump-format loader tests via a synthetic fake dump.

Writes a dump tree in the exact reference layout (cam.npy/poses.npy/
Rt_cam2_gt.npy/ij_match_quality_*_good.npy) populated from the synthetic
oracle generator, then verifies the loader reproduces consistent geometry:
gt F has ~zero epipolar distance on the loaded matches, virtual points
satisfy the gt constraint, and the batch schema matches SyntheticPairs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfepe_tpu import geometry as geo
from deepfepe_tpu.data import SyntheticPairs
from deepfepe_tpu.data.kitti import KittiCorrDataset, crop_or_pad_choice


@pytest.fixture
def fake_dump(tmp_path, rng):
    """Build a 2-scene dump with 6 frames each from consistent geometry."""
    H, W = 376, 1241
    f = 707.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    gen = SyntheticPairs(image_size=(H, W), good_num=300, noise_px=0.0,
                         outlier_frac=0.0, seed=1)

    for scene_i in range(2):
        scene = tmp_path / f"{scene_i:02d}"
        scene.mkdir()
        np.save(scene / "cam.npy", K)
        np.save(scene / "Rt_cam2_gt.npy", np.eye(4))

        # Random smooth trajectory: absolute poses [N, 3, 4].
        poses = [np.eye(4)]
        for _ in range(5):
            R, tv = (
                gen._sample_pose()
            )
            T = np.eye(4)
            T[:3, :3], T[:3, 3] = R, tv
            poses.append(poses[-1] @ np.linalg.inv(T))
        poses_34 = np.stack([p[:3] for p in poses]).astype(np.float32)
        np.save(scene / "poses.npy", poses_34)

        # Per-pair matches generated from the actual relative pose.
        for i in range(5):
            j = i + 1
            rel = np.linalg.inv(np.vstack([poses_34[j], [0, 0, 0, 1]])) @ (
                np.vstack([poses_34[i], [0, 0, 0, 1]])
            )
            R, tv = rel[:3, :3], rel[:3, 3]
            # Project shared 3D points (reuse generator internals).
            n = 120
            X1 = np.stack(
                [
                    gen.rng.uniform(-15, 15, n),
                    gen.rng.uniform(-4, 2, n),
                    gen.rng.uniform(6, 50, n),
                ],
                -1,
            )
            X2 = X1 @ R.T + tv
            ok = (X1[:, 2] > 1) & (X2[:, 2] > 1)
            x1 = (X1[ok] / X1[ok, 2:3]) @ K.T
            x2 = (X2[ok] / X2[ok, 2:3]) @ K.T
            m = np.concatenate(
                [x1[:, :2], x2[:, :2], np.ones((ok.sum(), 1)) * 150.0], -1
            ).astype(np.float32)
            np.save(scene / f"ij_match_quality_{i}-{j}_all.npy", m)
            np.save(scene / f"ij_match_quality_{i}-{j}_good.npy", m)
    return tmp_path


def test_crop_or_pad_choice(rng):
    c = crop_or_pad_choice(10, 6, rng)
    assert len(c) == 6 and len(set(c.tolist())) == 6
    c = crop_or_pad_choice(4, 10, rng)
    assert len(c) == 10
    assert sorted(set(c[:4].tolist())) == [0, 1, 2, 3]  # unique first


def test_kitti_loader_schema_and_geometry(fake_dump):
    ds = KittiCorrDataset(
        str(fake_dump), good_num=128, image_size=(376, 1241), seed=0
    )
    assert len(ds) == 10  # 2 scenes x 5 pairs

    batch = next(ds.batches(4))
    assert batch["matches_xy_ori"].shape == (4, 128, 4)
    assert batch["pts1_virt"].shape == (4, 100, 3)
    for k in ("Ks", "E_gts", "F_gts", "delta_Rtijs_4_4"):
        assert k in batch

    # gt F must have ~zero epipolar distance on the loaded matches.
    d, _, _ = geo.epi_distance(
        jnp.asarray(batch["F_gts"]),
        jnp.asarray(batch["matches_xy_ori"][..., :2]),
        jnp.asarray(batch["matches_xy_ori"][..., 2:4]),
    )
    assert float(jnp.mean(d)) < 0.1, float(jnp.mean(d))

    # Virtual points satisfy the gt constraint.
    r = geo.compute_epi_residual(
        jnp.asarray(batch["pts1_virt"]),
        jnp.asarray(batch["pts2_virt"]),
        jnp.asarray(batch["F_gts"]),
        clamp_at=1e9,
    )
    assert float(jnp.mean(r)) < 0.1

    # q_cam/t_cam consistent with delta_Rtijs_4_4 inverse.
    T_inv = np.linalg.inv(batch["delta_Rtijs_4_4"][0])
    q = np.asarray(
        geo.R_to_q(jnp.asarray(T_inv[:3, :3], jnp.float32))
    )
    np.testing.assert_allclose(q, batch["q_cam"][0], atol=1e-4)
    np.testing.assert_allclose(T_inv[:3, 3], batch["t_cam"][0], atol=1e-5)


def test_kitti_loader_resize_scales_K(fake_dump):
    ds = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(376, 1241),
        resize=(188, 620), seed=0,
    )
    item = ds.get_item(0)
    # K scaled by the zoom factors.
    assert abs(item["Ks"][0, 0] / 707.0 - 620 / 1241) < 1e-5
    assert abs(item["Ks"][1, 1] / 707.0 - 188 / 376) < 1e-5
    # Matches scaled into the resized frame; F consistent there.
    d, _, _ = geo.epi_distance(
        jnp.asarray(item["F_gts"]),
        jnp.asarray(item["matches_xy_ori"][None, :, :2]),
        jnp.asarray(item["matches_xy_ori"][None, :, 2:4]),
    )
    assert float(jnp.mean(d)) < 0.1


def test_ordered_pair_batches(fake_dump):
    ds = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(376, 1241), seed=0
    )
    # Frame-ordered batches for one scene, with frame_i indices.
    seen = []
    for batch in ds.ordered_pair_batches(4, scene_name="00"):
        assert batch["matches_xy_ori"].shape[0] == 4
        seen.extend(int(f) for f in batch["frame_i"])
    # 5 pairs in scene 00; last batch pads by repeating the final pair.
    assert seen[:5] == [0, 1, 2, 3, 4]
    assert len(seen) == 8 and seen[5:] == [4, 4, 4]

    # Chaining gt relative poses of the ordered pairs reproduces the scene
    # trajectory (the eval_vo gt path).
    from deepfepe_tpu.eval import chain_relative_poses

    rels = []
    for batch in ds.ordered_pair_batches(4, scene_name="00"):
        for i in range(4):
            f = int(batch["frame_i"][i])
            if f == len(rels):
                rels.append(batch["delta_Rtijs_4_4"][i])
    traj = chain_relative_poses(np.stack(rels))
    assert traj.shape == (6, 4, 4)
    # Orthonormal rotations all along.
    RtR = np.einsum("nij,nkj->nik", traj[:, :3, :3], traj[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (6, 1, 1)), atol=1e-4)


def test_with_imgs_and_gamma(fake_dump):
    """read_what.with_imgs + with_imgs_gamma (kitti_odo_corr.py:240-262):
    grayscale frames in [0,1] resized to `resize`; gamma = pixel**gamma."""
    import cv2

    rng_np = np.random.default_rng(0)
    for scene_i in range(2):
        scene = fake_dump / f"{scene_i:02d}"
        for f in range(6):
            img = rng_np.integers(0, 256, size=(94, 310), dtype=np.uint8)
            cv2.imwrite(str(scene / f"{f:06d}.png"), img)

    ds = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(94, 310),
        resize=(47, 155), with_imgs=True, seed=0,
    )
    item = ds.get_item(0)
    assert item["imgs_grey"].shape == (2, 47, 155)
    assert item["imgs_grey"].dtype == np.float32
    assert 0.0 <= item["imgs_grey"].min() and item["imgs_grey"].max() <= 1.0

    ds_g = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(94, 310),
        resize=(47, 155), with_imgs=True, img_gamma=0.3, seed=0,
    )
    item_g = ds_g.get_item(0)
    np.testing.assert_allclose(
        item_g["imgs_grey"], item["imgs_grey"] ** np.float32(0.3),
        rtol=1e-5, atol=1e-6,
    )
    # Batches carry the images through stacking.
    batch = next(ds_g.batches(4))
    assert batch["imgs_grey"].shape == (4, 2, 47, 155)


def test_config_maps_read_what_imgs():
    from deepfepe_tpu.train.config import config_from_dict as config_from_yaml_dict

    raw = {"data": {"dataset": "kitti_odo_corr",
                    "read_what": {"with_imgs": True, "with_imgs_gamma": 1}}}
    cfg = config_from_yaml_dict(raw)
    assert cfg.data.with_imgs is True
    assert cfg.data.with_imgs_gamma is None  # gamma 1 == no-op
    raw["data"]["read_what"]["with_imgs_gamma"] = 0.3
    cfg = config_from_yaml_dict(raw)
    assert cfg.data.with_imgs_gamma == 0.3


def test_with_matches_all(fake_dump):
    """matches_all: un-ratio-tested set padded to all_num with a unique
    count (kitti_odo_corr.py:452-480)."""
    ds = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(376, 1241),
        with_matches_all=True, all_num=200, seed=0,
    )
    item = ds.get_item(0)
    assert item["matches_all"].shape == (200, 4)
    assert 0 < int(item["matches_all_unique_nums"]) <= 200
    batch = next(ds.batches(4))
    assert batch["matches_all"].shape == (4, 200, 4)
    # All padded rows are drawn from the on-disk match set.
    raw = np.load(
        list(fake_dump.glob("0*/ij_match_quality_0-1_all.npy"))[0]
    )[:, :4]
    first = ds.samples[0]
    raw0 = np.load(
        first["scene"] / "ij_match_quality_0-1_all.npy"
    )[:, :4].astype(np.float32)
    d = np.abs(item["matches_all"][:, None, :] - raw0[None, :, :]).sum(-1)
    assert np.all(d.min(axis=1) < 1e-4)


def test_q_scene_t_scene_and_frame_ids(fake_dump):
    """q_scene/t_scene are the forward relative pose; q_cam/t_cam the
    inverse (kitti_odo_corr.py:547-560)."""
    from deepfepe_tpu.geometry import q_to_R

    ds = KittiCorrDataset(
        str(fake_dump), good_num=64, image_size=(376, 1241), seed=0
    )
    item = ds.get_item(0)
    assert list(item["frame_ids"]) == [0, 1]
    rel = item["delta_Rtijs_4_4"].astype(np.float64)
    R_scene = np.asarray(q_to_R(jnp.asarray(item["q_scene"])))
    np.testing.assert_allclose(R_scene, rel[:3, :3], atol=1e-5)
    np.testing.assert_allclose(item["t_scene"], rel[:3, 3], atol=1e-5)
    R_cam = np.asarray(q_to_R(jnp.asarray(item["q_cam"])))
    rel_inv = np.linalg.inv(rel)
    np.testing.assert_allclose(R_cam, rel_inv[:3, :3], atol=1e-5)
    np.testing.assert_allclose(item["t_cam"], rel_inv[:3, 3], atol=1e-5)
