"""Dump-creation tool test: render synthetic image pairs, dump with SIFT,
reload with the KITTI loader, verify the recovered geometry is consistent."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfepe_tpu import geometry as geo
from deepfepe_tpu.data.kitti import KittiCorrDataset
from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs

cv2 = pytest.importorskip("cv2")


def test_synthetic_image_sequence_epipolar_consistency():
    """Persistent-scene sequence: SIFT matches between consecutive frames
    must lie on the epipolar lines of the chained gt poses."""
    from deepfepe_tpu.data.dump_kitti import knn_match, sift_detect
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence

    seq = SyntheticImageSequence(n_frames=6, seed=3)
    fr = seq.frames()
    K = seq.K
    for i, j in [(0, 1), (4, 5), (0, 3)]:
        p1, d1 = sift_detect((fr[i] * 255).astype(np.uint8), 2000)
        p2, d2 = sift_detect((fr[j] * 255).astype(np.uint8), 2000)
        idx, _ = knn_match(d1, d2, 0.8)
        assert len(idx) > 80, (i, j, len(idx))
        Tij = seq.T_0k_list[j] @ np.linalg.inv(seq.T_0k_list[i])
        R, t = Tij[:3, :3], Tij[:3, 3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
        d, _, _ = geo.epi_distance(
            jnp.asarray(F)[None],
            jnp.asarray(p1[idx[:, 0]])[None],
            jnp.asarray(p2[idx[:, 1]])[None],
        )
        d = np.asarray(d)[0]
        assert np.median(d) < 0.5, (i, j, np.median(d))
        assert np.mean(d < 3.0) > 0.8, (i, j, np.mean(d < 3.0))


def test_image_sequence_pair_batches():
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence

    seq = SyntheticImageSequence(n_frames=7, image_size=(120, 160), seed=2)
    batches = list(seq.pair_batches(4))
    assert len(batches) == 2  # 6 pairs -> 4 + (2 padded to 4)
    b = batches[0]
    assert b["imgs_grey"].shape == (4, 2, 120, 160)
    assert b["pts1_virt"].shape[0] == 4
    assert list(b["frame_i"]) == [0, 1, 2, 3]
    # padded tail repeats the final pair
    assert list(batches[1]["frame_i"]) == [4, 5, 5, 5]
    # gt relative pose matches the chained trajectory
    gt = seq.gt_trajectory()
    rel = np.linalg.inv(gt[1]) @ gt[0]
    np.testing.assert_allclose(
        np.asarray(b["delta_Rtijs_4_4"][0]), rel, atol=1e-5
    )


def test_loader_scene_split(tmp_path):
    """data_loader must respect per-task scene lists (ref: train/val txt
    lists + eval configs pinning seqs 09/10)."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence
    from deepfepe_tpu.loader import data_loader
    from deepfepe_tpu.train import Config

    for scene, seed, n in (("00", 0, 4), ("09", 7, 3)):
        seq = SyntheticImageSequence(n_frames=n, seed=seed)
        files = []
        d = tmp_path / scene
        d.mkdir()
        for k in range(n):
            f = str(d / f"{k:06d}.jpg")
            cv2.imwrite(f, (seq.frame(k) * 255).astype(np.uint8))
            files.append(f)
        dump_sequence(files, seq.cam2world_poses(), seq.K, str(d))

    cfg = Config()
    cfg.data.dataset = "kitti_odo_corr"
    cfg.data.dump_root = str(tmp_path)
    cfg.data.image_size = (240, 320)
    cfg.data.resize = (240, 320)
    cfg.data.good_num = 64
    cfg.data.train_scenes = ["00"]
    cfg.data.test_scenes = ["09"]
    train = data_loader(cfg, "train")
    test = data_loader(cfg, "test")
    assert len(train) == 3 and len(test) == 2
    assert {s["scene_name"] for s in train.samples} == {"00"}
    assert {s["scene_name"] for s in test.samples} == {"09"}
    # val falls back to all scenes when unset
    assert len(data_loader(cfg, "val")) == 5


def test_dump_and_reload_roundtrip(tmp_path, rng):
    from deepfepe_tpu.data.dump_kitti import dump_sequence, match_pair

    # Render a 4-frame "sequence" of textured two-plane scenes: consecutive
    # frames are the two views of one SyntheticImagePairs item.
    ds = SyntheticImagePairs(image_size=(120, 160), seed=1,
                             max_angle_deg=1.0, t_scale=0.08)
    imgs = []
    poses = [np.eye(4)]
    for _ in range(2):
        item = ds._sample_item()
        im1, im2 = item["imgs_grey"]
        if not imgs:
            imgs.append(im1)
        imgs.append(im2)
        # world2cam chain: next = rel @ prev (rel: i -> j).
        poses.append(item["delta_Rtijs_4_4"].astype(np.float64) @ poses[-1])
    # Loader expects cam-to-world gt poses? It builds rel from
    # inv(pad(poses[j])) @ pad(poses[i]) -> poses must be cam-to-world.
    cam2world = [np.linalg.inv(p)[:3] for p in poses]

    img_files = []
    for i, im in enumerate(imgs):
        f = tmp_path / f"{i:06d}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        img_files.append(str(f))

    scene = tmp_path / "00"
    dump_sequence(
        img_files, np.stack(cam2world), ds.K, str(scene), delta_ijs=(1,)
    )

    assert (scene / "cam.npy").is_file()
    assert (scene / "ij_match_quality_0-1_good.npy").is_file()
    m = np.load(scene / "ij_match_quality_0-1_good.npy")
    assert m.shape[1] >= 5 and len(m) > 20, m.shape

    loader = KittiCorrDataset(
        str(tmp_path), good_num=64, image_size=(120, 160), seed=0
    )
    assert len(loader) == 2
    item = loader.get_item(0)
    # SIFT matches must be consistent with the gt F from the pose chain:
    # a solid majority within a few pixels of the epipolar lines.
    d, _, _ = geo.epi_distance(
        jnp.asarray(item["F_gts"]),
        jnp.asarray(item["matches_xy_ori"][None, :, :2]),
        jnp.asarray(item["matches_xy_ori"][None, :, 2:4]),
    )
    frac = float(jnp.mean((d < 3.0).astype(jnp.float32)))
    assert frac > 0.6, frac


def test_image_sequence_delta_pairs():
    # pair_batches(delta=2): gt relative pose composes the two delta-1
    # steps, and the rendered frames satisfy the pair's epipolar geometry.
    from deepfepe_tpu.data.synthetic_images import SyntheticImageSequence

    seq = SyntheticImageSequence(n_frames=8, seed=4, n_corners=20)
    b1 = next(seq.pair_batches(3, delta=1))
    b2 = next(seq.pair_batches(3, delta=2))
    T01 = b1["delta_Rtijs_4_4"][0]
    T12 = b1["delta_Rtijs_4_4"][1]
    T02 = b2["delta_Rtijs_4_4"][0]
    np.testing.assert_allclose(T12 @ T01, T02, atol=1e-5)
    # Frame i+delta of the pair equals the sequence's frame(i+delta).
    np.testing.assert_allclose(
        b2["imgs_grey"][0, 1], seq.frame(2), atol=1e-6
    )
    # E consistency: E from composed pose matches the emitted E up to scale.
    R, t = np.asarray(T02[:3, :3], np.float64), np.asarray(T02[:3, 3], np.float64)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E_emit = np.asarray(b2["E_gts"][0], np.float64)
    E /= np.linalg.norm(E)
    E_emit /= np.linalg.norm(E_emit)
    assert min(np.linalg.norm(E - E_emit), np.linalg.norm(E + E_emit)) < 1e-5


def test_dump_sift_des_roundtrip(tmp_path, rng):
    """with_sift_des: des_good gathers the right per-match descriptor rows
    (ij_idx files written by the dump creator; kitti_odo_corr.py:513-521)."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence

    ds = SyntheticImagePairs(image_size=(120, 160), seed=2,
                             max_angle_deg=1.0, t_scale=0.08)
    item = ds._sample_item()
    im1, im2 = item["imgs_grey"]
    poses = [np.eye(4), item["delta_Rtijs_4_4"].astype(np.float64)]
    cam2world = [np.linalg.inv(p)[:3] for p in poses]
    img_files = []
    for i, im in enumerate([im1, im2]):
        f = tmp_path / f"{i:06d}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        img_files.append(str(f))
    scene = tmp_path / "00"
    dump_sequence(img_files, np.stack(cam2world), ds.K, str(scene))

    idx = np.load(scene / "ij_idx_0-1_good_ij.npy")
    mat = np.load(scene / "ij_match_quality_0-1_good.npy")
    s0 = np.load(scene / "sift_000000.npy")
    s1 = np.load(scene / "sift_000001.npy")
    assert idx.shape == (len(mat), 2)
    # idx points at the keypoints the match coordinates came from.
    np.testing.assert_allclose(s0[idx[:, 0], :2], mat[:, :2], atol=1e-4)
    np.testing.assert_allclose(s1[idx[:, 1], :2], mat[:, 2:4], atol=1e-4)

    loader = KittiCorrDataset(
        str(tmp_path), good_num=48, image_size=(120, 160),
        with_sift_des=True, seed=0,
    )
    item = loader.get_item(0)
    assert item["des_good"].shape == (48, 256)
    # Each padded row's descriptor matches its coordinates' source rows.
    m = item["matches_xy_ori"]
    for r in range(0, 48, 7):
        src = np.where(np.abs(s0[:, :2] - m[r, :2]).sum(1) < 1e-3)[0]
        assert len(src) >= 1
        assert any(
            np.allclose(item["des_good"][r, :128], s0[si, 2:130])
            for si in src
        )


def test_h5_dump_and_reload_matches_npy(tmp_path, rng):
    """Same scene dumped in npy and h5 layouts -> byte-identical samples
    (read_params.use_h5, kitti_odo_corr.py:80)."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence

    ds = SyntheticImagePairs(image_size=(120, 160), seed=5,
                             max_angle_deg=1.0, t_scale=0.08)
    item = ds._sample_item()
    imgs = [item["imgs_grey"][0], item["imgs_grey"][1]]
    poses = [np.eye(4), item["delta_Rtijs_4_4"].astype(np.float64)]
    cam2world = [np.linalg.inv(p)[:3] for p in poses]

    img_files = []
    for i, im in enumerate(imgs):
        f = tmp_path / f"src_{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        img_files.append(str(f))

    for name, h5 in (("npy", False), ("h5", True)):
        dump_sequence(
            img_files, np.stack(cam2world), ds.K,
            str(tmp_path / name / "00"), delta_ijs=(1,), use_h5=h5,
        )

    assert (tmp_path / "h5" / "00" / "ij_match_quality_0-1_good.h5").is_file()
    assert not (
        tmp_path / "h5" / "00" / "ij_match_quality_0-1_good.npy"
    ).exists()

    kw = dict(good_num=64, image_size=(120, 160), seed=7,
              with_matches_all=True, all_num=128, with_sift_des=True)
    a = KittiCorrDataset(str(tmp_path / "npy"), **kw).get_item(0)
    b = KittiCorrDataset(str(tmp_path / "h5"), use_h5=True, **kw).get_item(0)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_with_X_lidar_fields(tmp_path, rng):
    """read_what.with_X: per-frame X_cam0/X_cam2 clouds attach raw at
    batch_size 1 and refuse larger batches (kitti_odo_corr.py:155-379)."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence

    ds = SyntheticImagePairs(image_size=(120, 160), seed=6,
                             max_angle_deg=1.0, t_scale=0.08)
    item = ds._sample_item()
    imgs = [item["imgs_grey"][0], item["imgs_grey"][1]]
    poses = [np.eye(4), item["delta_Rtijs_4_4"].astype(np.float64)]
    cam2world = [np.linalg.inv(p)[:3] for p in poses]
    img_files = []
    for i, im in enumerate(imgs):
        f = tmp_path / f"src_{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        img_files.append(str(f))
    scene = tmp_path / "00"
    dump_sequence(img_files, np.stack(cam2world), ds.K, str(scene))

    # Ragged per-frame clouds, like real lidar scans.
    clouds = {}
    for f, n in ((0, 1000), (1, 1200)):
        for cam in ("cam0", "cam2"):
            X = rng.randn(n + (100 if cam == "cam2" else 0), 3).astype(
                np.float32
            )
            np.save(scene / f"X_{cam}_{f:06d}.npy", X)
            clouds[(cam, f)] = X

    loader = KittiCorrDataset(
        str(tmp_path), good_num=64, image_size=(120, 160), seed=0,
        with_X=True,
    )
    item = loader.get_item(0)
    assert len(item["X_cam0s"]) == 2
    np.testing.assert_array_equal(item["X_cam0s"][0], clouds[("cam0", 0)])
    np.testing.assert_array_equal(item["X_cam2s"][1], clouds[("cam2", 1)])

    b = next(loader.batches(1, shuffle=False))
    assert len(b["X_cam2s"]) == 2
    with pytest.raises(ValueError):
        next(loader.batches(2, shuffle=False, drop_last=False))


def test_oxts_pose_chain():
    """OXTS packets -> poses: first pose identity, straight-north motion
    accumulates in +y (Mercator), yaw rotates the body frame
    (ref: utils_kitti.pose_from_oxts_packet :289)."""
    from deepfepe_tpu.data.dump_kitti import oxts_to_poses

    lat0 = 49.0
    packets = np.array([
        [lat0, 8.43, 112.0, 0.0, 0.0, 0.0],
        [lat0 + 1e-5, 8.43, 112.0, 0.0, 0.0, 0.0],
        [lat0 + 2e-5, 8.43, 112.0, 0.0, 0.0, np.pi / 2],
    ])
    T = oxts_to_poses(packets)
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-12)
    # 1e-5 deg latitude ~ 1.11 m north.
    assert 1.0 < T[1][1, 3] < 1.3
    assert abs(T[1][0, 3]) < 1e-6
    # yaw 90deg: x-axis of frame 2 points along world +y.
    np.testing.assert_allclose(
        T[2][:3, 0], [0.0, 1.0, 0.0], atol=1e-12
    )


def test_velo_to_cam_and_lidar_dump_roundtrip(tmp_path, rng):
    """Synthetic velodyne scan -> X_cam0/X_cam2 dumps -> with_X loader."""
    from deepfepe_tpu.data.dump_kitti import (
        dump_lidar_frames,
        dump_sequence,
        velo_to_cam_points,
    )

    # Calibration: velodyne frame = cam frame rotated (x fwd -> z fwd) +
    # small offset; rectification = small rotation; cam2 = 0.5 m baseline.
    Tr = np.array([
        [0, -1, 0, 0.0],
        [0, 0, -1, -0.08],
        [1, 0, 0, -0.27],
    ], np.float64)
    th = 0.01
    R_rect = np.array([
        [np.cos(th), -np.sin(th), 0],
        [np.sin(th), np.cos(th), 0],
        [0, 0, 1],
    ])
    Rt_cam2 = np.eye(4); Rt_cam2[0, 3] = -0.5
    K = np.array([[700.0, 0, 80], [0, 700.0, 60], [0, 0, 1]])

    # Points ahead of the car (velodyne x = forward).
    velo = np.stack([
        rng.uniform(5, 40, 500),
        rng.uniform(-3, 3, 500),
        rng.uniform(-1.5, 1.5, 500),
    ], -1)
    X0, X2 = velo_to_cam_points(
        velo, Tr, R_rect, Rt_cam2=Rt_cam2, K=K, image_hw=(120, 160)
    )
    assert len(X0) == len(X2) > 50
    # Transform consistency: X2 == Rt_cam2 @ X0.
    np.testing.assert_allclose(
        X2, X0 @ Rt_cam2[:3, :3].T + Rt_cam2[:3, 3], atol=1e-9
    )
    # In-view: all kept points project inside the image.
    px = X2 @ K.T
    px = px[:, :2] / px[:, 2:3]
    assert np.all((px >= -1e-9) & (px < [160, 120]))

    # Full dump + loader roundtrip (scene with matches + lidar files).
    ds = SyntheticImagePairs(image_size=(120, 160), seed=11,
                             max_angle_deg=1.0, t_scale=0.08)
    item = ds._sample_item()
    poses = [np.eye(4), item["delta_Rtijs_4_4"].astype(np.float64)]
    files = []
    for i, im in enumerate(item["imgs_grey"]):
        f = tmp_path / f"s{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        files.append(str(f))
    scene = tmp_path / "00"
    dump_sequence(files, np.stack([np.linalg.inv(p)[:3] for p in poses]),
                  ds.K, str(scene))
    n = dump_lidar_frames(
        [velo, velo], Tr, R_rect, str(scene), Rt_cam2=Rt_cam2,
        K=K, image_hw=(120, 160),
    )
    assert n == 2
    loader = KittiCorrDataset(
        str(tmp_path), good_num=64, image_size=(120, 160), seed=0,
        with_X=True,
    )
    it = loader.get_item(0)
    np.testing.assert_allclose(it["X_cam2s"][0], X2.astype(np.float32))


def test_sp_dump_and_reload(tmp_path):
    """SuperPoint-frontend dump tree -> same loader schema as SIFT dumps
    (ref: the Si vs SP frontend table rows; utils_kitti.load_SP :436)."""
    import jax

    from deepfepe_tpu.data.dump_kitti import dump_sequence_sp
    from deepfepe_tpu.frontend import SuperPointNet

    ds = SyntheticImagePairs(image_size=(120, 160), seed=12,
                             max_angle_deg=1.0, t_scale=0.08)
    item = ds._sample_item()
    poses = [np.eye(4), item["delta_Rtijs_4_4"].astype(np.float64)]
    files = []
    for i, im in enumerate(item["imgs_grey"]):
        f = tmp_path / f"s{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        files.append(str(f))

    net = SuperPointNet()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 120, 160, 1))
    )
    scene = tmp_path / "00"
    dump_sequence_sp(
        files, np.stack([np.linalg.inv(p)[:3] for p in poses]), ds.K,
        str(scene), params, out_num_points=200, nn_thresh=1.5, net=net,
    )
    assert (scene / "ij_match_quality_0-1_good.npy").is_file()
    s0 = np.load(scene / "sift_000000.npy")
    assert s0.shape[1] == 2 + 256  # x y + SP descriptor

    loader = KittiCorrDataset(
        str(tmp_path), good_num=64, image_size=(120, 160), seed=0,
        with_sift_des=True,
    )
    assert len(loader) == 1
    it = loader.get_item(0)
    assert it["matches_xy_ori"].shape == (64, 4)
    assert it["des_good"].shape == (64, 512)  # per-match desc pair
    # Quality col survives the loader's /300 normalization as the raw
    # descriptor distance (in [0, 2]).
    assert np.all(it["quality"] >= 0) and np.all(it["quality"] <= 2.0)
