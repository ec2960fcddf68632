"""Offline dump creation: raw KITTI odometry -> the dump tree the loader reads.

Rebuild of the reference's dump-time tooling (the companion `deepFEPE_data`
repo + `kitti_tools/utils_kitti.py` + `dsac_tools/utils_opencv.py`:
`SIFT_det` :20, `KNN_match` :39): per-frame SIFT keypoints/descriptors,
two-way KNN matching with Lowe's ratio test, per-pair
`ij_match_quality_{i}-{j}_{all,good}.npy` tensors ([N, 5]:
x1 y1 x2 y2 quality), plus `cam.npy` / `poses.npy` / `Rt_cam2_gt.npy`.

Host-side preprocessing by design (SURVEY.md §2.4 keeps dump tooling on the
host); OpenCV is used when present, with a plain-numpy Harris+patch fallback
so the tool works in minimal environments.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


def _have_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


def sift_detect(img_grey: np.ndarray, n_features: int = 2000):
    """Keypoints [N, 2] + descriptors [N, 128] (ref: utils_opencv.SIFT_det)."""
    import cv2

    sift = cv2.SIFT_create(nfeatures=n_features, contrastThreshold=1e-5)
    img8 = np.clip(img_grey * 255.0 if img_grey.max() <= 1.0 else img_grey,
                   0, 255).astype(np.uint8)
    kps, des = sift.detectAndCompute(img8, None)
    if des is None or len(kps) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
    pts = np.array([k.pt for k in kps], np.float32)
    return pts, des.astype(np.float32)


def knn_match(
    des1: np.ndarray, des2: np.ndarray, ratio: float = 0.8
) -> Tuple[np.ndarray, np.ndarray]:
    """Two-NN + Lowe ratio test (ref: utils_opencv.KNN_match :39).

    Returns (idx pairs [M, 2], quality [M, 2]: [dist_second/“score”, ratio]).
    """
    import cv2

    bf = cv2.BFMatcher()
    matches = bf.knnMatch(des1, des2, k=2)
    good, quality = [], []
    for pair in matches:
        if len(pair) < 2:
            continue
        m, nn = pair
        if m.distance < ratio * nn.distance:
            good.append((m.queryIdx, m.trainIdx))
            quality.append((nn.distance, m.distance / (nn.distance + 1e-9)))
    if not good:
        return np.zeros((0, 2), np.int32), np.zeros((0, 2), np.float32)
    return np.array(good, np.int32), np.array(quality, np.float32)


def match_pair(
    img1: np.ndarray, img2: np.ndarray, ratio_all: float = 0.9,
    ratio_good: float = 0.8, n_features: int = 2000,
):
    """Detect + match one frame pair -> (all [Na, 5+], good [Ng, 5+])."""
    p1, d1 = sift_detect(img1, n_features)
    p2, d2 = sift_detect(img2, n_features)
    if len(p1) == 0 or len(p2) == 0:
        z = np.zeros((0, 6), np.float32)
        return z, z

    def build(ratio):
        idx, q = knn_match(d1, d2, ratio)
        if len(idx) == 0:
            return np.zeros((0, 6), np.float32)
        return np.concatenate(
            [p1[idx[:, 0]], p2[idx[:, 1]], q], axis=1
        ).astype(np.float32)

    return build(ratio_all), build(ratio_good)


def dump_sequence(
    image_files: Sequence[str],
    poses: np.ndarray,            # [N, 3, 4] absolute gt poses
    K: np.ndarray,                # [3, 3]
    out_dir: str,
    Rt_cam2_gt: Optional[np.ndarray] = None,
    delta_ijs: Sequence[int] = (1,),
    n_features: int = 2000,
    use_h5: bool = False,
) -> None:
    """Write one scene in the reference dump layout.

    use_h5: per-pair/per-frame payload files (sift_*, ij_match_quality_*,
    ij_idx_*) are written as .h5 (one dataset 'arr') instead of .npy —
    the read_params.use_h5 layout (kitti_odo_corr.py:80)."""
    import cv2

    def save_arr(base, a):
        if use_h5:
            from ..utils.io import saveh5

            saveh5({"arr": np.asarray(a)}, f"{base}.h5")
        else:
            np.save(f"{base}.npy", a)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "cam.npy", K.astype(np.float32))
    np.save(out / "poses.npy", poses.astype(np.float32))
    np.save(
        out / "Rt_cam2_gt.npy",
        (Rt_cam2_gt if Rt_cam2_gt is not None else np.eye(4)).astype(
            np.float64
        ),
    )

    greys = []
    for i, f in enumerate(image_files):
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read {f}")
        greys.append(img)
        # Reference dump trees keep the frames in-scene so with_imgs-driven
        # paths (val_feature --config, joint SP training) can load them;
        # KittiCorrDataset._load_grey expects scene/%06d.{jpg,png}.
        cv2.imwrite(str(out / f"{i:06d}.jpg"), img)

    feats = [sift_detect(g, n_features) for g in greys]
    for i in range(len(greys)):
        # Per-frame sift dump ([N, 130]: x y + 128-d desc), utils_kitti
        # load_sift :429 format.
        p, d = feats[i]
        save_arr(out / f"sift_{i:06d}", np.concatenate([p, d], 1))
        for dij in delta_ijs:
            j = i + dij
            if j >= len(greys):
                continue
            p1, d1 = feats[i]
            p2, d2 = feats[j]
            if len(p1) == 0 or len(p2) == 0:
                continue

            def build(ratio):
                idx, q = knn_match(d1, d2, ratio)
                if len(idx) == 0:
                    return np.zeros((0, 6), np.float32), np.zeros(
                        (0, 2), np.int32
                    )
                mat = np.concatenate(
                    [p1[idx[:, 0]], p2[idx[:, 1]], q], 1
                ).astype(np.float32)
                return mat, idx.astype(np.int32)

            mat_all, idx_all = build(0.9)
            mat_good, idx_good = build(0.8)
            save_arr(out / f"ij_match_quality_{i}-{j}_all", mat_all)
            save_arr(out / f"ij_match_quality_{i}-{j}_good", mat_good)
            # Match indices into the per-frame sift_%06d.npy rows: lets the
            # loader assemble per-match descriptor pairs (des_good) for the
            # if_des fusion variants (kitti_odo_corr.py:513-521).
            # Reference _ij suffix (kitti_odo_corr.py:344); the loader also
            # probes the legacy _all/_good names from earlier dumps.
            save_arr(out / f"ij_idx_{i}-{j}_all_ij", idx_all)
            save_arr(out / f"ij_idx_{i}-{j}_good_ij", idx_good)


def dump_kitti_odometry(
    kitti_root: str,
    out_root: str,
    sequences: Sequence[str],
    delta_ijs: Sequence[int] = (1,),
    cam: str = "image_2",
) -> None:
    """Convert a standard KITTI odometry tree into the dump format.

    Expects {kitti_root}/sequences/NN/{image_2}/*.png,
    {kitti_root}/sequences/NN/calib.txt, {kitti_root}/poses/NN.txt.
    """
    for seq in sequences:
        seq_dir = Path(kitti_root) / "sequences" / seq
        imgs = sorted((seq_dir / cam).glob("*.png")) + sorted(
            (seq_dir / cam).glob("*.jpg")
        )
        poses = np.genfromtxt(
            Path(kitti_root) / "poses" / f"{seq}.txt"
        ).reshape(-1, 3, 4)
        # calib.txt: P0..P3 rows; P2 is the left color cam.
        K = None
        Rt_cam2 = np.eye(4)
        with open(seq_dir / "calib.txt") as f:
            for line in f:
                if line.startswith("P2:"):
                    P = np.fromstring(line[3:], sep=" ").reshape(3, 4)
                    K = P[:, :3]
                    # cam0->cam2 baseline from P2 (KITTI convention).
                    Rt_cam2[:3, 3] = np.linalg.inv(K) @ P[:, 3]
        assert K is not None, f"no P2 in {seq_dir}/calib.txt"
        dump_sequence(
            [str(p) for p in imgs],
            poses,
            K,
            os.path.join(out_root, seq),
            Rt_cam2_gt=Rt_cam2,
            delta_ijs=delta_ijs,
        )


# ---------------------------------------------------------------------------
# Raw-KITTI lidar / OXTS tooling (dump-time, host-side by design —
# SURVEY.md §2.4 keeps dump tooling on the host).
# Rebuild of kitti_tools/utils_kitti.py: pose_from_oxts_packet :289,
# read_calib_file :318, rectify :173 / :340 (velodyne -> cam0/cam2-frame
# point clouds, the X_cam0_%06d / X_cam2_%06d dump files the loader's
# read_what.with_X consumes).
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6378137.0


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def pose_from_oxts_packet(
    lat: float, lon: float, alt: float,
    roll: float, pitch: float, yaw: float,
    scale: float,
) -> np.ndarray:
    """OXTS GPS/IMU packet -> SE(3) pose [4, 4] (Mercator translation +
    ZYX Euler rotation; ref: utils_kitti.pose_from_oxts_packet :289-312,
    itself from pykitti). `scale` = cos(lat0 * pi / 180) of the sequence's
    first packet."""
    ty = lat * np.pi * EARTH_RADIUS_M / 180.0
    tx = scale * lon * np.pi * EARTH_RADIUS_M / 180.0
    t = np.array([tx, ty, alt], np.float64)
    R = _rot_z(yaw) @ _rot_y(pitch) @ _rot_x(roll)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def oxts_to_poses(packets: np.ndarray) -> np.ndarray:
    """[N, 6] (lat lon alt roll pitch yaw) -> [N, 4, 4] poses relative to
    the first frame (ref: utils_kitti.load_cam_poses :60-100 semantics:
    scale from the first latitude, origin at the first pose)."""
    packets = np.asarray(packets, np.float64)
    scale = np.cos(packets[0, 0] * np.pi / 180.0)
    Ts = np.stack([pose_from_oxts_packet(*p, scale) for p in packets])
    return np.linalg.inv(Ts[0]) @ Ts


def read_calib_file(path: str) -> dict:
    """KITTI calib .txt -> {key: float array} (ref: read_calib_file :318)."""
    data = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                data[key.strip()] = np.array(
                    [float(v) for v in value.split()]
                )
            except ValueError:
                data[key.strip()] = value.strip()
    return data


def velo_to_cam_points(
    velo_xyz: np.ndarray,          # [N, 3] velodyne-frame points
    Tr_velo_to_cam: np.ndarray,    # [3, 4] or [4, 4]
    R_rect: np.ndarray,            # [3, 3] cam0 rectifying rotation
    Rt_cam2: Optional[np.ndarray] = None,  # [4, 4] rectified cam0 -> cam2
    K: Optional[np.ndarray] = None,        # [3, 3] for in-view filtering
    image_hw: Optional[Tuple[int, int]] = None,
):
    """Velodyne scan -> rectified-cam0 (X_cam0) and cam2 (X_cam2) clouds.

    X_cam0 = R_rect @ Tr @ X_velo; X_cam2 = Rt_cam2 @ homo(X_cam0)
    (ref: utils_kitti.rectify :173-178 / :340-346). Keeps points in front
    of the camera; with K + image_hw also only those projecting inside the
    cam2 image (the reference's `within` mask :193).

    Returns (X_cam0 [M, 3], X_cam2 [M, 3])."""
    velo_xyz = np.asarray(velo_xyz, np.float64)
    Tr = np.asarray(Tr_velo_to_cam, np.float64)
    if Tr.shape == (3, 4):
        Tr = np.vstack([Tr, [0, 0, 0, 1.0]])
    R4 = np.eye(4)
    R4[:3, :3] = R_rect
    X_h = np.concatenate(
        [velo_xyz, np.ones((len(velo_xyz), 1))], 1
    )  # [N, 4]
    X0_h = (R4 @ Tr @ X_h.T).T          # rectified cam0 frame
    X0 = X0_h[:, :3] / X0_h[:, 3:4]
    Rt2 = np.eye(4) if Rt_cam2 is None else np.asarray(Rt_cam2, np.float64)
    X2_h = (Rt2 @ X0_h.T).T
    X2 = X2_h[:, :3] / X2_h[:, 3:4]

    keep = X2[:, 2] > 0
    if K is not None and image_hw is not None:
        x = X2[keep] @ np.asarray(K, np.float64).T
        px = x[:, :2] / x[:, 2:3]
        H, W = image_hw
        inview = (
            (px[:, 0] >= 0) & (px[:, 0] < W)
            & (px[:, 1] >= 0) & (px[:, 1] < H)
        )
        idx = np.flatnonzero(keep)
        keep = np.zeros(len(X2), bool)
        keep[idx[inview]] = True
    return X0[keep], X2[keep]


def dump_lidar_frames(
    velo_scans,                    # iterable of [N, 3] or [N, 4] arrays
    Tr_velo_to_cam: np.ndarray,
    R_rect: np.ndarray,
    out_dir: str,
    Rt_cam2: Optional[np.ndarray] = None,
    K: Optional[np.ndarray] = None,
    image_hw: Optional[Tuple[int, int]] = None,
    use_h5: bool = False,
) -> int:
    """Write X_cam0_%06d / X_cam2_%06d per frame (the read_what.with_X
    files, kitti_odo_corr.py:155-176). Returns the frame count."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def save_arr(base, a):
        if use_h5:
            from ..utils.io import saveh5

            saveh5({"arr": np.asarray(a)}, f"{base}.h5")
        else:
            np.save(f"{base}.npy", a)

    n = 0
    for i, scan in enumerate(velo_scans):
        X0, X2 = velo_to_cam_points(
            np.asarray(scan)[:, :3], Tr_velo_to_cam, R_rect,
            Rt_cam2=Rt_cam2, K=K, image_hw=image_hw,
        )
        save_arr(out / f"X_cam0_{i:06d}", X0.astype(np.float32))
        save_arr(out / f"X_cam2_{i:06d}", X2.astype(np.float32))
        n += 1
    return n


# ---------------------------------------------------------------------------
# SuperPoint-based dump creation — the reference's SP dump rows (its tables
# compare Si[ft] vs SP frontends; utils_kitti.load_SP :436 reads SP dumps).
# Same file schema as the SIFT path so the loader is frontend-agnostic.
# ---------------------------------------------------------------------------


def sp_detect_frames(
    greys,                       # iterable of [H, W] grayscale uint8/float
    sp_params,                   # flax variables (or None -> random init)
    out_num_points: int = 1000,
    conf_thresh: float = 1e-3,
    net=None,
):
    """Run the SuperPoint frontend on each frame (host-side batch-1 calls;
    dump tooling stays off the training chip by design).

    Returns list of (pts [Ni, 2] float32, desc [Ni, D] float32)."""
    import jax

    import jax.numpy as jnp

    from ..frontend import FrontendParams, SuperPointNet
    from ..frontend.pipeline import run_superpoint

    net = net or SuperPointNet()
    fp = FrontendParams(
        out_num_points=out_num_points, conf_thresh=conf_thresh
    )
    out = []
    run = jax.jit(
        lambda p, im: run_superpoint(net, p, im, fp)
    )
    for g in greys:
        img = np.asarray(g, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        kp = run(sp_params, jnp.asarray(img)[None])
        valid = np.asarray(kp.valid[0])
        pts = np.asarray(kp.xy[0] + kp.offsets[0])[valid]
        desc = np.asarray(kp.desc[0])[valid]
        out.append((pts.astype(np.float32), desc.astype(np.float32)))
    return out


def dump_sequence_sp(
    image_files: Sequence[str],
    poses: np.ndarray,
    K: np.ndarray,
    out_dir: str,
    sp_params,
    Rt_cam2_gt: Optional[np.ndarray] = None,
    delta_ijs: Sequence[int] = (1,),
    out_num_points: int = 1000,
    nn_thresh: float = 1.0,
    use_h5: bool = False,
    net=None,
) -> None:
    """Write one scene in the reference dump layout with a SUPERPOINT
    frontend instead of SIFT: mutual-NN matches, quality col0 = descriptor
    distance scaled by 300 so the loader's SIFT-era /300 normalization
    (kitti_odo_corr.py:503) returns the raw distance in [0, 2]."""
    import cv2

    import jax.numpy as jnp

    from ..frontend.matching import mutual_nn_match

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "cam.npy", K.astype(np.float32))
    np.save(out / "poses.npy", poses.astype(np.float32))
    np.save(
        out / "Rt_cam2_gt.npy",
        (Rt_cam2_gt if Rt_cam2_gt is not None else np.eye(4)).astype(
            np.float64
        ),
    )

    def save_arr(base, a):
        if use_h5:
            from ..utils.io import saveh5

            saveh5({"arr": np.asarray(a)}, f"{base}.h5")
        else:
            np.save(f"{base}.npy", a)

    greys = []
    for i, f in enumerate(image_files):
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read {f}")
        greys.append(img)
        cv2.imwrite(str(out / f"{i:06d}.jpg"), img)

    feats = sp_detect_frames(
        greys, sp_params, out_num_points=out_num_points, net=net
    )
    for i, (p, d) in enumerate(feats):
        # sift_%06d schema: x y + descriptor rows (D=256 here vs SIFT 128;
        # the loader slices [:, 2:] so the width is self-describing).
        save_arr(out / f"sift_{i:06d}", np.concatenate([p, d], 1))
    K_pad = max(len(p) for p, _ in feats) if feats else 0
    for i in range(len(greys)):
        for dij in delta_ijs:
            j = i + dij
            if j >= len(greys):
                continue
            p1, d1 = feats[i]
            p2, d2 = feats[j]
            if len(p1) == 0 or len(p2) == 0:
                continue

            def pad(p, d):
                k = K_pad - len(p)
                return (
                    np.pad(p, ((0, k), (0, 0))),
                    np.pad(d, ((0, k), (0, 0))),
                    np.arange(K_pad) < len(p),
                )

            p1p, d1p, v1 = pad(p1, d1)
            p2p, d2p, v2 = pad(p2, d2)
            m = mutual_nn_match(
                jnp.asarray(d1p)[None], jnp.asarray(d2p)[None],
                jnp.asarray(v1)[None], jnp.asarray(v2)[None],
                nn_thresh=nn_thresh,
            )
            keep = np.asarray(m.valid[0])
            i1 = np.asarray(m.idx1[0])[keep]
            i2 = np.asarray(m.idx2[0])[keep]
            scores = np.asarray(m.scores[0])[keep]
            # [x1 y1 x2 y2 quality ratio-slot]
            mat = np.concatenate(
                [
                    p1[i1], p2[i2],
                    (scores * 300.0)[:, None],
                    scores[:, None],
                ],
                1,
            ).astype(np.float32)
            idx = np.stack([i1, i2], 1).astype(np.int32)
            save_arr(out / f"ij_match_quality_{i}-{j}_all", mat)
            save_arr(out / f"ij_match_quality_{i}-{j}_good", mat)
            save_arr(out / f"ij_idx_{i}-{j}_all_ij", idx)
            save_arr(out / f"ij_idx_{i}-{j}_good_ij", idx)
