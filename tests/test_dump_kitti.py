"""Dump-creation tool test: render synthetic image pairs, dump with SIFT,
reload with the KITTI loader, verify the recovered geometry is consistent."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepfepe_tpu import geometry as geo
from deepfepe_tpu.data.kitti import KittiCorrDataset
from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs

cv2 = pytest.importorskip("cv2")


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
