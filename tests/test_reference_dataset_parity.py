"""Dump-format parity: the REFERENCE's live dataset class reads OUR dump
tree and must agree field-by-field with our loader.

This closes the format loop from the other side: round-1 validated our
loader against reference-layout trees we wrote; here the reference's own
`KittiCorrOdo` (datasets/kitti_odo_corr.py, executed live with its real
config schema) consumes a tree produced by `data/dump_kitti.dump_sequence`
and its outputs (K/E/F, relative poses, q/t, matches, virtual points) are
checked against `KittiCorrDataset` on the same tree.
"""

from __future__ import annotations

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from _reference_oracle import load_reference, _load_dataset_cls

from deepfepe_tpu.data.kitti import KittiCorrDataset
from deepfepe_tpu.data.synthetic_images import SyntheticImagePairs

cv2 = pytest.importorskip("cv2")

H, W = 120, 160


@pytest.fixture(scope="module")
def dump_tree(tmp_path_factory):
    """3-frame scene '00_02' + train.txt in the reference's list format."""
    from deepfepe_tpu.data.dump_kitti import dump_sequence

    root = tmp_path_factory.mktemp("refds")
    ds = SyntheticImagePairs(image_size=(H, W), seed=21,
                             max_angle_deg=1.0, t_scale=0.08)
    imgs, poses = [], [np.eye(4)]
    for _ in range(2):
        item = ds._sample_item()
        if not imgs:
            imgs.append(item["imgs_grey"][0])
        imgs.append(item["imgs_grey"][1])
        poses.append(item["delta_Rtijs_4_4"].astype(np.float64) @ poses[-1])
    cam2world = [np.linalg.inv(p)[:3] for p in poses]

    files = []
    for i, im in enumerate(imgs):
        f = root / f"src_{i}.jpg"
        cv2.imwrite(str(f), (im * 255).astype(np.uint8))
        files.append(str(f))
    scene = root / "00_02"
    dump_sequence(files, np.stack(cam2world), ds.K, str(scene))
    # Reference frame-list format: '<scene> <frame>\n', scene taken as
    # line[:-8] (kitti_odo_corr.py:61-64).
    with open(root / "train.txt", "w") as f:
        for i in range(2):
            f.write(f"00_02 {i:06d}\n")
    return root


def _ref_config(dump_root):
    """The reference's real kitti_corr_baseline.yaml with the dump root and
    shapes pointed at the test tree."""
    with open(
        "/root/reference/deepFEPE/configs/kitti_corr_baseline.yaml"
    ) as f:
        cfg = yaml.safe_load(f)
    cfg["data"]["dump_root"] = str(dump_root)
    cfg["data"]["good_num"] = 64
    cfg["data"]["image"]["size"] = [H, W, 3]
    cfg["data"]["preprocessing"]["resize"] = [H, W]
    cfg["data"]["read_what"]["with_X"] = False
    return cfg


def test_reference_dataset_reads_our_dump(dump_tree):
    load_reference()
    KittiCorrOdo = _load_dataset_cls()
    cfg = _ref_config(dump_tree)
    ref_ds = KittiCorrOdo(task="train", **cfg)
    assert len(ref_ds) == 2

    ours = KittiCorrDataset(
        str(dump_tree), scenes=["00_02"], good_num=64,
        image_size=(H, W), seed=3,
    )
    assert len(ours) == 2

    for idx in range(2):
        ref = ref_ds[idx]
        mine = ours.get_item(idx)

        np.testing.assert_allclose(ref["K"], mine["Ks"], atol=1e-5)

        # E/F defined up to scale; compare normalized + sign-fixed.
        def canon(M):
            M = np.asarray(M, np.float64)
            M = M / np.linalg.norm(M)
            flat = M.reshape(-1)
            return M * np.sign(flat[np.argmax(np.abs(flat))])

        np.testing.assert_allclose(
            canon(ref["E"]), canon(mine["E_gts"]), atol=1e-5
        )
        np.testing.assert_allclose(
            canon(ref["F"]), canon(mine["F_gts"]), atol=1e-5
        )

        # Relative pose + inverse-pose q/t labels.
        np.testing.assert_allclose(
            ref["relative_scene_poses"][1], mine["delta_Rtijs_4_4"],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ref["q_cam"]).reshape(4), mine["q_cam"], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ref["t_cam"]).reshape(3), mine["t_cam"], atol=1e-5
        )

        # Matches: both crop-or-pad from the same pool with their own rngs;
        # the UNIQUE row sets must be identical subsets of the dump.
        ref_rows = {tuple(r) for r in np.asarray(ref["matches_good"])}
        my_rows = {tuple(r) for r in np.asarray(mine["matches_xy_ori"])}
        pool = np.load(
            dump_tree / "00_02" / f"ij_match_quality_{idx}-{idx+1}_good.npy"
        )[:, :4]
        pool_rows = {tuple(r) for r in pool}
        assert ref_rows <= pool_rows and my_rows <= pool_rows
        assert ref["matches_good_unique_nums"] == int(
            mine["matches_good_unique_nums"]
        )
        # Crop-or-pad draws differ per rng: with more rows than good_num
        # each loader drops a different random subset, so exact unique-set
        # equality is not expected -- only that both nearly cover the pool.
        n_drop = max(0, len(pool) - 64)
        assert len(ref_rows) >= len(pool_rows) - n_drop
        assert len(my_rows) >= len(pool_rows) - n_drop

    # Virtual points: deterministic given F (10x10 grid + correctMatches).
    ref0 = ref_ds[0]
    from deepfepe_tpu.geometry import get_virtual_points

    p1v, p2v = get_virtual_points(
        jnp.asarray(np.asarray(ref0["F"], np.float64))[None], (H, W)
    )
    np.testing.assert_allclose(
        np.asarray(p1v)[0], np.asarray(ref0["pts1_virt"]), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(p2v)[0], np.asarray(ref0["pts2_virt"]), atol=1e-2
    )
