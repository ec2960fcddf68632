"""KITTI (and ApolloScape/TUM/EuRoC) pre-dumped two-frame dataset loader.

Format-compatible with the reference's offline dump layout
(`datasets/kitti_odo_corr.py` :37-604 + the companion deepFEPE_data repo —
SURVEY.md §2.6). Per scene directory:

  cam.npy                       [3, 3]   intrinsics (pre-resize)
  poses.npy                     [N, 3, 4] gt absolute poses (cam0 frame)
  Rt_cam2_gt.npy                [4, 4]   cam0 -> cam2 transform
  ij_match_quality_{i}-{j}_all.npy   [M, 5+] SIFT matches x1 y1 x2 y2 quality…
  ij_match_quality_{i}-{j}_good.npy  [M, 5+]
  %06d.jpg                      images (optional for the SIFT-only path)

The loader reproduces the reference's __getitem__ semantics: K scaling by
the resize zoom, E/F from the (cam-frame-conjugated) relative pose,
crop-or-pad to `good_num` with the unique-count bookkeeping, quality scaling
(col0 / 300), q/t of the inverse relative pose, and gt-consistent virtual
points. Batches come out in the same schema as `SyntheticPairs`.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ..geometry import get_virtual_points
from .synthetic import _R_to_q_np


def rt_pad_np(Rt: np.ndarray) -> np.ndarray:
    if Rt.shape == (4, 4):
        return Rt
    return np.vstack([Rt, [0.0, 0.0, 0.0, 1.0]])


def crop_or_pad_choice(
    in_num: int, out_num: int, rng: Optional[np.random.RandomState] = None,
    shuffle: bool = True,
) -> np.ndarray:
    """Fixed-N sampling indices (ref: utils_misc.crop_or_pad_choice :139):
    random permutation truncated, padded with replacement — the first
    min(in_num, out_num) entries are unique (relied on by unique_topk)."""
    rng = rng or np.random
    choice = rng.permutation(in_num) if shuffle else np.arange(in_num)
    if in_num >= out_num:
        return choice[:out_num]
    pad = rng.choice(choice, out_num - in_num, replace=True)
    return np.concatenate([choice, pad])


def scale_P(P: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """Scale a 3x4 projection for image resize (ref: utils_kitti.scale_P)."""
    out = P.copy()
    out[0] *= sx
    out[1] *= sy
    return out


class KittiCorrDataset:
    """Two-frame correspondence dataset over a reference-format dump tree."""

    def __init__(
        self,
        dump_root: str,
        scenes: Optional[Sequence[str]] = None,
        delta_ij: int = 1,
        good_num: int = 1000,
        image_size: Tuple[int, int] = (376, 1241),
        resize: Optional[Tuple[int, int]] = None,
        cam_id: str = "02",
        seed: int = 0,
        virtual_iters: int = 8,
        with_imgs: bool = False,
        img_gamma: Optional[float] = None,
        with_matches_all: bool = False,
        all_num: int = 2000,
        with_sift_des: bool = False,
        use_h5: bool = False,
        with_X: bool = False,
        cache_in_memory: bool = False,
    ):
        self.root = Path(dump_root)
        self.delta_ij = delta_ij
        self.good_num = good_num
        self.image_size = image_size
        self.resize = resize or image_size
        self.cam_id = cam_id
        self.rng = np.random.RandomState(seed)
        self.virtual_iters = virtual_iters
        # read_what.with_imgs + with_imgs_gamma (kitti_odo_corr.py:240-262):
        # grayscale frames in [0, 1] for the SP frontend path; optional gamma
        # perturbation (robustness studies, kitti_corr_baselineEval.yaml:23).
        self.with_imgs = with_imgs
        self.img_gamma = img_gamma
        # matches_all: the un-ratio-tested match set padded to all_num=2000
        # (kitti_odo_corr.py:452-480) — used by frontend evals and the
        # matches_all ablations.
        self.with_matches_all = with_matches_all
        self.all_num = all_num
        # des_good [good_num, 256]: per-match SIFT descriptor pairs gathered
        # from sift_%06d.npy via ij_idx files (kitti_odo_corr.py:513-521),
        # for the if_des descriptor-fusion model variants.
        self.with_sift_des = with_sift_des
        # read_params.use_h5 (kitti_odo_corr.py:80-82): per-pair/per-frame
        # payload files carry a .h5 extension instead of .npy. The
        # reference's own h5 read branches are vestigial (bare `pass`),
        # so the h5 payload convention here is ours: one dataset named
        # 'arr' per file (written by data/dump_kitti.py use_h5=True).
        self.use_h5 = use_h5
        self.ext = ".h5" if use_h5 else ".npy"
        # read_what.with_X (kitti_odo_corr.py:155-176, 341-371): per-frame
        # lidar point clouds X_cam0_%06d / X_cam2_%06d. Ragged per frame —
        # like the reference (which attaches them only at batch_size==1,
        # :377-379) they are only allowed in single-item batches.
        self.with_X = with_X
        # data.cache_in_memory (kitti_odo_corr.py:40 config default):
        # memoize raw payload reads (match files, sift arrays, frames)
        # after first touch. The epoch loop re-reads every pair each
        # pass; the reference relies on the torch Dataset living in
        # worker processes with the OS page cache — here it is an
        # explicit dict keyed by path.
        self.cache_in_memory = cache_in_memory
        self._arr_cache: dict = {}
        self.zoom_xy = (
            self.resize[1] / image_size[1],
            self.resize[0] / image_size[0],
        )

        if scenes is None:
            scenes = sorted(
                d.name for d in self.root.iterdir() if d.is_dir()
            )
        self.samples: List[dict] = []
        self._crawl(scenes)

    def _crawl(self, scenes: Sequence[str]) -> None:
        """Index all frame pairs with matches on disk
        (ref: crawl_folders :100-225)."""
        for scene_name in scenes:
            scene = self.root / scene_name
            K = np.load(scene / "cam.npy").astype(np.float32).reshape(3, 3)
            poses = np.load(scene / "poses.npy").astype(np.float32).reshape(
                -1, 3, 4
            )
            Rt_cam2_gt = np.load(scene / "Rt_cam2_gt.npy").astype(np.float64)
            n_frames = len(poses)
            for i in range(n_frames - self.delta_ij):
                j = i + self.delta_ij
                ext = ".h5" if self.use_h5 else ".npy"
                good = scene / f"ij_match_quality_{i}-{j}_good{ext}"
                if not good.is_file():
                    continue
                rel = np.linalg.inv(rt_pad_np(poses[j])) @ rt_pad_np(poses[i])
                # Reference scene names carry the camera id as a suffix
                # (kitti '00_02', apollo '..._1'/'..._5'; kitti_odo_corr.py
                # :66-69) and the cam0->cam2 conjugation applies only to
                # cam '02' (:202-207). Infer per scene — but ONLY when the
                # name matches the reference naming shapes (two-digit kitti
                # seq + cam suffix, or an apollo Record name), so that
                # user-named trees like 'run_1'/'exp_5' keep the
                # constructor cam_id. Log when inference overrides it.
                cam_id = self.cam_id
                inferred = None
                if re.fullmatch(r"\d{2}_(00|02)", scene_name):
                    inferred = scene_name[-2:]
                elif re.fullmatch(r".*[Rr]ecord\d+.*_([15])", scene_name):
                    inferred = scene_name[-2:]  # '_1' / '_5'
                if inferred is not None:
                    if inferred != self.cam_id:
                        print(
                            f"# kitti loader: scene '{scene_name}' implies "
                            f"cam_id {inferred!r} (constructor said "
                            f"{self.cam_id!r}); using {inferred!r}",
                            file=sys.stderr,
                        )
                    cam_id = inferred
                if cam_id == "02":
                    rel = Rt_cam2_gt @ rel @ np.linalg.inv(Rt_cam2_gt)
                self.samples.append(
                    dict(
                        scene=scene,
                        scene_name=scene_name,
                        i=i,
                        j=j,
                        K_ori=K,
                        relative_scene_pose=rel.astype(np.float32),
                        Rt_cam2_gt=Rt_cam2_gt.astype(np.float32),
                    )
                )

    def __len__(self) -> int:
        return len(self.samples)

    def _load_arr(self, base) -> np.ndarray:
        """Load `<base>.npy` or `<base>.h5` per use_h5 (dataset 'arr').

        npy reads go through the first-party C++ parser when its shared
        library is built (data/native_loader.py; ~2x numpy on the dump
        files and GIL-releasing for the threaded prefetcher)."""
        if self.cache_in_memory:
            key = str(base)
            if key not in self._arr_cache:
                self._arr_cache[key] = self._load_arr_uncached(base)
            return self._arr_cache[key]
        return self._load_arr_uncached(base)

    def _load_arr_uncached(self, base) -> np.ndarray:
        if self.use_h5:
            from ..utils.io import loadh5

            return np.asarray(loadh5(f"{base}.h5")["arr"])
        from .native_loader import load_npy, native_available

        if native_available():
            return load_npy(f"{base}.npy")
        return np.load(f"{base}.npy")

    def get_item(self, index: int) -> Dict[str, np.ndarray]:
        s = self.samples[index]
        zx, zy = self.zoom_xy
        P = np.concatenate([s["K_ori"], np.zeros((3, 1), np.float32)], 1)
        K = scale_P(P, zx, zy)[:, :3]

        rel = s["relative_scene_pose"].astype(np.float64)
        R, t = rel[:3, :3], rel[:3, 3]
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = tx @ R
        K64 = K.astype(np.float64)
        F = np.linalg.inv(K64).T @ E @ np.linalg.inv(K64)

        mq = self._load_arr(
            s["scene"] / f"ij_match_quality_{s['i']}-{s['j']}_good"
        ).astype(np.float32)
        matches = mq[:, :4].copy()
        matches[:, 0] *= zx
        matches[:, 1] *= zy
        matches[:, 2] *= zx
        matches[:, 3] *= zy
        # Keep ALL quality columns: the reference's quality_good is
        # matches[:, 4:] with only col0 scaled by /300
        # (kitti_odo_corr.py:495-503) — its real dumps carry TWO quality
        # cols (configs set model.quality_size: 2), and dropping the
        # second one starves if_quality models of an input.
        quality = mq[:, 4:].copy() if mq.shape[1] > 4 else np.ones(
            (len(mq), 1), np.float32
        )
        quality[:, 0] = quality[:, 0] / 300.0  # reference scaling (:503)

        choice = crop_or_pad_choice(len(matches), self.good_num, self.rng)
        unique_num = min(len(matches), self.good_num)

        rel_inv = np.linalg.inv(rel)
        extra = {}
        if self.with_matches_all:
            ma = self._load_arr(
                s["scene"] / f"ij_match_quality_{s['i']}-{s['j']}_all"
            ).astype(np.float32)[:, :4]
            ma[:, 0] *= zx
            ma[:, 1] *= zy
            ma[:, 2] *= zx
            ma[:, 3] *= zy
            choice_all = crop_or_pad_choice(len(ma), self.all_num, self.rng)
            extra["matches_all"] = ma[choice_all]
            extra["matches_all_unique_nums"] = np.int32(
                np.unique(ma, axis=0).shape[0]
            )
        if self.with_sift_des:
            # Reference dump trees name these ij_idx_{i}-{j}_good_ij.npy
            # (kitti_odo_corr.py:344); earlier dumps from our dump_kitti.py
            # used a _good.npy suffix — probe both.
            stem = s["scene"] / f"ij_idx_{s['i']}-{s['j']}"
            ext = ".h5" if self.use_h5 else ".npy"
            for cand in (f"{stem}_good_ij", f"{stem}_good"):
                if Path(cand + ext).exists():
                    idx = self._load_arr(cand)
                    break
            else:
                raise FileNotFoundError(f"{stem}_good_ij{ext}")
            s1 = self._load_arr(s["scene"] / f"sift_{s['i']:06d}")
            s2 = self._load_arr(s["scene"] / f"sift_{s['j']:06d}")
            des = np.concatenate(
                [s1[idx[:, 0], 2:], s2[idx[:, 1], 2:]], 1
            ).astype(np.float32)
            extra["des_good"] = des[choice]  # same pad choice as matches
            # The engine feeds the model's descriptor-fusion input under
            # 'des' (the reference builds data_batch['des'] from des_good,
            # Train_model_pipeline.py:433-446).
            extra["des"] = extra["des_good"]
        if self.with_X:
            # Lidar point clouds (ragged [Ni, 3]); reference attaches the
            # raw arrays (X_cam0s/X_cam2s, kitti_odo_corr.py:341-379).
            for cam in ("cam0", "cam2"):
                extra[f"X_{cam}s"] = [
                    self._load_arr(
                        s["scene"] / f"X_{cam}_{f:06d}"
                    ).astype(np.float32)
                    for f in (s["i"], s["j"])
                ]
        if self.with_imgs:
            extra["imgs_grey"] = np.stack(
                [self._load_grey(s["scene"], s["i"]),
                 self._load_grey(s["scene"], s["j"])]
            )
        return {
            **extra,
            "matches_xy_ori": matches[choice],
            "quality": quality[choice],
            "Ks": K.astype(np.float32),
            "K_invs": np.linalg.inv(K64).astype(np.float32),
            "E_gts": E.astype(np.float32),
            "F_gts": (F / (np.linalg.norm(F) + 1e-20)).astype(np.float32),
            "q_cam": _R_to_q_np(rel_inv[:3, :3]).astype(np.float32),
            "t_cam": rel_inv[:3, 3].astype(np.float32),
            # Forward (non-inverted) relative pose labels + frame metadata
            # (q_scene/t_scene/frame_ids, kitti_odo_corr.py:551-560).
            "q_scene": _R_to_q_np(rel[:3, :3]).astype(np.float32),
            "t_scene": rel[:3, 3].astype(np.float32),
            "frame_ids": np.array([s["i"], s["j"]], np.int32),
            "delta_Rtijs_4_4": rel.astype(np.float32),
            "matches_good_unique_nums": np.int32(unique_num),
            "t_scene_scale": np.float32(np.linalg.norm(t)),
            "Rt_cam2_gt": s["Rt_cam2_gt"],
        }

    def _load_grey(self, scene: Path, frame: int) -> np.ndarray:
        """Load frame `%06d.{jpg,png}` resized to self.resize, grayscale in
        [0, 1], with optional gamma correction (out = in**gamma, gain 1 —
        the skimage.exposure.adjust_gamma call at kitti_odo_corr.py:257)."""
        import cv2

        for ext in ("jpg", "png"):
            f = scene / f"{frame:06d}.{ext}"
            if f.exists():
                break
        else:
            raise FileNotFoundError(f"{scene}/{frame:06d}.(jpg|png)")
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        h, w = self.resize
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        img = img.astype(np.float32) / 255.0
        if self.img_gamma is not None:
            img = img ** np.float32(self.img_gamma)
        return img

    def batches(
        self, batch_size: int, shuffle: bool = True, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = (
            self.rng.permutation(len(self.samples))
            if shuffle
            else np.arange(len(self.samples))
        )
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size and drop_last:
                return
            items = [self.get_item(int(i)) for i in idxs]
            ragged = {"X_cam0s", "X_cam2s"}
            if self.with_X and batch_size != 1:
                raise ValueError(
                    "with_X point clouds are ragged; use batch_size=1 "
                    "(reference semantics, kitti_odo_corr.py:377)"
                )
            out = {
                k: np.stack([it[k] for it in items])
                for k in items[0] if k not in ragged
            }
            for k in ragged & set(items[0]):
                out[k] = items[0][k]  # batch_size == 1: raw list of [Ni, 3]
            F = jnp.asarray(out["F_gts"])
            p1v, p2v = get_virtual_points(
                F, self.resize, iters=self.virtual_iters
            )
            out["pts1_virt"] = np.asarray(p1v, np.float32)
            out["pts2_virt"] = np.asarray(p2v, np.float32)
            yield out

    def ordered_pair_batches(
        self, batch_size: int, scene_name: Optional[str] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Frame-ordered consecutive-pair batches for one scene (VO eval).
        The last partial batch is padded by repeating the final pair; each
        item carries 'frame_i' for de-duplication."""
        idxs = [
            k for k, s in enumerate(self.samples)
            if scene_name is None or s["scene_name"] == scene_name
        ]
        idxs.sort(key=lambda k: self.samples[k]["i"])
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            items = [self.get_item(k) for k in chunk]
            for it, k in zip(items, chunk):
                it["frame_i"] = np.int32(self.samples[k]["i"])
            while len(items) < batch_size:
                items.append(items[-1])
            out = {k: np.stack([it[k] for it in items]) for k in items[0]}
            F = jnp.asarray(out["F_gts"])
            p1v, p2v = get_virtual_points(
                F, self.resize, iters=self.virtual_iters
            )
            out["pts1_virt"] = np.asarray(p1v, np.float32)
            out["pts2_virt"] = np.asarray(p2v, np.float32)
            yield out
