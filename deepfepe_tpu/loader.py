"""Dataset / model factories (parity: utils/loader.py `dataLoader` :63 /
`modelLoader` :117 — string-keyed dispatch from config)."""

from __future__ import annotations

from typing import Iterator

from .data import SyntheticPairs
from .data.kitti import KittiCorrDataset
from .models import DeepFNet
from .train.config import Config


def data_loader(cfg: Config, task: str = "train"):
    """Return an object with .batches(batch_size) -> iterator of batch dicts."""
    d = cfg.data
    # Explicit rejections (see train/config.py audit map): the TPU loader
    # always emits static-shape match tensors and the q/t ground truth —
    # a config that turns them off must fail loudly, not silently no-op.
    if not getattr(d, "with_sift", True):
        raise ValueError(
            "read_what.with_sift=false is not supported: the TPU loader "
            "always emits the match tensors (static-shape batches)"
        )
    if not getattr(d, "with_qt", True):
        raise ValueError(
            "read_what.with_qt=false is not supported: q_cam/t_cam are "
            "always derived from the pose tensors"
        )
    if d.dataset == "synthetic":
        seed = {"train": 0, "val": 1, "test": 2}.get(task, 3)
        gen = SyntheticPairs(
            image_size=tuple(d.image_size),
            good_num=d.good_num,
            noise_px=d.noise_px,
            outlier_frac=d.outlier_frac,
            seed=cfg.training.seed * 10 + seed,
        )

        class _Stream:
            def batches(self, batch_size, steps=None):
                import itertools

                it = itertools.count() if steps is None else range(steps)
                for _ in it:
                    yield gen.batch(batch_size)

        return _Stream()
    elif d.dataset in ("kitti_odo_corr", "apollo", "tum", "euroc"):
        scenes = {
            "train": d.train_scenes,
            "val": d.val_scenes,
            "test": d.test_scenes,
        }.get(task)
        return KittiCorrDataset(
            d.dump_root,
            scenes=list(scenes) if scenes else None,
            delta_ij=d.delta_ij,
            good_num=d.good_num,
            image_size=tuple(d.image_size),
            resize=tuple(d.resize) if d.resize else None,
            seed=cfg.training.seed,
            with_imgs=d.with_imgs,
            img_gamma=d.with_imgs_gamma,
            with_matches_all=d.with_matches_all,
            all_num=d.all_num,
            with_sift_des=d.with_sift_des,
            use_h5=d.use_h5,
            with_X=d.with_X,
            cache_in_memory=d.cache_in_memory,
        )
    elif d.dataset == "synthetic_images":
        # Textured image-pair generator (the joint SP+solver data source
        # the tools drive; exposed as a dataset name so model.if_SP
        # configs are fully config-driven).
        from .data.synthetic_images import SyntheticImagePairs

        seed = {"train": 0, "val": 1, "test": 2}.get(task, 3)
        gen = SyntheticImagePairs(
            image_size=tuple(d.resize or d.image_size),
            seed=cfg.training.seed * 10 + seed,
        )

        class _IStream:
            def batches(self, batch_size, steps=None):
                import itertools

                it = itertools.count() if steps is None else range(steps)
                for _ in it:
                    yield gen.batch(batch_size)

        return _IStream()
    raise ValueError(f"unknown dataset {d.dataset!r}")


def model_loader(cfg: Config) -> DeepFNet:
    """Build the solver net from config (ref model names map to DeepFNet)."""
    import jax.numpy as jnp

    m = cfg.model
    image_size = tuple(cfg.data.resize or cfg.data.image_size)
    mlp_dtype = jnp.bfloat16 if m.mlp_dtype == "bfloat16" else jnp.float32
    return DeepFNet(
        depth=m.depth,
        image_size=image_size,
        if_quality=m.if_quality,
        quality_size=m.quality_size,
        if_learn_offsets=m.if_learn_offsets,
        if_img_w=m.if_img_w,
        if_des=m.if_des,
        des_size=m.des_size,
        if_tri_depth=m.if_tri_depth,
        if_sample_loss=m.if_sample_loss,
        if_goodCorresArch=m.if_goodCorresArch,
        mlp_dtype=mlp_dtype,
        use_pallas_mlp=m.use_pallas_mlp,
    )
