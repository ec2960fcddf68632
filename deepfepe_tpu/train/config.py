"""Typed configuration mirroring the reference YAML schema.

The reference drives everything from ad-hoc YAML dicts
(`configs/kitti_corr_baseline.yaml`, loaded in train_good.py:392 and accessed
with `.get()` fallbacks everywhere — SURVEY.md §5.6). Here the same knob set
is a typed dataclass tree with identical defaults, loadable from the same
YAML layout (`data:/model:/exps:/training:` sections), so reference configs
port over directly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class DataConfig:
    dataset: str = "synthetic"
    dump_root: str = ""
    sequence_length: int = 2
    delta_ij: int = 1
    batch_size: int = 4
    good_num: int = 1000
    image_size: Tuple[int, int] = (376, 1241)  # (H, W)
    resize: Optional[Tuple[int, int]] = (376, 1240)
    with_quality: bool = True
    with_pose: bool = True
    # read_what.with_imgs / with_imgs_gamma (kitti_odo_corr.py:240-262):
    # grayscale frames for the SP path; gamma != None perturbs them
    # (robustness studies, kitti_corr_baselineEval.yaml:22-23).
    with_imgs: bool = False
    with_imgs_gamma: Optional[float] = None
    # The un-ratio-tested 2000-match set (kitti_odo_corr.py:452-480).
    with_matches_all: bool = False
    all_num: int = 2000
    # Per-match SIFT descriptor pairs for the if_des fusion variants
    # (read_what.with_sift_des, kitti_odo_corr.py:513-521).
    with_sift_des: bool = False
    # read_params.use_h5 (kitti_odo_corr.py:80): .h5 payload files.
    use_h5: bool = False
    # read_what.with_X (kitti_odo_corr.py:155-176): lidar point clouds.
    with_X: bool = False
    # Per-task scene lists for dump datasets (ref: per-task {train,val}.txt
    # frame lists + eval configs pinning seqs 09/10, kitti_odo_corr.py:100).
    # None -> crawl every scene directory under dump_root.
    train_scenes: Optional[Sequence[str]] = None
    val_scenes: Optional[Sequence[str]] = None
    test_scenes: Optional[Sequence[str]] = None
    # synthetic-only knobs
    noise_px: float = 0.5
    outlier_frac: float = 0.15


@dataclass
class ModelConfig:
    name: str = "DeepFNet"
    depth: int = 5
    clamp_at: float = 0.02
    if_quality: bool = False
    quality_size: int = 1
    if_img_w: bool = False
    if_goodCorresArch: bool = False
    if_learn_offsets: bool = False
    if_tri_depth: bool = False
    if_qt_loss: bool = False
    if_sample_loss: bool = False
    if_des: bool = False
    des_size: int = 0
    if_SP: bool = False
    balance_q: float = 1.0
    balance_t: float = 0.1
    balance_F: float = 100.0
    balance_select_F: float = 0.1
    # MLP matmul compute dtype: 'bfloat16' (full-rate MXU) or 'float32'.
    mlp_dtype: str = "bfloat16"
    # Fused Pallas MLP kernel (TPU; needs bfloat16). Wins MLP
    # microbenchmarks; full-step parity with XLA at bench shapes — see
    # ops/pallas/mlp_pallas.py docstring for the measured analysis.
    use_pallas_mlp: bool = False


@dataclass
class ExpsConfig:
    five_point: bool = False
    base_name: str = "opencv_8p"
    our_name: str = "DeepF"
    filename: str = "err_ratio.npz"


@dataclass
class TrainingConfig:
    learning_rate: float = 1e-4
    lr_decay_step: int = 10
    lr_decay_rate: float = 1.0
    train_iter: int = 100_000
    val_interval: int = 200
    # Val-in-train telemetry (Train_model_pipeline.py:197-233 +
    # configs/kitti_corr_baseline.yaml:81): every N training steps,
    # run the full val-metric computation on the next `val_batches`
    # TRAINING batches and flush under the 'training' task — pose-error
    # telemetry on the training distribution. 0 disables (reference
    # default 1000).
    val_interval_in_train: int = 0
    val_batches: int = 10
    save_interval: int = 200
    # First-party tfevents scalars under <save_dir>/runs (the reference's
    # `tensorboard --logdir runs/train_good` workflow, README.md:244-247).
    tensorboard: bool = True
    # Profiling (SURVEY.md §5.1 — new subsystem, absent in the reference):
    # if profile_dir is set, Trainer.fit captures an xprof device trace of
    # iterations [profile_start, profile_start + profile_steps).
    profile_dir: str = ""
    profile_start: int = 5
    profile_steps: int = 10
    seed: int = 0
    reproduce: bool = False
    retrain: bool = True
    train: bool = True
    pretrained: str = ""
    # qt-loss clamp curriculum (Train_model_pipeline.py:467-489)
    clamp_iter1: int = 3000
    clamp_iter2: int = 6000
    clamp_q_params: Sequence[float] = (0.1, 0.01, 0.001)
    clamp_t_params: Sequence[float] = (0.5, 0.3, 0.1)
    # skip-optimizer quirk (Train_model_pipeline.py:598-639)
    skip_optimizer_enable: bool = False
    skip_optimizer_epi_min: float = 0.001
    # Joint-step match-count floor (check_num_of_matches thd=100,
    # Train_model_pipeline.py:113-115). 0 disables (default: the synthetic
    # recipes tolerate sparse early frontends).
    min_matches: float = 0.0


@dataclass
class Config:
    name: str = "kitti_odo_good_corr"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    exps: ExpsConfig = field(default_factory=ExpsConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def config_from_dict(raw: dict) -> Config:
    """Build a Config from a reference-layout YAML dict (lenient)."""
    data_raw = dict(raw.get("data", {}))
    if "image" in data_raw and isinstance(data_raw["image"], dict):
        size = data_raw["image"].get("size")
        if size:
            data_raw["image_size"] = tuple(size[:2])
    if "preprocessing" in data_raw and isinstance(data_raw["preprocessing"], dict):
        rs = data_raw["preprocessing"].get("resize")
        if rs:
            data_raw["resize"] = tuple(rs[:2])
    rp = data_raw.get("read_params", {})
    if isinstance(rp, dict):
        data_raw.setdefault("use_h5", rp.get("use_h5", False))
    rw = data_raw.get("read_what", {})
    if isinstance(rw, dict):
        data_raw.setdefault("with_quality", rw.get("with_quality", True))
        data_raw.setdefault("with_pose", rw.get("with_pose", True))
        data_raw.setdefault("with_imgs", rw.get("with_imgs", False))
        data_raw.setdefault(
            "with_matches_all", rw.get("with_matches_all", False)
        )
        data_raw.setdefault(
            "with_sift_des", rw.get("with_sift_des", False)
        )
        data_raw.setdefault("with_X", rw.get("with_X", False))
        gamma = rw.get("with_imgs_gamma")
        # The reference treats gamma 1 as a no-op perturbation.
        data_raw.setdefault(
            "with_imgs_gamma", None if gamma in (None, 1, 1.0) else gamma
        )

    train_raw = dict(raw.get("training", {}))
    skip = train_raw.get("skip_optimizer")
    if isinstance(skip, dict):
        train_raw["skip_optimizer_enable"] = skip.get("enable", False)
        train_raw["skip_optimizer_epi_min"] = skip.get("params", {}).get(
            "epi_min", 0.001
        )

    return Config(
        name=raw.get("name", "exp"),
        data=DataConfig(**_filter_kwargs(DataConfig, data_raw)),
        model=ModelConfig(**_filter_kwargs(ModelConfig, dict(raw.get("model", {})))),
        exps=ExpsConfig(**_filter_kwargs(ExpsConfig, dict(raw.get("exps", {})))),
        training=TrainingConfig(**_filter_kwargs(TrainingConfig, train_raw)),
    )


def load_config(path: str) -> Config:
    import yaml

    with open(path) as f:
        return config_from_dict(yaml.safe_load(f))


def qt_clamps(cfg: TrainingConfig, n_iter: int) -> Tuple[float, float]:
    """The qt-loss clamp curriculum (Train_model_pipeline.py:475-489)."""
    if n_iter < cfg.clamp_iter1:
        i = 0
    elif n_iter < cfg.clamp_iter2:
        i = 1
    else:
        i = 2
    return float(cfg.clamp_q_params[i]), float(cfg.clamp_t_params[i])
