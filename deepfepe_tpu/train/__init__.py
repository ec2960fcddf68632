"""Training engine: config, jitted steps, outer loop, checkpointing."""

from .clamp import QuantileClampScheduler
from .config import Config, DataConfig, ModelConfig, TrainingConfig, config_from_dict, load_config, qt_clamps
from .engine import TrainState, compute_losses, make_eval_step, make_optimizer, make_train_step
from .joint import JointTrainState, make_joint_eval_step, make_joint_train_step
from .loop import MetricLogger, Trainer, load_checkpoint, save_checkpoint
from .orbax_ckpt import CheckpointManagerWrapper, restore_sharded, save_sharded

__all__ = [k for k in dir() if not k.startswith("_")]
