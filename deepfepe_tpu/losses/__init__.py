"""Losses: F-loss on virtual points, pose (q,t) loss, regularizer summaries."""

from .f_loss import f_loss, residual_summaries, unique_topk
from .rt_loss import rt_loss

__all__ = ["f_loss", "residual_summaries", "unique_topk", "rt_loss"]
