"""Model zoo (parity: reference deepFEPE/models/*)."""

from .deepfnet import DeepFNet
from .error_estimator import (
    ErrorEstimator,
    ErrorEstimatorFeatFusion,
    ErrorEstimatorFeatFusion2Head,
    GoodCorresNet,
    InstanceNorm1d,
)

__all__ = [k for k in dir() if not k.startswith("_")]
