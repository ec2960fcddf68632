"""Core numeric ops: batched eigensolves and the weighted 8-point solve."""

import jax.numpy as _jnp


def set_nan2zero(x, name: str = "network"):
    """NaN/Inf scrub (parity: models/model_utils.set_nan2zero :5). The safe
    eigensolver makes this unnecessary on the solver path; kept for input
    sanitization of external data."""
    return _jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


from .eigh import (
    DEFAULT_GAP_EPS,
    safe_eigh,
    smallest_eigvec,
    smallest_singular_vec_gram,
)
from .fmatrix import FitResult, weighted_eight_point
from .svd3 import project_E_110, rank2_projection, singular_values_3x3

__all__ = [k for k in dir() if not k.startswith("_")]
