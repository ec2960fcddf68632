"""Shared utilities: warps, recursive IO, logging."""

from .io import dict_update, loadh5, loadpklz, saveh5, savepklz
from .warp import (
    bilinear_sample,
    compose,
    fit_affine,
    inverse,
    mtrx2vec,
    transform_image,
    vec2mtrx,
)

__all__ = [k for k in dir() if not k.startswith("_")]
