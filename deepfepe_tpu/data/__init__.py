"""Data pipeline: synthetic oracle pairs + KITTI dump loader."""

from .synthetic import SyntheticPairs

__all__ = ["SyntheticPairs"]
