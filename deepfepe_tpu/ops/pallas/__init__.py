"""Pallas TPU kernels (hot-path ops)."""

from .eigh9_pallas import eigh9_pallas

__all__ = ["eigh9_pallas"]
