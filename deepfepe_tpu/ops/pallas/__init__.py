"""Pallas TPU kernels (the north-star hot-op set)."""

from .eigh9_pallas import eigh9_pallas
from .epi_residual_pallas import epi_residual_pallas
from .matcher_pallas import mutual_nn_pallas

__all__ = ["eigh9_pallas", "epi_residual_pallas", "mutual_nn_pallas"]
