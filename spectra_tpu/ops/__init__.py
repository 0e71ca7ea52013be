"""Hand-written Pallas TPU kernels for the hot operations."""

from spectra_tpu.ops.dia_pallas import dia_spmv_pallas

__all__ = ["dia_spmv_pallas"]
