"""Sparse matrix storage for TPU.

The framework's sparse formats are chosen for the TPU memory system,
not translated from the reference's Eigen CSR wrappers:

* :class:`~spectra_tpu.sparse.formats.EllMatrix` — fixed-width padded
  rows (ELLPACK). Every row stores exactly ``L`` (column, value) pairs,
  so an SpMV is a statically-shaped gather + row reduction that XLA
  tiles onto the VPU with no dynamic shapes. The general-purpose
  format.
* :class:`~spectra_tpu.sparse.formats.DiaMatrix` — diagonal (DIA)
  storage for banded/stencil matrices: the SpMV is a handful of
  shifted fused multiply-adds with no gathers at all — the
  speed-of-light representation for grid Laplacians and the format the
  flagship benchmark runs on. ``dia_suitability`` decides when it
  applies.
* :class:`~spectra_tpu.sparse.formats.DiaHiLoMatrix` — DIA stored as
  native f32 hi/lo planes for HBM-resident f64 stencils on
  no-native-f64 TPU chips: one fused Pallas pass over all diagonals
  with double-single accumulation (ops/dia_ds.py), 3.3x the XLA f64
  lowering at the 100M-nnz scale. ``maybe_hilo`` auto-routes.
"""

from spectra_tpu.sparse.formats import (
    DiaHiLoMatrix,
    DiaMatrix,
    EllMatrix,
    dia_from_scipy,
    dia_suitability,
    ell_from_scipy,
    ell_from_dense,
    maybe_hilo,
)

__all__ = [
    "DiaHiLoMatrix",
    "DiaMatrix",
    "EllMatrix",
    "dia_from_scipy",
    "dia_suitability",
    "ell_from_scipy",
    "ell_from_dense",
    "maybe_hilo",
]
