"""Sparse matrix storage for TPU.

The framework's sparse formats are chosen for the TPU memory system,
not translated from the reference's Eigen CSR wrappers:

* :class:`~spectra_tpu.sparse.formats.EllMatrix` — fixed-width padded
  rows (ELLPACK). Every row stores exactly ``L`` (column, value) pairs,
  so an SpMV is a statically-shaped gather + row reduction that XLA
  tiles onto the VPU with no dynamic shapes.
* :class:`~spectra_tpu.sparse.formats.BsrMatrix` — block sparse rows
  with dense ``bs x bs`` blocks that feed the MXU; used by the Pallas
  SpMV kernel.
"""

from spectra_tpu.sparse.formats import (
    EllMatrix,
    ell_from_scipy,
    ell_from_dense,
)

__all__ = ["EllMatrix", "ell_from_scipy", "ell_from_dense"]
