"""Sparse matrix-product operators — the per-iteration hot ops.

TPU-native counterparts of the reference's sparse MatProd wrappers
(reference: include/Spectra/MatOp/SparseSymMatProd.h:31-108,
SparseGenMatProd.h:30-108, SparseHermMatProd.h). The device format is
ELLPACK (see :mod:`spectra_tpu.sparse.formats`): the matvec is a
statically-shaped gather + row reduction, and the (cols, vals) arrays
row-partition across a device mesh, with XLA gathering the needed x
entries over ICI.

As with the dense wrappers, the reference's ``Uplo`` triangle selection
is applied once on the host at construction, so the device never pays
for symmetry reconstruction.

``create`` accepts a scipy.sparse matrix or a dense numpy array.
"""

import jax.numpy as jnp
import numpy as np

from spectra_tpu.sparse.formats import (
    DiaHiLoMatrix,
    DiaMatrix,
    EllMatrix,
    dia_device_from_scipy,
    dia_from_scipy,
    dia_suitability,
    ell_from_dense,
    ell_from_scipy,
    symmetrize_scipy,
)
from spectra_tpu.util.pytree import pytree_dataclass


def _is_scipy_sparse(mat) -> bool:
    return hasattr(mat, "tocsr") and hasattr(mat, "shape")


def _to_ell(mat, dtype=None, format: str = "auto"):
    """Device storage selection: ``"auto"`` picks DIA for banded
    matrices (gather-free stencil SpMV), ELL otherwise."""
    if isinstance(mat, (EllMatrix, DiaMatrix, DiaHiLoMatrix)):
        return mat
    if _is_scipy_sparse(mat):
        if format == "dia_hilo":
            return DiaHiLoMatrix.from_dia(dia_from_scipy(mat, dtype=dtype))
        if format == "dia" or (format == "auto" and dia_suitability(mat)):
            if format == "auto":
                # HBM-resident f64 stencils on TPU route to the fused
                # double-single Pallas kernel (ops/dia_ds.py, 3.3x),
                # with the hi/lo split done host-side before transfer.
                return dia_device_from_scipy(mat, dtype=dtype)
            return dia_from_scipy(mat, dtype=dtype)
        return ell_from_scipy(mat, dtype=dtype)
    mat = np.asarray(mat, dtype=dtype)
    if format == "dia":
        import scipy.sparse as sps

        return dia_from_scipy(sps.csr_matrix(mat), dtype=dtype)
    return ell_from_dense(mat)


def _dense_triangle(mat, uplo, conjugate):
    mat = np.asarray(mat)
    if uplo == "L":
        tri = np.tril(mat)
        off = np.tril(mat, -1)
    elif uplo == "U":
        tri = np.triu(mat)
        off = np.triu(mat, 1)
    else:
        raise ValueError("uplo must be 'L' or 'U'")
    return tri + (off.conj().T if conjugate else off.T)


class _EllProdBase:
    """Shared matvec/diagonal/element plumbing over an EllMatrix."""

    @property
    def dtype(self):
        return self.ell.dtype

    def rows(self) -> int:
        return self.ell.n_rows

    def cols(self) -> int:
        return self.ell.n_cols

    def perform_op(self, x):
        if x.ndim == 1:
            return self.ell.matvec(x)
        return self.ell.matmat(x)

    def element(self, i, j):
        return self.ell.element(i, j)

    def diagonal(self):
        return self.ell.diagonal()


@pytree_dataclass
class SparseGenMatProd(_EllProdBase):
    """y = A x for a general sparse (real or complex) matrix."""

    ell: object  # EllMatrix or DiaMatrix

    @classmethod
    def create(cls, mat, dtype=None, format: str = "auto"):
        return cls(ell=_to_ell(mat, dtype, format))

    def perform_trans_op(self, x):
        """y = A^T x (used by the partial-SVD wide/tall Gram operators)."""
        if jnp.iscomplexobj(self.ell.vals):
            return jnp.conj(self.ell.rmatvec(jnp.conj(x)))
        return self.ell.rmatvec(x)

    def perform_adjoint_op(self, x):
        """y = A^H x."""
        return self.ell.rmatvec(x)


@pytree_dataclass
class SparseSymMatProd(_EllProdBase):
    """y = A x for a sparse real symmetric matrix.

    ``create(mat, uplo)`` reads only the requested triangle, mirroring
    the reference's ``selfadjointView`` input convention
    (reference: MatOp/SparseSymMatProd.h:83-89).
    """

    ell: object  # EllMatrix or DiaMatrix

    @classmethod
    def create(cls, mat, uplo: str = "L", dtype=None, format: str = "auto"):
        if _is_scipy_sparse(mat):
            full = symmetrize_scipy(mat, uplo, conjugate=False)
            return cls(ell=_to_ell(full, dtype, format))
        full = _dense_triangle(np.asarray(mat, dtype=dtype), uplo, conjugate=False)
        return cls(ell=ell_from_dense(full))

    @classmethod
    def from_full(cls, mat, dtype=None, format: str = "auto"):
        """Build from an already-symmetric full matrix (no triangle read)."""
        return cls(ell=_to_ell(mat, dtype, format))


@pytree_dataclass
class SparseHermMatProd(_EllProdBase):
    """y = A x for a sparse complex Hermitian matrix."""

    ell: EllMatrix

    @classmethod
    def create(cls, mat, uplo: str = "L", dtype=None):
        if _is_scipy_sparse(mat):
            full = symmetrize_scipy(mat, uplo, conjugate=True)
            return cls(ell=ell_from_scipy(full, dtype=dtype))
        full = _dense_triangle(np.asarray(mat, dtype=dtype), uplo, conjugate=True)
        return cls(ell=ell_from_dense(full))
