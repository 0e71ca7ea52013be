"""Dense matrix-product operators.

TPU-native counterparts of the reference's dense MatProd wrappers
(reference: include/Spectra/MatOp/DenseSymMatProd.h:29-107,
DenseGenMatProd.h:35-113, DenseHermMatProd.h). Each operator is an
immutable pytree of arrays with pure methods, so it passes through
``jax.jit`` and distributes under ``jax.sharding`` — ``perform_op`` on a
row-sharded matrix and replicated/sharded vector lowers to a local GEMV
plus the collectives XLA infers.

The reference's ``Uplo`` template parameter (use only one triangle) is
an *input convention*, not a compute-time concern on TPU: we symmetrize
once at construction so the hot matvec is a plain full GEMV on the MXU.

Operators expose the same duck-typed protocol as the reference
(SURVEY.md "universal contract"): ``rows()``, ``cols()``,
``perform_op(x)``; MatProd operators additionally support matrices in
``perform_op`` (the reference's ``operator*``) and ``element(i, j)``
access used by the Jacobi-Davidson solvers.
"""

import jax.numpy as jnp
import numpy as np

from spectra_tpu.util.pytree import pytree_dataclass


def _symmetrize(mat, uplo):
    """Build the full symmetric matrix from the given triangle."""
    mat = jnp.asarray(mat)
    if uplo == "L":
        tri = jnp.tril(mat)
        return tri + jnp.tril(mat, -1).T
    elif uplo == "U":
        tri = jnp.triu(mat)
        return tri + jnp.triu(mat, 1).T
    raise ValueError("uplo must be 'L' or 'U'")


def _hermitize(mat, uplo):
    mat = jnp.asarray(mat)
    if uplo == "L":
        return jnp.tril(mat) + jnp.conj(jnp.tril(mat, -1)).T
    elif uplo == "U":
        return jnp.triu(mat) + jnp.conj(jnp.triu(mat, 1)).T
    raise ValueError("uplo must be 'L' or 'U'")


@pytree_dataclass
class DenseGenMatProd:
    """y = A x for a general dense (real or complex) matrix."""

    mat: jnp.ndarray

    @classmethod
    def create(cls, mat):
        return cls(mat=jnp.asarray(mat))

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def perform_op(self, x):
        return self.mat @ x

    def perform_trans_op(self, x):
        """y = A^T x (used by the partial-SVD Gram operators)."""
        return self.mat.T @ x

    def perform_adjoint_op(self, x):
        """y = A^H x."""
        return jnp.conj(self.mat).T @ x

    def element(self, i, j):
        return self.mat[i, j]

    def diagonal(self):
        return jnp.diagonal(self.mat)


@pytree_dataclass
class DenseSymMatProd:
    """y = A x for a dense real symmetric matrix.

    ``create(mat, uplo)`` reads only the requested triangle, mirroring
    the reference's ``selfadjointView`` semantics.
    """

    mat: jnp.ndarray

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        return cls(mat=_symmetrize(mat, uplo))

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def perform_op(self, x):
        return self.mat @ x

    def element(self, i, j):
        return self.mat[i, j]

    def diagonal(self):
        return jnp.diagonal(self.mat)


@pytree_dataclass
class DenseHermMatProd:
    """y = A x for a dense complex Hermitian matrix."""

    mat: jnp.ndarray

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        mat = jnp.asarray(mat)
        if not jnp.iscomplexobj(mat):
            mat = mat.astype(jnp.complex128 if mat.dtype == jnp.float64 else jnp.complex64)
        return cls(mat=_hermitize(mat, uplo))

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def perform_op(self, x):
        return self.mat @ x

    def element(self, i, j):
        return self.mat[i, j]

    def diagonal(self):
        return jnp.diagonal(self.mat)
