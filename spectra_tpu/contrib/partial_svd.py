"""Truncated (partial) SVD via the symmetric eigensolver.

TPU-native counterpart of the reference's PartialSVDSolver
(reference: include/Spectra/contrib/PartialSVDSolver.h:117-203): run
the implicitly restarted Lanczos solver on the Gram matrix — ``A^H A``
for tall matrices (SVDTallMatOp, :40-73), ``A A^H`` for wide
(:79-112) — with ``LargestAlge`` selection (:156-162), then recover the
other-side singular vectors by scaled cross-multiplication (:173-202).

Each Gram matvec is two MXU products (or two ELL SpMVs); both shard
over a row-partitioned mesh like any MatProd.
"""

import numpy as np
import jax.numpy as jnp

from spectra_tpu.matop.dense import DenseGenMatProd
from spectra_tpu.matop.sparse import SparseGenMatProd, _is_scipy_sparse
from spectra_tpu.solvers.sym_eigs import SymEigsSolver
from spectra_tpu.util.pytree import pytree_dataclass
from spectra_tpu.util.selection import SortRule


@pytree_dataclass(meta_fields=("wide",))
class _GramOp:
    """x -> A^H (A x) (tall) or x -> A (A^H x) (wide)."""

    matop: object
    wide: bool

    @property
    def dtype(self):
        return self.matop.dtype

    def rows(self) -> int:
        return self.matop.rows() if self.wide else self.matop.cols()

    def cols(self) -> int:
        return self.rows()

    def perform_op(self, x):
        if self.wide:
            return self.matop.perform_op(self.matop.perform_adjoint_op(x))
        return self.matop.perform_adjoint_op(self.matop.perform_op(x))


class PartialSVDSolver:
    """Largest ``ncomp`` singular triplets of a dense or sparse matrix.

    Example
    -------
    >>> svds = PartialSVDSolver(A, ncomp=5, ncv=15)
    >>> nconv = svds.compute()
    >>> s, U, V = svds.singular_values(), svds.matrix_U(5), svds.matrix_V(5)
    """

    def __init__(self, mat, ncomp: int, ncv: int):
        if hasattr(mat, "perform_op"):
            # MatProd-protocol operator pass-through (api.svds advertises
            # it). The Gram matvec needs the adjoint product too.
            if not hasattr(mat, "perform_adjoint_op"):
                raise TypeError(
                    "operator input to PartialSVDSolver/svds must expose "
                    "both perform_op and perform_adjoint_op (the Gram "
                    "matvec is A^H(Ax)); got "
                    f"{type(mat).__name__} without perform_adjoint_op"
                )
            self._matop = mat
        elif _is_scipy_sparse(mat):
            self._matop = SparseGenMatProd.create(mat)
        else:
            self._matop = DenseGenMatProd.create(np.asarray(mat))
        self._m = self._matop.rows()
        self._n = self._matop.cols()
        self._wide = self._m < self._n
        self._ncomp = int(ncomp)
        self._eigs = SymEigsSolver(
            _GramOp(matop=self._matop, wide=self._wide), nev=ncomp, ncv=ncv
        )
        self._computed = False
        self._other = None

    def compute(self, maxit: int = 1000, tol: float = 1e-10) -> int:
        """Run the eigensolver on the Gram operator; returns nconv."""
        self._eigs.init()
        nconv = self._eigs.compute(SortRule.LargestAlge, maxit, tol)
        self._computed = True
        self._other = None
        return nconv

    def singular_values(self) -> np.ndarray:
        """Converged singular values, descending."""
        evals = self._eigs.eigenvalues()
        return np.sqrt(np.maximum(evals, 0.0))

    def _evecs(self, nvec):
        return self._eigs.eigenvectors(nvec)

    def _cross(self, nvec):
        """Recover the other-side singular vectors: B = A V S^{-1}
        (tall) or B = A^H U S^{-1} (wide), reference :173-202."""
        vecs = self._evecs(nvec)
        s = self.singular_values()[: vecs.shape[1]]
        applied = (
            self._matop.perform_adjoint_op(jnp.asarray(vecs))
            if self._wide
            else self._matop.perform_op(jnp.asarray(vecs))
        )
        return np.asarray(applied) / s[None, :]

    def matrix_U(self, nu: int) -> np.ndarray:
        """Left singular vectors (m x nu)."""
        nu = min(nu, self._ncomp)
        if self._wide:
            return self._evecs(nu)
        return self._cross(nu)[:, :nu]

    def matrix_V(self, nv: int) -> np.ndarray:
        """Right singular vectors (n x nv)."""
        nv = min(nv, self._ncomp)
        if self._wide:
            return self._cross(nv)[:, :nv]
        return self._evecs(nv)

    def info(self):
        return self._eigs.info()

    def num_iterations(self) -> int:
        return self._eigs.num_iterations()
