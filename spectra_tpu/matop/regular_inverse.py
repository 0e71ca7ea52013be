"""B-operations for the RegularInverse generalized mode.

TPU-native counterpart of the reference's SparseRegularInverse
(reference: include/Spectra/MatOp/SparseRegularInverse.h:37-135):
exposes ``perform_op(x) = B x`` (used as the Lanczos B-inner-product
metric) and ``solve(x) = B^{-1} x`` via conjugate gradients — no
factorization of B at all.

The CG runs fully on-device (``jax.scipy.sparse.linalg.cg`` over the
ELL SpMV), compiled into the outer IRLM program; the reference throws
on CG non-convergence, we surface it through the residual check of the
outer iteration (a non-converged inner solve shows up as a large outer
residual, same observable failure mode).
"""

import jax
import numpy as np

from spectra_tpu.matop.sparse import SparseSymMatProd
from spectra_tpu.sparse.formats import EllMatrix
from spectra_tpu.util import dtypes
from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("cg_maxiter",))
class SparseRegularInverse:
    """B x and CG-based B^{-1} x for sparse SPD B."""

    ell: EllMatrix
    cg_maxiter: int

    @classmethod
    def create(cls, mat, uplo: str = "L", cg_maxiter: int | None = None):
        prod = SparseSymMatProd.create(mat, uplo=uplo)
        n = prod.rows()
        return cls(ell=prod.ell, cg_maxiter=cg_maxiter or 2 * n)

    @property
    def dtype(self):
        return self.ell.dtype

    def rows(self) -> int:
        return self.ell.n_rows

    def cols(self) -> int:
        return self.ell.n_cols

    def perform_op(self, x):
        """y = B x."""
        if x.ndim == 1:
            return self.ell.matvec(x)
        return self.ell.matmat(x)

    def solve(self, x):
        """y = B^{-1} x by conjugate gradients; a non-converged solve
        is poisoned to NaN so the driver reports NumericalIssue
        (reference throws on CG failure,
        SparseRegularInverse.h:105-116)."""
        from spectra_tpu.matop.precond import gershgorin_upper
        from spectra_tpu.matop.shift_solve import _poison_if_unconverged

        eps = dtypes.eps(self.ell.dtype)
        y, _ = jax.scipy.sparse.linalg.cg(
            self.ell.matvec, x, tol=np.sqrt(eps) * 1e-3, maxiter=self.cg_maxiter
        )
        return _poison_if_unconverged(
            self.ell.matvec, y, x, gershgorin_upper(self.ell), accept_bw=1e-8
        )
