"""Generalized symmetric eigensolver ``A x = lambda B x`` — direct modes.

TPU-native counterpart of the reference's SymGEigsSolver
(reference: include/Spectra/SymGEigsSolver.h:149-215 Cholesky mode,
:251-286 RegularInverse mode):

* ``GEigsMode.Cholesky`` — B = L L^H, solve the standard problem for
  ``L^{-1} A L^{-H}``; eigenvectors are back-solved ``x = L^{-H} v``.
* ``GEigsMode.RegularInverse`` — iterate ``B^{-1} A`` under the
  B-inner product; no factorization of B, only ``B v`` products and
  CG-based ``B^{-1} v`` solves.
"""

from spectra_tpu.matop.internal_ops import SymGEigsCholeskyOp, SymGEigsRegInvOp
from spectra_tpu.solvers.base import HermEigsBase
from spectra_tpu.util.geigsmode import GEigsMode


class SymGEigsSolver(HermEigsBase):
    """Implicitly restarted Lanczos for ``A x = lambda B x`` (B spd).

    Args:
      op: MatProd operator for A.
      bop: mode-dependent operator for B —
        Cholesky mode: a :class:`~spectra_tpu.matop.cholesky.DenseCholesky`
        or :class:`~spectra_tpu.matop.cholesky.SparseCholesky` of B;
        RegularInverse mode: a
        :class:`~spectra_tpu.matop.regular_inverse.SparseRegularInverse`.
      nev, ncv: as in the standard solver.
      mode: ``GEigsMode.Cholesky`` (default) or ``GEigsMode.RegularInverse``.
    """

    _mode = "lanczos"

    def __init__(self, op, bop, nev: int, ncv: int, mode=GEigsMode.Cholesky):
        if mode == GEigsMode.Cholesky:
            composed = SymGEigsCholeskyOp(op=op, chol=bop)
            super().__init__(composed, nev, ncv)
            self._chol = bop
        elif mode == GEigsMode.RegularInverse:
            composed = SymGEigsRegInvOp(op=op, binv=bop)
            super().__init__(composed, nev, ncv, bop=bop)
            self._chol = None
        else:
            raise ValueError(
                "SymGEigsSolver supports Cholesky and RegularInverse modes; "
                "use SymGEigsShiftSolver for ShiftInvert/Buckling/Cayley"
            )
        self._geigs_mode = mode

    def _vector_transform(self, vecs):
        if self._chol is None:
            return vecs
        return self._chol.upper_triangular_solve(vecs)
