"""Composed operators for the five generalized-symmetric modes.

TPU-native counterparts of the reference's internal mode operators
(reference: include/Spectra/MatOp/internal/SymGEigsCholeskyOp.h:27-87,
SymGEigsRegInvOp.h:25-84, SymGEigsShiftInvertOp.h:28-95,
SymGEigsBucklingOp.h:29-95, SymGEigsCayleyOp.h:28-105). Each is a pure
function composition of its sub-operators — a pytree, so the whole
spectral transform inlines into the compiled IRLM program.
"""

import jax.numpy as jnp

from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass
class SymGEigsCholeskyOp:
    """y = L^{-1} A L^{-H} x — Cholesky mode
    (reference: internal/SymGEigsCholeskyOp.h:27-87)."""

    op: object  # A matprod
    chol: object  # Cholesky of B

    @property
    def dtype(self):
        return self.op.dtype

    def rows(self) -> int:
        return self.op.rows()

    def cols(self) -> int:
        return self.op.cols()

    def perform_op(self, x):
        w = self.chol.upper_triangular_solve(x)
        z = self.op.perform_op(w)
        return self.chol.lower_triangular_solve(z)


@pytree_dataclass
class SymGEigsRegInvOp:
    """y = B^{-1} A x — RegularInverse mode
    (reference: internal/SymGEigsRegInvOp.h:25-84)."""

    op: object  # A matprod
    binv: object  # SparseRegularInverse of B

    @property
    def dtype(self):
        return self.op.dtype

    def rows(self) -> int:
        return self.op.rows()

    def cols(self) -> int:
        return self.op.cols()

    def perform_op(self, x):
        return self.binv.solve(self.op.perform_op(x))


@pytree_dataclass
class SymGEigsShiftInvertOp:
    """y = (A - sigma B)^{-1} B x — ShiftInvert mode
    (reference: internal/SymGEigsShiftInvertOp.h:28-95)."""

    solve: object  # factored (A - sigma B)^{-1}
    bop: object  # B matprod

    @property
    def dtype(self):
        return self.solve.dtype

    def rows(self) -> int:
        return self.solve.rows()

    def cols(self) -> int:
        return self.solve.cols()

    def perform_op(self, x):
        return self.solve.perform_op(self.bop.perform_op(x))


@pytree_dataclass
class SymGEigsBucklingOp:
    """y = (K - sigma K_G)^{-1} K x — Buckling mode; ``kop`` supplies
    K x (reference: internal/SymGEigsBucklingOp.h:29-95)."""

    solve: object  # factored (K - sigma K_G)^{-1}
    kop: object  # K matprod

    @property
    def dtype(self):
        return self.solve.dtype

    def rows(self) -> int:
        return self.solve.rows()

    def cols(self) -> int:
        return self.solve.cols()

    def perform_op(self, x):
        return self.solve.perform_op(self.kop.perform_op(x))


@pytree_dataclass
class SymGEigsCayleyOp:
    """y = x + 2 sigma (A - sigma B)^{-1} B x — Cayley mode
    (reference: internal/SymGEigsCayleyOp.h:28-105, the algebraic
    shortcut for (A - sigma B)^{-1} (A + sigma B))."""

    solve: object
    bop: object
    sigma: jnp.ndarray

    @property
    def dtype(self):
        return self.solve.dtype

    def rows(self) -> int:
        return self.solve.rows()

    def cols(self) -> int:
        return self.solve.cols()

    def perform_op(self, x):
        y = self.solve.perform_op(self.bop.perform_op(x))
        return x + (2.0 * self.sigma) * y
