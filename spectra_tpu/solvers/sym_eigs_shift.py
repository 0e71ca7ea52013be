"""Shift-and-invert symmetric eigensolver.

TPU-native counterpart of the reference's SymEigsShiftSolver
(reference: include/Spectra/SymEigsShiftSolver.h:149-196): runs the
IRLM on the operator ``(A - sigma I)^{-1}``, whose extremal eigenvalues
``nu = 1/(lambda - sigma)`` correspond to the eigenvalues of A closest
to the shift; Ritz values are back-transformed ``lambda = 1/nu + sigma``
before the final sort (reference: SymEigsShiftSolver.h:163-169).

As in the reference, the *selection* rule refers to the transformed
eigenvalues nu (e.g. ``LargestMagn`` selects the lambda closest to
sigma), while ``sorting`` orders the returned back-transformed lambda.
"""

import jax.numpy as jnp

from spectra_tpu.solvers.base import HermEigsBase


def _shift_invert_transform(nu, sigma):
    return 1.0 / nu + sigma


class SymEigsShiftSolver(HermEigsBase):
    """Implicitly restarted Lanczos on ``(A - sigma I)^{-1}``.

    ``op`` must provide ``set_shift(sigma)`` returning the factorized
    operator — e.g. :class:`~spectra_tpu.matop.shift_solve.DenseSymShiftSolve`
    or :class:`~spectra_tpu.matop.shift_solve.SparseSymShiftSolve`.
    """

    _mode = "lanczos"
    _ritz_transform = staticmethod(_shift_invert_transform)

    def __init__(self, op, nev: int, ncv: int, sigma: float):
        shifted = op.set_shift(sigma)
        super().__init__(shifted, nev, ncv)
        self._sigma = float(sigma)

    @classmethod
    def from_factored(cls, shifted_op, nev: int, ncv: int, sigma: float):
        """Build around an operator already factorized at ``sigma``
        (e.g. to reuse one factorization across solves, or to time
        factorization and iteration separately)."""
        self = cls.__new__(cls)
        HermEigsBase.__init__(self, shifted_op, nev, ncv)
        self._sigma = float(sigma)
        return self

    def _transform_aux(self):
        return jnp.asarray(self._sigma, jnp.finfo(self._dtype).dtype)
