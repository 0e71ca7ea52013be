"""Shift-and-invert solvers for general (non-symmetric) matrices.

TPU-native counterparts of the reference's GenEigsRealShiftSolver
(reference: include/Spectra/GenEigsRealShiftSolver.h:33-83) and
GenEigsComplexShiftSolver (GenEigsComplexShiftSolver.h:33-157).

The real-shift solver back-transforms ``lambda = 1/nu + sigma``
elementwise inside the compiled core (reference: :49-55).

The complex-shift solver runs the IRAM on the *real-valued* operator
``Re[(A - sigma I)^{-1}]`` whose Ritz values are
``nu = (1/(lambda-sigma) + 1/(lambda-conj(sigma)))/2``; recovering
lambda means solving a quadratic with two roots and *testing both*
against an extra solve with a random real shift — the reference's
root-disambiguation procedure (GenEigsComplexShiftSolver.h:55-128),
reproduced here host-side after the compiled iteration (it needs a
fresh factorization, which is a host-level operation in our design),
including the same SimpleRandom(0) shift draw for bit-compatible
behavior.
"""

import numpy as np
import jax.numpy as jnp

from spectra_tpu.solvers.gen_base import GenEigsBase
from spectra_tpu.util import dtypes
from spectra_tpu.util.rng import SimpleRandom
from spectra_tpu.util.selection import SortRule, argsort


def _real_shift_transform(nu, sigma, ritz_vec, state):
    return 1.0 / nu + sigma


class GenEigsRealShiftSolver(GenEigsBase):
    """IRAM on ``(A - sigma I)^{-1}`` for general matrices, real shift.

    ``op`` must provide ``set_shift(sigma)`` — e.g.
    :class:`~spectra_tpu.matop.shift_solve.DenseGenRealShiftSolve` or
    :class:`~spectra_tpu.matop.shift_solve.SparseGenRealShiftSolve`.
    """

    _ritz_transform = staticmethod(_real_shift_transform)

    def __init__(self, op, nev: int, ncv: int, sigma: float):
        shifted = op.set_shift(sigma)
        super().__init__(shifted, nev, ncv)
        self._sigma = float(sigma)

    def _transform_aux(self):
        return jnp.asarray(self._sigma, jnp.finfo(self._dtype).dtype)


class GenEigsComplexShiftSolver(GenEigsBase):
    """IRAM with a complex shift ``sigma_r + sigma_i i`` on a real matrix.

    ``op`` must provide ``set_shift(sigmar, sigmai)`` and compute
    ``Re[(A - sigma I)^{-1} v]`` — e.g.
    :class:`~spectra_tpu.matop.shift_solve.DenseGenComplexShiftSolve`.
    """

    def __init__(self, op, nev: int, ncv: int, sigmar: float, sigmai: float):
        shifted = op.set_shift(sigmar, sigmai)
        super().__init__(shifted, nev, ncv)
        self._unshifted_op = op
        self._sigmar = float(sigmar)
        self._sigmai = float(sigmai)

    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestMagn,
    ) -> int:
        nconv = super().compute(selection, maxit, tol, sorting=selection)
        self._back_transform(sorting)
        return nconv

    def _back_transform(self, sorting: SortRule):
        """Reference: GenEigsComplexShiftSolver.h:55-128."""
        res = self._result
        if res is None:
            return
        nev = self._nev
        n = self._n
        eps = dtypes.eps(self._dtype)

        # Random real probe shift, same stream as the reference.
        rng = SimpleRandom(0)
        shiftr = rng.random() * self._sigmar + rng.random()
        probe_op = self._unshifted_op.set_shift(float(shiftr), 0.0)

        V = res.V
        vals = np.array(res.values, dtype=np.complex128)
        vecs = np.array(res.vectors_small, dtype=np.complex128)

        i = 0
        while i < nev:
            v = vecs[:, i] @ V
            v_real, v_imag = np.real(v), np.imag(v)
            opv = np.asarray(
                probe_op.perform_op(jnp.asarray(v_real))
            ) + 1j * np.asarray(probe_op.perform_op(jnp.asarray(v_imag)))

            nu = vals[i]
            part1 = self._sigmar + 0.5 / nu
            part2 = 0.5 * np.sqrt(1.0 - 4.0 * self._sigmai**2 * nu * nu) / nu
            root1, root2 = part1 + part2, part1 - part2
            err1 = np.sum(np.abs(opv - v / (root1 - shiftr)) ** 2)
            err2 = np.sum(np.abs(opv - v / (root2 - shiftr)) ** 2)
            lam = root1 if err1 < err2 else root2

            if abs(lam.imag) > eps and i + 1 < nev:
                vals[i] = lam
                vals[i + 1] = np.conj(lam)
                i += 2
            else:
                vals[i] = complex(lam.real, 0.0) if abs(lam.imag) <= eps else lam
                i += 1

        ind = np.asarray(argsort(sorting, jnp.asarray(vals)))
        self._result = res._replace(
            values=vals[ind], vectors_small=vecs[:, ind], conv=res.conv[ind]
        )
