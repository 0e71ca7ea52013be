"""Generalized symmetric eigensolver — spectral-transform shift modes.

TPU-native counterpart of the reference's SymGEigsShiftSolver
(reference: include/Spectra/SymGEigsShiftSolver.h:147-205 ShiftInvert,
:307-369 Buckling, :399-460 Cayley):

* ``ShiftInvert``: iterate ``(A - sigma B)^{-1} B`` under the B-inner
  product; ``nu = 1/(lambda - sigma)``, back-transform
  ``lambda = sigma + 1/nu`` (reference: :170-176).
* ``Buckling``: ``K x = lambda K_G x`` with K spd; iterate
  ``(K - sigma K_G)^{-1} K`` under the K-inner product;
  ``nu = lambda/(lambda - sigma)``, ``lambda = sigma nu/(nu - 1)``
  (reference: :332-339).
* ``Cayley``: iterate ``x + 2 sigma (A - sigma B)^{-1} B x`` under the
  B-inner product; ``nu = (lambda + sigma)/(lambda - sigma)``,
  ``lambda = sigma (nu + 1)/(nu - 1)`` (reference: :424-431).

As in the reference, the selection rule applies to the transformed
values nu; ``sorting`` orders the returned lambda.
"""

import jax.numpy as jnp

from spectra_tpu.matop.internal_ops import (
    SymGEigsBucklingOp,
    SymGEigsCayleyOp,
    SymGEigsShiftInvertOp,
)
from spectra_tpu.solvers.base import HermEigsBase
from spectra_tpu.util.geigsmode import GEigsMode


def _shift_invert_transform(nu, sigma):
    return sigma + 1.0 / nu


def _buckling_transform(nu, sigma):
    return sigma * nu / (nu - 1.0)


def _cayley_transform(nu, sigma):
    return sigma * (nu + 1.0) / (nu - 1.0)


class SymGEigsShiftSolver(HermEigsBase):
    """Shift-mode generalized symmetric solver.

    Args:
      op: a :class:`~spectra_tpu.matop.sym_shift_invert.SymShiftInvert`
        built from (A, B) — or (K, K_G) in Buckling mode.
      bop: MatProd for B (ShiftInvert/Cayley) or K (Buckling), defining
        both the operator composition and the inner-product metric.
      nev, ncv, sigma: as in the reference.
      mode: ``GEigsMode.ShiftInvert`` (default) / ``Buckling`` / ``Cayley``.
    """

    _mode = "lanczos"

    def __init__(
        self,
        op,
        bop,
        nev: int,
        ncv: int,
        sigma: float,
        mode=GEigsMode.ShiftInvert,
        _factored=None,
    ):
        solve = _factored if _factored is not None else op.set_shift(sigma)
        if mode == GEigsMode.ShiftInvert:
            composed = SymGEigsShiftInvertOp(solve=solve, bop=bop)
            self.__class__ = _ShiftInvertSolver
        elif mode == GEigsMode.Buckling:
            if float(sigma) == 0.0:
                raise ValueError("Buckling mode requires a nonzero shift")
            composed = SymGEigsBucklingOp(solve=solve, kop=bop)
            self.__class__ = _BucklingSolver
        elif mode == GEigsMode.Cayley:
            composed = SymGEigsCayleyOp(
                solve=solve,
                bop=bop,
                sigma=jnp.asarray(sigma, solve.dtype),
            )
            self.__class__ = _CayleySolver
        else:
            raise ValueError(
                "SymGEigsShiftSolver supports ShiftInvert, Buckling and "
                "Cayley modes; use SymGEigsSolver for Cholesky/RegularInverse"
            )
        HermEigsBase.__init__(self, composed, nev, ncv, bop=bop)
        self._sigma = float(sigma)
        self._geigs_mode = mode

    @classmethod
    def from_factored(
        cls, solve, bop, nev: int, ncv: int, sigma: float,
        mode=GEigsMode.ShiftInvert,
    ):
        """Build from an already-factored ``(A - sigma B)^{-1}``
        operator (the result of ``SymShiftInvert(...).set_shift(sigma)``)
        — lets the caller time/persist the one-time factorization
        separately, mirroring ``SymEigsShiftSolver.from_factored``."""
        return cls(None, bop, nev, ncv, sigma, mode, _factored=solve)

    def _transform_aux(self):
        return jnp.asarray(self._sigma, jnp.finfo(self._dtype).dtype)


class _ShiftInvertSolver(SymGEigsShiftSolver):
    _ritz_transform = staticmethod(_shift_invert_transform)


class _BucklingSolver(SymGEigsShiftSolver):
    _ritz_transform = staticmethod(_buckling_transform)


class _CayleySolver(SymGEigsShiftSolver):
    _ritz_transform = staticmethod(_cayley_transform)
