"""Chebyshev-filtered symmetric eigensolver.

Runs the implicitly restarted Lanczos iteration on the polynomial
filter ``p(A)`` (see :mod:`spectra_tpu.matop.chebyshev`) and recovers
the true eigenvalues as Rayleigh quotients with A. This solves the
clustered-extremal-spectrum regime where direct Lanczos — ours and
ARPACK's — needs hundreds of restarts (e.g. the high end of a 2D grid
Laplacian; BASELINE.md documents authentic ARPACK at 0/10 converged in
301 restarts on the 1M-node case this solver is built for).

No reference counterpart: Spectra/ARPACK have no filtering; this is
the standard filtered-Lanczos/ChASE recipe expressed on the same IRLM
engine.
"""

import numpy as np
import jax.numpy as jnp

from spectra_tpu.matop.chebyshev import ChebyshevFilteredOp, estimate_spectrum_bounds
from spectra_tpu.solvers.base import HermEigsBase
from spectra_tpu.util.selection import SortRule, argsort_np


class ChebSymEigsSolver(HermEigsBase):
    """k extremal eigenpairs of a symmetric operator via Chebyshev
    filtering.

    Args:
      op: symmetric MatProd operator for A.
      nev, ncv: as in SymEigsSolver.
      which: ``"largest"`` or ``"smallest"`` — which end to target.
      degree: filter polynomial degree (matvecs per iteration).
      cut_fraction: the fraction of the spectral span (from the wanted
        end) left OUTSIDE the damped interval; the wanted eigenvalues
        must lie in that window.
      bounds: optional (lo, hi) spectrum enclosure; estimated with a
        short Lanczos run when omitted.
    """

    def __init__(
        self,
        op,
        nev: int,
        ncv: int,
        which: str = "largest",
        degree: int = 20,
        cut_fraction: float = 0.05,
        bounds=None,
    ):
        if which not in ("largest", "smallest"):
            raise ValueError("which must be 'largest' or 'smallest'")
        if bounds is None:
            bounds = estimate_spectrum_bounds(op, safety=0.0)
        lo_all, hi_all = map(float, bounds)
        span = hi_all - lo_all
        # The damped interval must safely cover the whole unwanted side
        # (over-cover by 5% there) while the cut stays strictly inside
        # the spectrum on the wanted side.
        if which == "largest":
            filt_lo = lo_all - 0.05 * span
            filt_hi = hi_all - cut_fraction * span
        else:
            filt_lo = lo_all + cut_fraction * span
            filt_hi = hi_all + 0.05 * span
        self._filtered = ChebyshevFilteredOp.create(op, filt_lo, filt_hi, degree)
        self._base_op = op
        self._which = which
        super().__init__(self._filtered, nev, ncv)

    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 200,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestAlge,
    ) -> int:
        """Run the filtered iteration.

        ``selection`` is accepted for driver-API compatibility but has
        no effect: the target end of the spectrum is fixed by ``which``
        at construction, and the filter maps it onto the
        largest-magnitude eigenvalues of p(A) internally. ``sorting``
        orders the returned (Rayleigh-quotient) eigenvalues.
        """
        del selection
        nconv = super().compute(SortRule.LargestMagn, maxit, tol, SortRule.LargestMagn)
        self._recover_eigenvalues(sorting)
        return nconv

    def _recover_eigenvalues(self, sorting: SortRule):
        res = self._result
        if res is None:
            return
        vecs = res.V.T @ res.vectors_small.astype(res.V.dtype)
        lam = np.asarray(self._filtered.rayleigh_quotients(jnp.asarray(vecs)))
        ind = argsort_np(sorting, lam)
        self._result = res._replace(
            values=lam[ind],
            vectors_small=res.vectors_small[:, ind],
            conv=res.conv[ind],
        )
