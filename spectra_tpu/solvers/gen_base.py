"""Driver base for general (non-symmetric) eigensolvers.

Counterpart of the reference's GenEigsBase driver shell
(reference: include/Spectra/GenEigsBase.h:150-612): validation bounds
``1 <= nev <= n-2``, ``nev+2 <= ncv <= n`` (GenEigsBase.h:419-423),
deterministic init, and complex Ritz output accessors.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.solvers._gen_core import iram_compute
from spectra_tpu.solvers.base import HermEigsBase
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule


class GenEigsBase(HermEigsBase):
    """Base for IRAM (Arnoldi) solver drivers; Ritz values complex."""

    _mode = "arnoldi"
    _ritz_transform = None

    def __init__(self, op, nev: int, ncv: int, bop=None):
        n = op.rows()
        if op.cols() != n:
            raise ValueError("matrix must be square")
        # reference: GenEigsBase.h:419-423
        if nev < 1 or nev > n - 2:
            raise ValueError("nev must satisfy 1 <= nev <= n - 2, n is the size of matrix")
        if ncv < nev + 2 or ncv > n:
            raise ValueError("ncv must satisfy nev + 2 <= ncv <= n, n is the size of matrix")
        # Intentionally does not call HermEigsBase.__init__: the nev/ncv
        # bounds differ, everything else is set up identically below.
        self._op = op
        from spectra_tpu.matop.arnoldi_op import ArnoldiOp

        self._arnop = ArnoldiOp.create(op, bop)
        self._n = n
        self._nev = int(nev)
        self._ncv = int(ncv)
        self._dtype = jnp.dtype(op.dtype)
        self._info = CompInfo.NotComputed
        self._niter = 0
        self._nops = 0
        self._v0 = None
        self._result = None

    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestMagn,
    ) -> int:
        if self._v0 is None:
            self.init()
        res = iram_compute(
            self._arnop,
            self._v0,
            jax.random.PRNGKey(0),
            jnp.asarray(maxit, jnp.int32),
            jnp.asarray(tol, jnp.finfo(self._dtype).dtype),
            self._transform_aux(),
            nev=self._nev,
            ncv=self._ncv,
            selection=selection,
            sorting=sorting,
            transform=type(self)._ritz_transform,
        )
        res = jax.tree_util.tree_map(lambda x: np.asarray(x), res)
        self._result = res
        nconv = int(res.nconv)
        self._niter = int(res.niter)
        self._nops = int(res.nops)
        self._info = (
            CompInfo.Successful if nconv >= self._nev else CompInfo.NotConverging
        )
        return min(self._nev, nconv)

    def eigenvalues(self) -> np.ndarray:
        """Converged eigenvalues (complex), in sorted order."""
        if self._result is None:
            return np.zeros((0,), np.complex128)
        res = self._result
        return res.values[res.conv]
