"""Driver base for general (non-symmetric) eigensolvers.

Counterpart of the reference's GenEigsBase driver shell
(reference: include/Spectra/GenEigsBase.h:150-612): validation bounds
``1 <= nev <= n-2``, ``nev+2 <= ncv <= n`` (GenEigsBase.h:419-423),
deterministic init, and complex Ritz output accessors.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.solvers._gen_core import (
    iram_compute,
    iram_finalize,
    iram_restarts,
    iram_start,
)
from spectra_tpu.solvers.base import HermEigsBase, fetch_result_leaf
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
        self._has_bop = bop is not None
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
        self._restart_chunk = None
        self._restart_method = "implicit"
        self._matvec_granularity = False

    def set_matvec_granularity(self, on: bool = True):
        """Bound each device execution to at most ONE operator
        application (same contract as the symmetric drivers'
        :meth:`HermEigsBase.set_matvec_granularity`): routes compute()
        through the host-driven IRAM with per-step factorization and a
        true host sync per step. For operators whose ``perform_op`` is
        itself a long compiled inner iteration (sparse shift-invert
        BiCGStab at n >= 1e6), where one restart per execution already
        exceeds remote-runtime watchdogs."""
        self._matvec_granularity = bool(on)

    def set_restart_method(self, method: str):
        """``"implicit"`` (default): ARPACK-style shifted-QR restarts,
        rule-for-rule the reference's behavior (GenEigsBase.h:44-140).
        ``"krylov_schur"``: Stewart's direct restart — ordered real
        Schur of the Rayleigh matrix + basis truncation (see
        :mod:`spectra_tpu.solvers._gen_ks`); equivalent convergence
        with exact shifts, one host Schur + one GEMM per restart
        instead of O(ncv) sequential QR sweeps. Real dtypes only."""
        if method not in ("implicit", "krylov_schur"):
            raise ValueError(
                "restart method must be 'implicit' or 'krylov_schur'"
            )
        self._restart_method = method

    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestMagn,
    ) -> int:
        if self._v0 is None:
            self.init()
        from spectra_tpu.matop.shift_solve import couple_inner_tolerance

        self._arnop = couple_inner_tolerance(self._arnop, tol)
        from spectra_tpu.solvers import _native_dense

        if _native_dense.eligible(self, sym=False):
            res = _native_dense.compute(self, False, selection, maxit, tol, sorting)
            if res is not None:
                return self._finish_result(res)
        if self._restart_method == "krylov_schur":
            return self._compute_ks(selection, maxit, tol, sorting)
        if self._matvec_granularity or self._use_host_driver():
            return self._compute_host(selection, maxit, tol, sorting)
        tol_arr = jnp.asarray(tol, jnp.finfo(self._dtype).dtype)
        if self._restart_chunk is None:
            res = iram_compute(
                self._arnop,
                self._v0,
                jax.random.PRNGKey(0),
                jnp.asarray(maxit, jnp.int32),
                tol_arr,
                self._transform_aux(),
                nev=self._nev,
                ncv=self._ncv,
                selection=selection,
                sorting=sorting,
                transform=type(self)._ritz_transform,
            )
        else:
            fixed = dict(nev=self._nev, ncv=self._ncv, selection=selection)
            carry = iram_start(
                self._arnop, self._v0, jax.random.PRNGKey(0), tol_arr, **fixed
            )
            budget = 0
            self._history = []
            while budget < maxit:
                budget = min(budget + self._restart_chunk, maxit)
                carry = iram_restarts(
                    self._arnop, carry, tol_arr, jnp.asarray(budget, jnp.int32), **fixed
                )
                nconv, restarts, beta = jax.device_get(
                    (carry.nconv, carry.restarts, carry.state.beta)
                )
                self._history.append(
                    {
                        "restarts": int(restarts),
                        "nconv": int(nconv),
                        "f_norm": float(beta),
                    }
                )
                if int(nconv) >= self._nev or int(restarts) < budget:
                    break
            res = iram_finalize(
                carry,
                self._transform_aux(),
                nev=self._nev,
                sorting=sorting,
                transform=type(self)._ritz_transform,
            )
        return self._finish_result(res)

    def _use_host_driver(self) -> bool:
        """Host-driven loop when the accelerator cannot execute complex
        arithmetic (see solvers/_gen_host.py); overridable via
        SPECTRA_TPU_GEN_DRIVER = auto | host | compiled."""
        mode = os.environ.get("SPECTRA_TPU_GEN_DRIVER", "auto")
        if mode == "host":
            return True
        if mode == "compiled":
            return False
        from spectra_tpu.util import capabilities
        from spectra_tpu.util.capabilities import complex_supported

        # Probe eagerly here, outside any trace: hessenberg_eigen reads
        # the cached result during tracing of the compiled core.
        capabilities.resolve()

        if complex_supported():
            return False
        if jnp.issubdtype(self._dtype, jnp.complexfloating):
            raise RuntimeError(
                "complex matrices are not supported on this accelerator "
                "(no complex arithmetic); run under the CPU backend, e.g. "
                "jax.config.update('jax_platforms', 'cpu')"
            )
        return True

    def _compute_ks(self, selection, maxit, tol, sorting) -> int:
        from spectra_tpu.solvers._gen_ks import iram_compute_ks

        if jnp.issubdtype(self._dtype, jnp.complexfloating):
            raise ValueError(
                "krylov_schur restarting is implemented for real "
                "matrices; use set_restart_method('implicit') for "
                "complex dtypes"
            )
        return self._finish_host_result(
            iram_compute_ks(
                self._arnop,
                self._v0,
                jax.random.PRNGKey(0),
                int(maxit),
                float(tol),
                self._host_aux(),
                nev=self._nev,
                ncv=self._ncv,
                selection=selection,
                sorting=sorting,
                transform=type(self)._ritz_transform,
                matvec_granularity=self._matvec_granularity,
            )
        )

    def _host_aux(self):
        aux = self._transform_aux()
        return None if aux is None else np.asarray(aux)

    def _finish_host_result(self, res) -> int:
        res = jax.tree_util.tree_map(np.asarray, res)
        self._result = res
        nconv = int(res.nconv)
        self._niter = int(res.niter)
        self._nops = int(res.nops)
        if not np.all(np.isfinite(res.values)):
            self._info = CompInfo.NumericalIssue
            return 0
        self._info = (
            CompInfo.Successful if nconv >= self._nev else CompInfo.NotConverging
        )
        return min(self._nev, nconv)

    def _compute_host(self, selection, maxit, tol, sorting) -> int:
        from spectra_tpu.solvers._gen_host import iram_compute_host

        return self._finish_host_result(
            iram_compute_host(
                self._arnop,
                self._v0,
                jax.random.PRNGKey(0),
                int(maxit),
                float(tol),
                self._host_aux(),
                nev=self._nev,
                ncv=self._ncv,
                selection=selection,
                sorting=sorting,
                transform=type(self)._ritz_transform,
                matvec_granularity=self._matvec_granularity,
            )
        )

    def eigenvalues(self) -> np.ndarray:
        """Converged eigenvalues (complex), in sorted order."""
        if self._result is None:
            return np.zeros((0,), np.complex128)
        res = self._result
        return res.values[res.conv]
