"""Cholesky operators for the generalized-problem Cholesky mode.

TPU-native counterparts of the reference's Cholesky wrappers
(reference: include/Spectra/MatOp/DenseCholesky.h:34-125,
SparseCholesky.h:36-128): factor the SPD metric ``B = L L^H`` once and
expose the two triangular solves the ``L^{-1} A L^{-H}`` spectral
transform needs. The solves are XLA-blocked ``solve_triangular`` calls
— MXU-friendly, no sequential scans at iteration time.

``SparseCholesky`` factors on the host: scipy has no sparse Cholesky,
so we run SuperLU with a symmetric-ish ordering and keep the triangular
solves host-side behind ``pure_callback`` — for genuinely huge B prefer
the RegularInverse or ShiftInvert modes, which stay fully on-device
(the reference has the same pressure-relief valve: its SimplicialLLT is
serial too).
"""

import numpy as np
import jax
import jax.numpy as jnp

from spectra_tpu.matop.dense import _symmetrize, _hermitize
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass
class DenseCholesky:
    """B = L L^H for dense SPD B (reference: DenseCholesky.h:101-119)."""

    L: jnp.ndarray

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        mat = jnp.asarray(mat)
        full = (
            _hermitize(mat, uplo)
            if jnp.iscomplexobj(mat)
            else _symmetrize(mat, uplo)
        )
        L = jnp.linalg.cholesky(full)
        obj = cls(L=L)
        if not bool(jnp.all(jnp.isfinite(L))):
            obj = cls(L=L)
            object.__setattr__(obj, "_info", CompInfo.NumericalIssue)
            return obj
        object.__setattr__(obj, "_info", CompInfo.Successful)
        return obj

    def info(self) -> CompInfo:
        return getattr(self, "_info", CompInfo.Successful)

    @property
    def dtype(self):
        return self.L.dtype

    def rows(self) -> int:
        return self.L.shape[0]

    def cols(self) -> int:
        return self.L.shape[1]

    def lower_triangular_solve(self, x):
        """y = L^{-1} x."""
        return jax.scipy.linalg.solve_triangular(self.L, x, lower=True)

    def upper_triangular_solve(self, x):
        """y = L^{-H} x."""
        return jax.scipy.linalg.solve_triangular(
            jnp.conj(self.L).T, x, lower=False
        )


class _HostTriangularSolver:
    """Host-side solves with the permuted Cholesky factor B = P^T (L
    L^H) P: ``lower(x) = L^{-1} (P x)``, ``upper(x) = P^T (L^{-H} x)``
    — the exact semantics of the reference's SimplicialLLT usage
    (reference: SparseCholesky.h lower/upper_triangular_solve)."""

    __slots__ = ("lower", "upper", "perm", "np_dtype", "_spla")

    def __init__(self, lower_csr, perm, np_dtype):
        import scipy.sparse.linalg as spla

        self.lower = lower_csr
        self.upper = lower_csr.conj().T.tocsr()
        self.perm = perm
        self.np_dtype = np_dtype
        self._spla = spla

    def solve_lower(self, b):
        b = np.asarray(b)
        pb = np.empty_like(b)
        pb[self.perm] = b  # (P x)[perm_r[i]] = x[i], scipy's Pr convention
        return self._spla.spsolve_triangular(self.lower, pb, lower=True).astype(
            self.np_dtype
        )

    def solve_upper(self, b):
        y = self._spla.spsolve_triangular(self.upper, np.asarray(b), lower=False)
        return y[self.perm].astype(self.np_dtype)


@pytree_dataclass(meta_fields=("solver", "n", "ok"))
class SparseCholesky:
    """Host-factored sparse Cholesky of SPD B.

    The factor is computed with a zero-fill-reducing LDL^T built from
    SuperLU in symmetric mode; like the reference's SimplicialLLT, the
    factor incorporates a permutation — both triangular solves are with
    respect to the permuted factor, which is transparent to the
    Cholesky-mode solver (reference: SparseCholesky.h note).
    """

    solver: object
    n: int
    ok: bool

    @classmethod
    def create(cls, csr, uplo: str = "L"):
        import scipy.sparse as sps
        import scipy.sparse.linalg as spla

        from spectra_tpu.sparse.formats import symmetrize_scipy

        full = symmetrize_scipy(
            csr, uplo, conjugate=np.iscomplexobj(csr.data)
        ).tocsc()
        n = full.shape[0]
        try:
            lu = spla.splu(
                full,
                permc_spec="MMD_AT_PLUS_A",
                diag_pivot_thresh=0.0,
                options=dict(SymmetricMode=True),
            )
        except RuntimeError:
            return cls(solver=None, n=n, ok=False)
        # SymmetricMode + zero pivot threshold keeps perm_r == perm_c,
        # so B = P^T (L D L^H) P; fold sqrt(D) into the factor.
        d = lu.U.diagonal()
        if np.any(np.real(d) <= 0):
            return cls(solver=None, n=n, ok=False)
        sqrt_d = sps.diags(np.sqrt(d))
        Lt = (lu.L @ sqrt_d).tocsr().sorted_indices()
        solver = _HostTriangularSolver(Lt, lu.perm_r, full.dtype)
        return cls(solver=solver, n=n, ok=True)

    def info(self) -> CompInfo:
        return CompInfo.Successful if self.ok else CompInfo.NumericalIssue

    @property
    def dtype(self):
        return jnp.dtype(self.solver.np_dtype)

    def rows(self) -> int:
        return self.n

    def cols(self) -> int:
        return self.n

    def _callback(self, fn, x):
        out = jax.ShapeDtypeStruct(x.shape, self.dtype)
        return jax.pure_callback(fn, out, x.astype(self.dtype))

    def lower_triangular_solve(self, x):
        return self._callback(self.solver.solve_lower, x)

    def upper_triangular_solve(self, x):
        return self._callback(self.solver.solve_upper, x)
