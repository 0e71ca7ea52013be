"""``(A - sigma B)^{-1} x`` for symmetric A and SPD/SPSD B.

TPU-native counterpart of the reference's SymShiftInvert
(reference: include/Spectra/MatOp/SymShiftInvert.h:128-240): A and B
may independently be dense or sparse; the factorizer choice mirrors the
reference's SymShiftInvertHelper (SymShiftInvert.h:26-93):

* both sparse -> one-time host SuperLU of the sparse ``A - sigma B``
  with per-iteration solves bridged via ``pure_callback``
  (the reference uses Eigen::SparseLU);
* any operand dense -> densify and factor with our on-device
  Bunch-Kaufman LDL^H (:mod:`spectra_tpu.linalg.bkldlt`) — solves stay
  on-device (the reference uses BKLDLT here too);
* iterative methods for huge sparse pairs (callback-free runtimes
  route here automatically): the shared on-device machinery of
  :func:`spectra_tpu.matop.shift_solve.build_shifted_iterative` —
  DIA/ELL format routing, outer-tolerance coupling, NaN-poisoning.
  ``method="minres"`` (alias ``"cg"``) for the general symmetric
  indefinite ``A - sigma B``; ``method="cheb"`` (reduction-free
  Chebyshev semi-iteration) when the shifted matrix is SPD, e.g.
  sigma below the (A, B) spectrum.

``set_shift`` returns a new factored operator (functional style).
"""

import numpy as np
import jax
import jax.numpy as jnp

from spectra_tpu.linalg import bkldlt
from spectra_tpu.matop.dense import _symmetrize
from spectra_tpu.matop.shift_solve import (
    ShiftFactorizationError,
    _HostLUSolver,
)
from spectra_tpu.sparse.formats import symmetrize_scipy
from spectra_tpu.util.pytree import pytree_dataclass


def _is_scipy_sparse(mat) -> bool:
    return hasattr(mat, "tocsr") and not isinstance(mat, np.ndarray)


@pytree_dataclass
class _BKShiftedSolve:
    factors: object

    @property
    def dtype(self):
        return self.factors.L.dtype

    def rows(self) -> int:
        return self.factors.L.shape[0]

    def cols(self) -> int:
        return self.factors.L.shape[0]

    def perform_op(self, x):
        return bkldlt.solve(self.factors, x)


@pytree_dataclass(meta_fields=("solver", "n"))
class _SpLUShiftedSolve:
    solver: object
    n: int

    @property
    def dtype(self):
        return jnp.dtype(self.solver.np_dtype)

    def rows(self) -> int:
        return self.n

    def cols(self) -> int:
        return self.n

    def perform_op(self, x):
        out = jax.ShapeDtypeStruct(x.shape, self.dtype)
        return jax.pure_callback(self.solver, out, x.astype(self.dtype))


class SymShiftInvert:
    """Builder for the shifted solve; A and B each dense or sparse.

    ``create(A, B, uplo_A="L", uplo_B="L", method=None)`` — pass
    ``B=None`` for the standard problem (B = I). ``method`` overrides
    the automatic factorizer choice with an iterative on-device solve:
    ``"minres"`` (alias ``"cg"``), ``"cheb"``, ``"bicgstab"``, or
    ``"mg"`` (geometric multigrid for grid-stencil ``A - sigma B``;
    ``grid_dims`` pins the grid shape when the sparsity alone is
    ambiguous).
    """

    def __init__(
        self, A, B=None, uplo_A="L", uplo_B="L", method=None, grid_dims=None
    ):
        self._a_sparse = _is_scipy_sparse(A)
        self._b_sparse = B is None or _is_scipy_sparse(B)
        if self._a_sparse:
            self._A = symmetrize_scipy(A, uplo_A, conjugate=False)
        else:
            self._A = np.asarray(_symmetrize(np.asarray(A), uplo_A))
        if B is None:
            self._B = None
        elif self._b_sparse:
            self._B = symmetrize_scipy(B, uplo_B, conjugate=False)
        else:
            self._B = np.asarray(_symmetrize(np.asarray(B), uplo_B))
        self._method = method
        self._grid_dims = grid_dims
        n = self._A.shape[0]
        if self._B is not None and self._B.shape[0] != n:
            raise ValueError("A and B must have the same size")
        self._n = n

    @classmethod
    def create(
        cls, A, B=None, uplo_A="L", uplo_B="L", method=None, grid_dims=None
    ):
        return cls(A, B, uplo_A, uplo_B, method, grid_dims)

    @property
    def dtype(self):
        return jnp.dtype(self._A.dtype)

    def rows(self) -> int:
        return self._n

    def cols(self) -> int:
        return self._n

    def _shifted_host(self, sigma):
        """A - sigma*B as a host matrix (scipy sparse or numpy)."""
        import scipy.sparse as sps

        if self._B is None:
            if self._a_sparse:
                return (self._A - sigma * sps.eye(self._n, dtype=self._A.dtype)).tocsr()
            return self._A - sigma * np.eye(self._n, dtype=self._A.dtype)
        if self._a_sparse and self._b_sparse:
            return (self._A - sigma * self._B).tocsr()
        Ad = self._A.toarray() if self._a_sparse else self._A
        Bd = self._B.toarray() if self._b_sparse else self._B
        return Ad - sigma * Bd

    def set_shift(self, sigma):
        from spectra_tpu.matop.shift_solve import (
            _resolve_sparse_method,
            build_shifted_iterative,
        )

        shifted = self._shifted_host(sigma)
        method = self._method
        if method is None and _is_scipy_sparse(shifted):
            method = _resolve_sparse_method("auto")
        if method in ("cg", "minres", "cheb", "bicgstab", "mg"):
            import scipy.sparse as sps

            if not _is_scipy_sparse(shifted):
                shifted = sps.csr_matrix(shifted)
            # "cg" kept as the documented alias: A - sigma B is
            # symmetric indefinite in general, so it maps to MINRES;
            # "cheb" is the reduction-free semi-iteration for the
            # definite case (e.g. sigma below the (A, B) spectrum).
            # "mg"/"minres" additionally try the geometric-multigrid
            # upgrade on grid stencils (build_shifted_iterative).
            return build_shifted_iterative(
                shifted.tocsr(),
                "minres" if method == "cg" else method,
                grid_dims=self._grid_dims,
            )
        if _is_scipy_sparse(shifted):
            import scipy.sparse.linalg as spla

            try:
                lu = spla.splu(shifted.tocsc())
            except RuntimeError as err:
                raise ShiftFactorizationError(
                    f"factorization failed: {err}"
                ) from err
            return _SpLUShiftedSolve(
                solver=_HostLUSolver(lu, self._n, shifted.dtype), n=self._n
            )
        fac = jax.jit(bkldlt.factorize)(jnp.asarray(shifted), 0.0)
        if not bool(fac.ok):
            raise ShiftFactorizationError(
                "factorization failed: A - sigma * B is singular"
            )
        return _BKShiftedSolve(factors=fac)
