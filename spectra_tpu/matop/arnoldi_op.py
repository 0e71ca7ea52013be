"""The B-inner-product geometry of the Krylov process.

``ArnoldiOp`` bundles the Krylov operator ``A`` (or a spectral
transform of it) with the metric operator ``B`` of a generalized
problem: inner products, projections and norms are taken w.r.t.
``<x, y> = x^H B y`` (reference:
include/Spectra/MatOp/internal/ArnoldiOp.h:33-162). With ``B = I`` all
of them reduce to plain dots — that case is dispatched statically (the
``bop`` field is pytree metadata ``None``), so the identity path
compiles to bare GEMVs with no dead B-matvec.

These reductions over the sharded n dimension are the *only*
cross-device synchronization points of the whole IRLM iteration
(SURVEY.md section 2.6); under ``jax.sharding`` each lowers to a local
partial reduction plus one psum over the row-partition axis.
"""

import jax.numpy as jnp

from spectra_tpu.util.pytree import pytree_dataclass


class IdentityBOp:
    """Placeholder for B = I (the standard eigenvalue problem)."""

    __slots__ = ()


@pytree_dataclass
class ArnoldiOp:
    """Krylov operator + B-metric. ``bop=None`` means B = I."""

    op: object
    bop: object

    @classmethod
    def create(cls, op, bop=None):
        if isinstance(bop, IdentityBOp):
            bop = None
        return cls(op=op, bop=bop)

    @property
    def dtype(self):
        return self.op.dtype

    def rows(self) -> int:
        return self.op.rows()

    def perform_op(self, x):
        """The 'A' operator generating the Krylov subspace."""
        return self.op.perform_op(x)

    def apply_b(self, y):
        if self.bop is None:
            return y
        return self.bop.perform_op(y)

    def inner_product(self, x, y):
        """<x, y> = x^H B y."""
        return jnp.vdot(x, self.apply_b(y))

    def adjoint_product(self, X, y):
        """X^H B y for a block X (the projection GEMV of the hot loop)."""
        return jnp.conj(X).T @ self.apply_b(y)

    def norm(self, x):
        """B-norm sqrt(real(x^H B x))."""
        return jnp.sqrt(jnp.real(self.inner_product(x, x)))
