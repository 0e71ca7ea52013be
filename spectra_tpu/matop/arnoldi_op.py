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

from spectra_tpu.ops.gemv import basis_apply, basis_proj, vec_dot

from spectra_tpu.util.pytree import pytree_dataclass


class IdentityBOp:
    """Placeholder for B = I (the standard eigenvalue problem)."""

    __slots__ = ()


@pytree_dataclass
class ArnoldiOp:
    """Krylov operator + B-metric. ``bop=None`` means B = I."""

    op: object
    bop: object

    # Static trait: True when ``ortho_basis`` is wider than V and the
    # factorization must orthogonalize against the extra columns.
    has_structure = False

    @classmethod
    def create(cls, op, bop=None):
        if isinstance(bop, IdentityBOp):
            bop = None
        if bop is None and hasattr(op, "j_map") and cls is ArnoldiOp:
            return JStructuredArnoldiOp(op=op, bop=None)
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
        return vec_dot(x, self.apply_b(y))

    def adjoint_product(self, X, y):
        """<x_i, y>_B for a row-major basis block X (m, n) — the
        projection GEMV of the hot loop."""
        return basis_proj(X, self.apply_b(y))

    def norm(self, x):
        """B-norm sqrt(real(x^H B x))."""
        return jnp.sqrt(jnp.real(self.inner_product(x, x)))

    def deflate(self, y):
        """Hook: project ``y`` out of a locked/deflated subspace (see
        LockedArnoldiOp). Identity for undeflated operators; applied to
        breakdown-expansion candidates, which enter the basis without
        an operator application."""
        return y

    def ortho_basis(self, V):
        """The basis block the residual must be orthogonalized against.

        Default: V itself ((m, n) row-major). Structured subclasses may
        widen it (extra rows whose projection coefficients are *not*
        recorded in H — they are pure rounding noise in exact
        arithmetic).
        """
        return V


@pytree_dataclass
class JStructuredArnoldiOp(ArnoldiOp):
    """ArnoldiOp for operators with a commuting complex structure J.

    Used by the real 2n-embedding of complex Hermitian problems
    (:class:`spectra_tpu.matop.herm_embed.RealEmbeddedHermMatProd`):
    ``J(x, y) = (-y, x)`` realifies multiplication by ``i``; it is
    orthogonal, antisymmetric and commutes with the embedded operator
    E. Every eigenvalue of E is (at least) doubled, with eigenplanes
    spanned by J-orbits {z, Jz} — both members recover the *same*
    complex eigenvector (Jz realifies ``i z``).

    Real Lanczos on E started from v never sees span{Jv, ...} in exact
    arithmetic (the realified complex Lanczos), but floating-point
    rounding leaks J-orbit components into the basis, which grow into
    *phantom* duplicate Ritz pairs — and make genuine multiplicities
    undecidable. Fix: keep the Krylov space complex-linearly
    independent by orthogonalizing every residual against **J V** as
    well as V. Then each Ritz pair is a distinct complex eigenpair and
    genuinely repeated eigenvalues of A emerge through rounding exactly
    as in complex ARPACK (reference handles this natively in complex
    arithmetic, include/Spectra/HermEigsSolver.h:122-148).

    The extra J-projections are noise removal only: the recorded
    tridiagonal H is the realified complex-Lanczos tridiagonal, so the
    whole replicated restart pipeline is unchanged.
    """

    has_structure = True

    def ortho_basis(self, V):
        return jnp.concatenate([V, self.op.j_map(V)], axis=0)


@pytree_dataclass
class LockedArnoldiOp:
    """ArnoldiOp deflated against a locked (converged) invariant block.

    Wraps any ArnoldiOp with the B-orthogonal projector
    ``P y = y - locked^T (locked B y)`` applied around every operator
    application: ``perform_op = P . inner_op . P`` (deflated Lanczos;
    ``locked`` is a (q, n) row-major block of B-orthonormal converged
    Ritz vectors). The Krylov process then explores only the
    B-orthogonal complement: restarting it from a FRESH random vector
    surfaces the *remaining* copies of degenerate eigenvalues that a
    single Krylov sequence cannot resolve (in exact arithmetic a
    Krylov space contains at most one direction per eigenplane). On
    span(locked) the deflated operator is 0, which no extremal
    selection picks.

    Operator-level deflation (P A P) rather than widening the
    re-orthogonalization basis with ``locked``: the widened (ncv+q, n)
    projection block concatenated INSIDE the step programs costs a
    third basis-sized buffer — measured 16.0 GB of 15.75 at the
    100M-nnz north-star (q=20) where operator-level deflation fits.
    P is re-applied every matvec, so basis drift into span(locked) is
    re-annihilated each step instead of corrected by DGKS; breakdown
    expansion candidates (which enter the basis without an operator
    application) are deflated explicitly via :meth:`deflate`.

    The driver seam is :meth:`HermEigsBase.compute_locked`. The
    reference has no counterpart (its regression test
    test/Example1.cpp (#144) merely documents the multiplicity
    limitation); this is the certify-k-smallest-under-multiplicity
    machinery the 100M-nnz north-star acceptance needs.
    """

    inner: object  # the wrapped ArnoldiOp (possibly J-structured)
    #: TUPLE of (q_i, n) row-major B-orthonormal locked blocks — one
    #: per completed locking round, never concatenated: at the
    #: 100M-nnz scale a device concatenate of two 2.3 GB blocks peaks
    #: at inputs + f64-conversion temps + output (~14 GB) and OOM'd
    #: the certification; per-block projections stay bounded.
    locked: tuple

    @property
    def has_structure(self):
        return self.inner.has_structure

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def op(self):
        return self.inner.op

    @property
    def bop(self):
        return self.inner.bop

    def rows(self) -> int:
        return self.inner.rows()

    def deflate(self, y):
        """``P y``: remove the B-components along every locked block
        (and their J-orbits for structured inner ops)."""
        for blk in self.locked:
            wide = self.inner.ortho_basis(blk)
            y = y - basis_apply(
                wide, self.inner.adjoint_product(wide, y)
            )
        return y

    def perform_op(self, x):
        return self.deflate(self.inner.perform_op(self.deflate(x)))

    def apply_b(self, y):
        return self.inner.apply_b(y)

    def inner_product(self, x, y):
        return self.inner.inner_product(x, y)

    def adjoint_product(self, X, y):
        return self.inner.adjoint_product(X, y)

    def norm(self, x):
        return self.inner.norm(x)

    def ortho_basis(self, V):
        return self.inner.ortho_basis(V)
