"""Preconditioning for the on-device iterative shift-solve.

The reference leans on serial direct factorizations (Eigen SparseLU,
reference: SparseSymShiftSolve.h:51; CG precedent for iterative inverse
ops: SparseRegularInverse.h:105-116). At TPU scale the inner solve is a
Krylov iteration compiled into the outer program, and preconditioning
must stay matrix-free and static-shaped. Two TPU-friendly forms, both
expressed as *operator transformations* so the (indefinite-safe) MINRES
kernel itself stays untouched:

* **Jacobi (symmetric diagonal scaling)** — solve
  ``(S A S) y = S b`` with ``S = |diag(A)|^{-1/2}``, then ``x = S y``.
  Works for indefinite systems (S keeps symmetry; MINRES handles the
  signs). One elementwise multiply per matvec — free on the VPU.

* **Chebyshev polynomial** — solve ``(A p(A)) y = b`` with MINRES,
  then ``x = p(A) y``, where ``p`` is the degree-d Chebyshev
  approximation of ``1/lambda`` on ``[alpha, beta]``. ``A p(A)`` is a
  polynomial in A, hence symmetric, and its spectrum on ``[alpha,
  beta]`` is clustered at 1 — the outer MINRES then converges in a few
  iterations. Each preconditioner application is d extra SpMVs but
  **zero** extra dot products, which is exactly the right trade on a
  dispatch/latency-bound runtime where every reduction is a collective.
  Requires a (semi-)definite system: valid when the shift lies outside
  (or at the edge of) the spectrum, e.g. sigma=0 for an SPD operator
  (the BASELINE config #3 family). The interval defaults to
  ``beta = `` Gershgorin bound, ``alpha = beta * 1e-4``; eigenvalues
  below alpha are left to the outer iteration.
"""

from functools import partial

import jax
import jax.numpy as jnp


def gershgorin_upper(sp) -> jnp.ndarray:
    """Upper bound on the spectral radius from row sums of |A|
    (ELL ``vals`` is row-major; DIA ``data`` is row-aligned, so the
    per-row absolute sum is the column sum over diagonals)."""
    if hasattr(sp, "vals"):
        return jnp.max(jnp.sum(jnp.abs(sp.vals), axis=1))
    return jnp.max(jnp.sum(jnp.abs(sp.data), axis=0))


def chebyshev_inverse_apply(matvec, b, alpha, beta, degree: int):
    """z = p(A) b, the degree-``degree`` Chebyshev semi-iteration
    approximation of ``A^{-1} b`` on the interval [alpha, beta]
    (classical Chebyshev iteration from z0 = 0; Saad, Iterative
    Methods, alg. 12.1). Pure jnp — compiles into the outer program.
    The recurrence is shared with the standalone Chebyshev solver
    (:mod:`spectra_tpu.linalg.cheb_solve`)."""
    from spectra_tpu.linalg.cheb_solve import (
        cheb_coeffs,
        cheb_iterations,
        cheb_warm_start,
    )

    coeffs = cheb_coeffs(alpha, beta)
    carry = cheb_warm_start(matvec, b, None, coeffs)
    z, _, _, _ = cheb_iterations(matvec, carry, coeffs, degree - 1)
    return z


def jacobi_scaling(diag):
    """S = |diag|^{-1/2} with zero-diagonal guard."""
    d = jnp.abs(diag)
    return jnp.where(d > 0, 1.0 / jnp.sqrt(jnp.where(d > 0, d, 1.0)), 1.0)


def preconditioned_system(matvec, b, precond: str, diag=None, alpha=None,
                          beta=None, degree: int = 16):
    """Transform ``A x = b`` per the chosen preconditioner.

    Returns ``(mv2, b2, recover)``: solve ``mv2(y) = b2`` with a
    symmetric Krylov method, then ``x = recover(y)``.
    """
    if precond == "jacobi":
        s = jacobi_scaling(diag)

        def mv2(u):
            return s * matvec(s * u)

        return mv2, s * b, lambda y: s * y
    if precond == "cheb":
        p = partial(
            chebyshev_inverse_apply,
            matvec,
            alpha=alpha,
            beta=beta,
            degree=degree,
        )

        def mv2(u):
            return matvec(p(u))

        return mv2, b, p
    return matvec, b, lambda y: y
