"""Basis orthogonalization routines for the Jacobi-Davidson stack.

TPU-native counterparts of the reference's free functions
(reference: include/Spectra/LinAlg/Orthogonalization.h:46-137): QR,
Gram-Schmidt (classic and modified), subspace orthogonalization of new
columns against an existing orthonormal block, the combined
``JensWehner`` method (subspace projection + QR of the new block), and
the ``twice_is_enough`` wrapper that applies it twice for numerical
orthogonality.

QR here is ``jnp.linalg.qr`` (XLA's blocked Householder — the MXU
path); the sequential per-column Gram-Schmidt variants are provided for
API parity and use ``lax.fori_loop``.
"""

import jax
import jax.numpy as jnp


def qr_orthogonalisation(A):
    """Orthonormalize all columns of A via reduced QR."""
    Q, R = jnp.linalg.qr(A)
    # Fix signs so the decomposition is deterministic across backends.
    signs = jnp.sign(jnp.where(jnp.diagonal(R) == 0, 1.0, jnp.diagonal(R)))
    return Q * jnp.conj(signs)[None, :]


def gram_schmidt_orthogonalisation(A):
    """Classic Gram-Schmidt over columns (reference parity helper)."""
    A = jnp.asarray(A)
    n, k = A.shape

    def body(j, Q):
        v = A[:, j]
        proj = Q[:, :].T.conj() @ v
        mask = jnp.arange(k) < j
        v = v - Q @ jnp.where(mask, proj, 0.0)
        v = v / jnp.linalg.norm(v)
        return Q.at[:, j].set(v)

    return jax.lax.fori_loop(0, k, body, jnp.zeros_like(A))


def modified_gram_schmidt_orthogonalisation(A):
    """Modified Gram-Schmidt over columns."""
    A = jnp.asarray(A)
    n, k = A.shape

    def body(j, Q):
        v = A[:, j]

        def inner(i, v):
            coef = jnp.where(i < j, jnp.vdot(Q[:, i], v), 0.0)
            return v - coef * Q[:, i]

        v = jax.lax.fori_loop(0, k, inner, v)
        v = v / jnp.linalg.norm(v)
        return Q.at[:, j].set(v)

    return jax.lax.fori_loop(0, k, body, jnp.zeros_like(A))


def subspace_orthogonalisation(A, n_locked: int):
    """Project the trailing columns of A against its first ``n_locked``
    (orthonormal) columns: ``A_new = (I - Q Q^H) A_new``
    (reference: Orthogonalization.h subspace variant)."""
    Q = A[:, :n_locked]
    rest = A[:, n_locked:]
    rest = rest - Q @ (jnp.conj(Q).T @ rest)
    return jnp.concatenate([Q, rest], axis=1)


def jens_wehner_orthogonalisation(A, n_locked: int):
    """Subspace projection of the new columns followed by their QR
    (reference: Orthogonalization.h:133-137 'JensWehner' method)."""
    A = subspace_orthogonalisation(A, n_locked)
    Qnew = qr_orthogonalisation(A[:, n_locked:])
    return jnp.concatenate([A[:, :n_locked], Qnew], axis=1)


def twice_is_enough(A, n_locked: int):
    """Apply the JensWehner orthogonalization twice — Kahan's
    'twice is enough' rule (reference: Orthogonalization.h, used by
    SearchSpace.h:84)."""
    return jens_wehner_orthogonalisation(
        jens_wehner_orthogonalisation(A, n_locked), n_locked
    )
