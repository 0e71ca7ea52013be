"""Krylov factorization invariant tests.

Mirrors the reference's test/Arnoldi.cpp: after init and
factorize_from, check subspace dimension, B-orthonormality of V, and
the factorization residual ``A V - V H - f e_k^T`` to 1e-12.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.linalg import krylov
from spectra_tpu.matop.arnoldi_op import ArnoldiOp
from spectra_tpu.matop.dense import DenseGenMatProd, DenseSymMatProd
from spectra_tpu.util.rng import SimpleRandom


def _check_invariant(A, state, k, tol=1e-12):
    # state.V is (m, n) row-major; transpose to columns for the checks.
    V = np.asarray(state.V)[:k].T
    H = np.asarray(state.H)[:k, :k]
    f = np.asarray(state.f)
    resid = A @ V - V @ H
    resid[:, -1] -= f
    assert np.abs(resid).max() < tol, np.abs(resid).max()
    # Orthonormality of the basis
    G = V.T @ V
    np.testing.assert_allclose(G, np.eye(k), atol=1e-12)
    # Stale columns must be exactly zero (the framework invariant)
    m = np.asarray(state.V).shape[0]
    if k < m:
        assert np.abs(np.asarray(state.V)[k:]).max() == 0.0


class TestLanczos:
    def _setup(self, n=50, m=20, seed=10):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(n, n))
        A = A + A.T
        arnop = ArnoldiOp.create(DenseSymMatProd.create(A))
        v0 = jnp.asarray(SimpleRandom(0).random_vec(n))
        return A, arnop, v0

    def test_init_is_one_step(self):
        A, arnop, v0 = self._setup()
        state = krylov.init(arnop, v0, 20, jax.random.PRNGKey(0))
        assert int(state.k) == 1
        assert int(state.nops) == 2
        _check_invariant(A, state, 1)

    def test_full_factorization_invariant(self):
        A, arnop, v0 = self._setup()
        state = krylov.init(arnop, v0, 20, jax.random.PRNGKey(0))
        state = krylov.factorize_from(arnop, state, 1, "lanczos")
        assert int(state.k) == 20
        _check_invariant(A, state, 20)
        # H is symmetric tridiagonal
        H = np.asarray(state.H)
        assert np.abs(np.triu(H, 2)).max() < 1e-12
        np.testing.assert_allclose(H, H.T, atol=1e-12)
        # beta == ||f||
        np.testing.assert_allclose(
            float(state.beta), np.linalg.norm(np.asarray(state.f)), rtol=1e-12
        )

    def test_factorize_from_midpoint(self):
        # Mirror of Arnoldi.cpp's staged factorization: k=1 -> m/2 -> m
        # via masked from_k (we always factorize to m; staging is
        # exercised through compress + re-expand in the solver tests).
        A, arnop, v0 = self._setup(n=40, m=12)
        state = krylov.init(arnop, v0, 12, jax.random.PRNGKey(0))
        state = krylov.factorize_from(arnop, state, 1, "lanczos")
        _check_invariant(A, state, 12)

    def test_low_rank_breakdown_restart(self):
        # Rank-3 matrix: the Krylov space exhausts after 3 steps and
        # the factorization must restart with random orthogonal vectors
        # instead of dividing by zero.
        n, m = 30, 8
        rng = np.random.default_rng(3)
        B = rng.normal(size=(n, 3))
        A = B @ B.T
        arnop = ArnoldiOp.create(DenseSymMatProd.create(A))
        v0 = jnp.asarray(SimpleRandom(0).random_vec(n))
        state = krylov.init(arnop, v0, m, jax.random.PRNGKey(0))
        state = krylov.factorize_from(arnop, state, 1, "lanczos")
        V = np.asarray(state.V).T
        np.testing.assert_allclose(V.T @ V, np.eye(m), atol=1e-10)


class TestArnoldi:
    def test_nonsymmetric_invariant(self):
        n, m = 50, 20
        rng = np.random.default_rng(11)
        A = rng.normal(size=(n, n))
        arnop = ArnoldiOp.create(DenseGenMatProd.create(A))
        v0 = jnp.asarray(SimpleRandom(0).random_vec(n))
        state = krylov.init(arnop, v0, m, jax.random.PRNGKey(0))
        state = krylov.factorize_from(arnop, state, 1, "arnoldi")
        _check_invariant(A, state, m)
        # H upper Hessenberg
        H = np.asarray(state.H)
        assert np.abs(np.tril(H, -2)).max() < 1e-12


def test_truncate_schur_invariant():
    """Krylov-Schur truncation: A V_k = V_k T_k + f b^T with f (and
    beta) unchanged, V_k orthonormal, zero tail preserved."""
    import scipy.linalg

    rng = np.random.default_rng(11)
    n, m, k = 60, 12, 5
    A = rng.normal(size=(n, n))
    op = DenseGenMatProd.create(A)
    arnop = ArnoldiOp.create(op, None)
    v0 = rng.normal(size=n)

    state = krylov.init(arnop, jnp.asarray(v0), m, jax.random.PRNGKey(0))
    state = krylov.factorize_from(arnop, state, 1, "arnoldi")
    H = np.asarray(state.H)
    T, U = scipy.linalg.schur(H, output="real")

    new = krylov.truncate_schur(arnop, state, jnp.asarray(U), jnp.asarray(T), k)
    V = np.asarray(new.V).T
    f = np.asarray(new.f)
    b = U[m - 1, :k]

    # residual untouched
    np.testing.assert_array_equal(f, np.asarray(state.f))
    assert float(new.beta) == float(state.beta)
    # zero-tail invariant and orthonormal leading block
    assert np.abs(V[:, k:]).max() == 0.0
    np.testing.assert_allclose(V[:, :k].T @ V[:, :k], np.eye(k), atol=1e-12)
    # the Krylov-Schur decomposition holds
    lhs = A @ V[:, :k]
    rhs = V[:, :k] @ np.asarray(new.H)[:k, :k] + np.outer(f, b)
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
