"""Bunch-Kaufman LDL^H tests.

Mirrors the reference's BKLDLT test: factorize A - shift*I for random
symmetric / Hermitian matrices and check the solve residual
(reference: test/BKLDLT.cpp, sizes 10/100/1000, residual ~ machine eps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectra_tpu.linalg import bkldlt


def _rand_sym(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _rand_herm(n, seed):
    rng = np.random.default_rng(seed)
    A = (rng.uniform(size=(n, n)) - 0.5) + 1j * (rng.uniform(size=(n, n)) - 0.5)
    return A + A.conj().T


@pytest.mark.parametrize("n", [10, 50, 200])
@pytest.mark.parametrize("shift", [0.0, 1.3])
def test_solve_sym(n, shift):
    A = _rand_sym(n, n)
    b = np.random.default_rng(n + 1).normal(size=n)
    fac = jax.jit(bkldlt.factorize)(jnp.asarray(A), shift)
    assert bool(fac.ok)
    x = np.asarray(bkldlt.solve(fac, jnp.asarray(b)))
    resid = np.abs((A - shift * np.eye(n)) @ x - b).max()
    assert resid < 1e-10 * max(1.0, np.abs(b).max())


@pytest.mark.parametrize("n", [10, 64])
def test_solve_herm(n, shift=0.7):
    A = _rand_herm(n, n)
    b = np.random.default_rng(n + 2).normal(size=n) + 1j * 0.3
    fac = bkldlt.factorize(jnp.asarray(A), shift)
    assert bool(fac.ok)
    x = np.asarray(bkldlt.solve(fac, jnp.asarray(b)))
    resid = np.abs((A - shift * np.eye(n)) @ x - b).max()
    assert resid < 1e-10


def test_factorization_reconstructs():
    """P A P^T == L D L^H, entrywise."""
    n = 40
    A = _rand_sym(n, 3)
    fac = bkldlt.factorize(jnp.asarray(A))
    L = np.asarray(fac.L)
    d = np.asarray(fac.d)
    e = np.asarray(fac.e)
    is2 = np.asarray(fac.is2x2)
    perm = np.asarray(fac.perm)
    D = np.diag(d)
    for k in np.nonzero(is2)[0]:
        D[k + 1, k] = e[k]
        D[k, k + 1] = np.conj(e[k])
    PAP = A[np.ix_(perm, perm)]
    np.testing.assert_allclose(L @ D @ L.conj().T, PAP, atol=1e-12)


def test_forced_2x2_pivots():
    """Zero diagonal forces 2x2 pivots everywhere."""
    n = 6
    A = np.zeros((n, n))
    for i in range(0, n, 2):
        A[i, i + 1] = A[i + 1, i] = 1.0 + i
    fac = bkldlt.factorize(jnp.asarray(A))
    assert bool(fac.ok)
    b = np.arange(1.0, n + 1)
    x = np.asarray(bkldlt.solve(fac, jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-12)


def test_singular_flags_not_ok():
    A = np.zeros((4, 4))
    fac = bkldlt.factorize(jnp.asarray(A))
    assert not bool(fac.ok)


def test_block_solve():
    n = 30
    A = _rand_sym(n, 9)
    B = np.random.default_rng(10).normal(size=(n, 4))
    fac = bkldlt.factorize(jnp.asarray(A), 0.25)
    X = np.asarray(bkldlt.solve(fac, jnp.asarray(B)))
    np.testing.assert_allclose((A - 0.25 * np.eye(n)) @ X, B, atol=1e-10)
