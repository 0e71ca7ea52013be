"""Native real Schur tests (reference: test/Schur.cpp: sizes 10/100,
checks A = U T U', orthogonality, quasi-triangular structure)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectra_tpu.linalg.schur import hessenberg_schur, schur_eigenvalues


def _rand_hess(m, seed=0):
    rng = np.random.default_rng(seed)
    return np.triu(rng.normal(size=(m, m)), -1)


@pytest.mark.parametrize("m", [10, 30, 100])
def test_schur_decomposition(m):
    H = _rand_hess(m, seed=m)
    res = hessenberg_schur(jnp.asarray(H))
    assert bool(res.converged), f"not converged in {int(res.n_iter)} iters"
    T = np.asarray(res.T)
    U = np.asarray(res.U)
    np.testing.assert_allclose(U.T @ U, np.eye(m), atol=1e-11)
    np.testing.assert_allclose(U @ T @ U.T, H, atol=1e-10)
    # quasi-triangular: no two consecutive nonzero subdiagonals
    sub = np.diag(T, -1)
    assert not np.any((sub[:-1] != 0) & (sub[1:] != 0))
    assert np.abs(np.tril(T, -2)).max() == 0


@pytest.mark.parametrize("m", [10, 40])
def test_schur_eigenvalues(m):
    H = _rand_hess(m, seed=m + 7)
    res = hessenberg_schur(jnp.asarray(H))
    assert bool(res.converged)
    lam = np.asarray(schur_eigenvalues(res.T))
    true = np.linalg.eigvals(H)
    np.testing.assert_allclose(
        np.sort_complex(np.round(lam, 8)),
        np.sort_complex(np.round(true, 8)),
        atol=1e-7,
    )


def test_schur_already_triangular():
    T = np.triu(np.random.default_rng(1).normal(size=(8, 8)))
    res = hessenberg_schur(jnp.asarray(T))
    assert bool(res.converged)
    assert int(res.n_iter) == 0
    np.testing.assert_allclose(np.asarray(res.T), T)


def test_schur_with_multiple_blocks():
    """Block-diagonal Hessenberg (pre-deflated) converges per block."""
    m = 20
    H = _rand_hess(m, seed=3)
    H[10, 9] = 0.0
    res = hessenberg_schur(jnp.asarray(H))
    assert bool(res.converged)
    lam = np.asarray(schur_eigenvalues(res.T))
    true = np.linalg.eigvals(H)
    np.testing.assert_allclose(
        np.sort_complex(np.round(lam, 8)),
        np.sort_complex(np.round(true, 8)),
        atol=1e-7,
    )
