"""Ordered-Schur (block swap) tests — the dtrexc/dtrsen capability."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectra_tpu.linalg.schur import hessenberg_schur, schur_eigenvalues
from spectra_tpu.linalg.schur_reorder import schur_reorder, _block_starts


def _random_schur(m, seed):
    rng = np.random.default_rng(seed)
    H = np.triu(rng.normal(size=(m, m)), -1)
    res = hessenberg_schur(jnp.asarray(H))
    assert bool(res.converged)
    return H, np.asarray(res.T), np.asarray(res.U)


def _eigs_of_leading(T, k):
    return np.asarray(schur_eigenvalues(jnp.asarray(T[:k, :k])))


@pytest.mark.parametrize("m,seed", [(10, 0), (20, 1), (30, 2)])
def test_reorder_largest_magnitude(m, seed):
    H, T, U = _random_schur(m, seed)
    lam = np.asarray(schur_eigenvalues(jnp.asarray(T)))
    k_want = 4
    order = np.argsort(-np.abs(lam), kind="stable")
    select = np.zeros(m, bool)
    select[order[:k_want]] = True

    T2, U2, k = schur_reorder(T, U, select)
    # similarity + orthogonality preserved
    np.testing.assert_allclose(U2.T @ U2, np.eye(m), atol=1e-11)
    np.testing.assert_allclose(U2 @ T2 @ U2.T, H, atol=1e-9)
    assert np.abs(np.tril(T2, -2)).max() < 1e-12
    # selected eigenvalues live in the leading k block
    assert k >= k_want
    lead = _eigs_of_leading(T2, k)
    wanted = lam[select]
    for w in wanted:
        assert np.min(np.abs(lead - w)) < 1e-7


def test_reorder_selects_smallest(m=16, seed=5):
    H, T, U = _random_schur(m, seed)
    lam = np.asarray(schur_eigenvalues(jnp.asarray(T)))
    order = np.argsort(np.abs(lam), kind="stable")
    select = np.zeros(m, bool)
    select[order[:3]] = True
    T2, U2, k = schur_reorder(T, U, select)
    np.testing.assert_allclose(U2 @ T2 @ U2.T, H, atol=1e-9)
    lead = _eigs_of_leading(T2, k)
    for w in lam[select]:
        assert np.min(np.abs(lead - w)) < 1e-7


def test_block_partition():
    T = np.diag([1.0, 2.0, 3.0, 4.0])
    T[2, 1] = 0.5  # 2x2 block at (1,2)
    T[1, 2] = -0.5
    blocks = _block_starts(T)
    assert blocks == [(0, 1), (1, 2), (3, 1)]


def test_invariant_subspace_property():
    """The leading k columns of U2 span an invariant subspace of H."""
    m = 24
    H, T, U = _random_schur(m, 7)
    lam = np.asarray(schur_eigenvalues(jnp.asarray(T)))
    select = np.zeros(m, bool)
    select[np.argsort(-lam.real, kind="stable")[:5]] = True
    T2, U2, k = schur_reorder(T, U, select)
    Vk = U2[:, :k]
    resid = H @ Vk - Vk @ T2[:k, :k]
    assert np.abs(resid).max() < 1e-9
