"""Jacobi-Davidson / Davidson solver tests
(reference: test/DavidsonSymEigs.cpp uses diagonally dominant matrices)."""

import numpy as np
import pytest

import spectra_tpu as st
from spectra_tpu.linalg.orthogonalization import (
    qr_orthogonalisation,
    modified_gram_schmidt_orthogonalisation,
    twice_is_enough,
)


def _diag_dominant(n, seed=42):
    rng = np.random.RandomState(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    A = (A + A.T) * 0.5
    np.fill_diagonal(A, np.arange(1.0, n + 1) + np.abs(A).sum(axis=1))
    return A


class TestOrthogonalization:
    def test_qr(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(40, 8))
        Q = np.asarray(qr_orthogonalisation(A))
        np.testing.assert_allclose(Q.T @ Q, np.eye(8), atol=1e-12)
        # same span
        proj = Q @ (Q.T @ A)
        np.testing.assert_allclose(proj, A, atol=1e-12)

    def test_mgs(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(30, 6))
        Q = np.asarray(modified_gram_schmidt_orthogonalisation(A))
        np.testing.assert_allclose(Q.T @ Q, np.eye(6), atol=1e-12)

    def test_twice_is_enough_locked(self):
        rng = np.random.default_rng(2)
        Q0 = np.linalg.qr(rng.normal(size=(50, 5)))[0]
        new = rng.normal(size=(50, 3))
        A = np.concatenate([Q0, new], axis=1)
        out = np.asarray(twice_is_enough(A, 5))
        np.testing.assert_allclose(out[:, :5], Q0, atol=1e-14)  # untouched
        np.testing.assert_allclose(out.T @ out, np.eye(8), atol=1e-12)


class TestDavidson:
    @pytest.mark.parametrize("n,k", [(100, 3), (400, 5)])
    def test_largest(self, n, k):
        A = _diag_dominant(n)
        op = st.DenseSymMatProd.create(A)
        solver = st.DavidsonSymEigsSolver(op, nev=k)
        nconv = solver.compute(st.SortRule.LargestAlge, maxit=200, tol=1e-9)
        assert solver.info() == st.CompInfo.Successful
        assert nconv == k
        vals = solver.eigenvalues()
        vecs = solver.eigenvectors()
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-7
        w = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(vals), w[-k:], atol=1e-7)

    def test_smallest(self):
        n, k = 120, 4
        A = _diag_dominant(n, seed=7)
        op = st.DenseSymMatProd.create(A)
        solver = st.DavidsonSymEigsSolver(op, nev=k)
        solver.compute(st.SortRule.SmallestAlge, maxit=200, tol=1e-9)
        assert solver.info() == st.CompInfo.Successful
        vals = solver.eigenvalues()
        w = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(vals), w[:k], atol=1e-7)

    def test_sparse_op(self):
        import scipy.sparse as sps

        n, k = 200, 3
        A = _diag_dominant(n, seed=9)
        A[np.abs(A) < 0.4] = 0.0
        # keep every row coupled so no DPR denominator is exactly zero
        idx = np.arange(n - 1)
        A[idx, idx + 1] += 0.05
        A[idx + 1, idx] += 0.05
        np.fill_diagonal(A, np.arange(1.0, n + 1) + np.abs(A).sum(axis=1))
        As = sps.csr_matrix(A)
        op = st.SparseSymMatProd.from_full(As)
        solver = st.DavidsonSymEigsSolver(op, nev=k)
        solver.compute(st.SortRule.LargestAlge, maxit=300, tol=1e-9)
        assert solver.info() == st.CompInfo.Successful
        vals = solver.eigenvalues()
        w = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(vals), w[-k:], atol=1e-7)

    def test_knobs(self):
        A = _diag_dominant(50)
        op = st.DenseSymMatProd.create(A)
        solver = st.DavidsonSymEigsSolver(op, nev=2, nvec_init=4, nvec_max=20)
        solver.set_correction_size(3)
        solver.set_max_search_space_size(16)
        solver.set_initial_search_space_size(4)
        solver.compute(st.SortRule.LargestAlge, maxit=100, tol=1e-9)
        assert solver.info() == st.CompInfo.Successful


def test_compute_with_guess():
    """compute_with_guess accepts a caller-provided initial space
    (reference: JDSymEigsBase.h compute_with_guess)."""
    A = _diag_dominant(80)
    op = st.DenseSymMatProd.create(A)
    solver = st.DavidsonSymEigsSolver(op, nev=3)
    rng = np.random.default_rng(5)
    guess = np.linalg.qr(rng.normal(size=(80, 6)))[0]
    nconv = solver.compute_with_guess(guess, st.SortRule.LargestAlge, 200, 1e-9)
    assert solver.info() == st.CompInfo.Successful
    assert nconv == 3
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.sort(solver.eigenvalues()), w[-3:], atol=1e-7)
