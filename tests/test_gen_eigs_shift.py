"""Shift-and-invert tests for general matrices
(reference: test/GenEigsRealShift.cpp, test/GenEigsComplexShift.cpp)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _rand_mat(n, seed=123):
    rng = np.random.RandomState(seed)
    return rng.uniform(size=(n, n)) - 0.5


class TestGenEigsRealShift:
    @pytest.mark.parametrize("n,k,m,sigma", [(50, 4, 16, 0.5), (100, 6, 24, 1.0)])
    def test_dense(self, n, k, m, sigma):
        A = _rand_mat(n)
        op = st.DenseGenRealShiftSolve.create(A)
        eigs = st.GenEigsRealShiftSolver(op, nev=k, ncv=m, sigma=sigma)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9
        w = np.linalg.eigvals(A)
        for v in vals:
            assert np.min(np.abs(w - v)) < 1e-8

    def test_sparse(self):
        n, k, m, sigma = 100, 4, 20, 0.0
        rng = np.random.RandomState(9)
        A = sps.random(n, n, density=0.1, random_state=rng, format="csr")
        A = A + sps.eye(n) * 0.1
        op = st.SparseGenRealShiftSolve.create(A)
        eigs = st.GenEigsRealShiftSolver(op, nev=k, ncv=m, sigma=sigma)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A.toarray() @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9


class TestGenEigsComplexShift:
    @pytest.mark.parametrize("n,k,m", [(60, 4, 18)])
    @pytest.mark.parametrize("sigma", [(0.5, 0.5), (0.0, 1.0)])
    def test_dense(self, n, k, m, sigma):
        sigmar, sigmai = sigma
        A = _rand_mat(n, seed=31)
        op = st.DenseGenComplexShiftSolve.create(A)
        eigs = st.GenEigsComplexShiftSolver(
            op, nev=k, ncv=m, sigmar=sigmar, sigmai=sigmai
        )
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-8
        # eigenvalues are true eigenvalues of A (the root test worked)
        w = np.linalg.eigvals(A)
        for v in vals:
            assert np.min(np.abs(w - v)) < 1e-7

    def test_sparse(self):
        n, k, m = 80, 3, 16
        rng = np.random.RandomState(13)
        A = sps.random(n, n, density=0.15, random_state=rng, format="csr")
        op = st.SparseGenComplexShiftSolve.create(A)
        eigs = st.GenEigsComplexShiftSolver(op, nev=k, ncv=m, sigmar=0.2, sigmai=0.3)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A.toarray() @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-7
