"""Regression cases ported from the reference's bug-report tests —
the matrices and assertions, not the code (SURVEY.md section 4):
Example1 (#144 cycle Laplacian, eigenvalue multiplicities),
Example2 (#159 Lanczos near-breakdown restart),
Example3 (#115 semidefinite generalized problem),
Example4 (initial vector in the null space of A)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _cycle_laplacian(n):
    """reference: test/Example1.cpp construct_cycle_laplacian."""
    L = np.zeros((n, n))
    for i in range(n):
        L[i, i] = 1.0
        L[i, (i + n - 1) % n] = -0.5
        L[i, (i + 1) % n] = -0.5
    return L


class TestExample144:
    """Cycle Laplacian: heavy eigenvalue multiplicity; requested at
    tol=1e-15 (reference: Example1.cpp run_test)."""

    @pytest.mark.parametrize("n,k,m", [(20, 3, 6), (20, 5, 12), (20, 6, 12)])
    def test_largest_and_shifted_smallest(self, n, k, m):
        M = _cycle_laplacian(n)
        true_evals = np.linalg.eigvalsh(M)

        op = st.DenseSymMatProd.create(M)
        eigs = st.SymEigsSolver(op, nev=k, ncv=m)
        eigs.init()
        eigs.compute(
            st.SortRule.LargestMagn, 1000, 1e-15, st.SortRule.SmallestAlge
        )
        assert eigs.info() == st.CompInfo.Successful
        evals = eigs.eigenvalues()
        evecs = np.asarray(eigs.eigenvectors())
        err = np.abs(M @ evecs - evecs * evals[None, :]).max()
        assert err < 1e-9
        np.testing.assert_allclose(evals, true_evals[-k:], atol=1e-9)

        # Smallest via shift-invert at sigma = -1e-6
        op2 = st.DenseSymShiftSolve.create(M)
        eigs2 = st.SymEigsShiftSolver(op2, nev=k, ncv=m, sigma=-1e-6)
        eigs2.init()
        eigs2.compute(
            st.SortRule.LargestMagn, 1000, 1e-15, st.SortRule.SmallestAlge
        )
        assert eigs2.info() == st.CompInfo.Successful
        evals2 = eigs2.eigenvalues()
        evecs2 = np.asarray(eigs2.eigenvectors())
        err2 = np.abs(M @ evecs2 - evecs2 * evals2[None, :]).max()
        assert err2 < 1e-9
        np.testing.assert_allclose(evals2, true_evals[:k], atol=1e-9)


# The three 5x5 matrices of issue #159 (reference: Example2.cpp) — the
# Lanczos factorization hits near-breakdown and must restart cleanly.
_M159_1 = np.array([
    [15.035447086947079479, 3.932587856183598677, -4.848070276813470542, -8.027254936523050904, -2.865327349780228231],
    [3.932587856183598677, 1.028585791773944732, -1.268034278346991263, -2.099564123322002035, -0.749439073848281425],
    [-4.848070276813470542, -1.268034278346991263, 1.563224909309606855, 2.588329820664053864, 0.923903910371237535],
    [-8.027254936523050904, -2.099564123322002035, 2.588329820664053864, 4.285660509016328222, 1.529765824738644411],
    [-2.865327349780228231, -0.749439073848281425, 0.923903910371237535, 1.529765824738644411, 0.546049663433429209],
])
_M159_2 = np.array([
    [0.6118330552, -3.058379358, 1.329013596, 2.601267208, 1.072783220],
    [-3.058379358, 15.28796821, -6.643360824, -13.00299463, -5.362538075],
    [1.329013596, -6.643360824, 2.886861251, 5.650429406, 2.330281884],
    [2.601267208, -13.00299463, 5.650429406, 11.05953826, 4.561041261],
    [1.072783220, -5.362538075, 2.330281884, 4.561041261, 1.881009576],
])
_M159_3 = np.array([
    [17.7699571312182, 10.7033479738827, -19.1658731825582, -4.20053658859459, -11.1426294187651],
    [10.7033479738827, 6.44692933157151, -11.5441477084849, -2.53010203979439, -6.71152097511499],
    [-19.1658731825582, -11.5441477084849, 20.6714451890590, 4.53050904744533, 12.0179368348118],
    [-4.20053658859459, -2.53010203979439, 4.53050904744533, 0.992940360059961, 2.63394122006329],
    [-11.1426294187651, -6.71152097511499, 12.0179368348118, 2.63394122006329, 6.98697185632535],
])


class TestExample159:
    @pytest.mark.parametrize("M", [_M159_1, _M159_2, _M159_3], ids=["c1", "c2", "c3"])
    def test_near_breakdown_restart(self, M):
        true_evals = np.linalg.eigvalsh(M)
        op = st.DenseSymMatProd.create(M)
        eigs = st.SymEigsSolver(op, nev=1, ncv=3)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        evals = eigs.eigenvalues()
        evecs = np.asarray(eigs.eigenvectors())
        err = np.abs(M @ evecs - evecs * evals[None, :]).max()
        assert err < 1e-8
        assert abs(evals[0] - true_evals[-1]) < 1e-8


class TestExample115:
    """Semidefinite A in Cholesky-mode generalized problem
    (reference: Example3.cpp case 1)."""

    def test_case1(self):
        C = sps.coo_matrix(
            (
                [1.1807575e8, 304744.5, -152372.25, 304744.5, 152372.25,
                 15403.85, 152372.25, 101581.5, -152372.25, 101581.5],
                (
                    [0, 1, 1, 2, 2, 3, 4, 4, 5, 5],
                    [0, 1, 5, 2, 4, 3, 2, 4, 1, 5],
                ),
            ),
            shape=(6, 6),
        ).tocsr()
        M = sps.diags([1000.0, 1000.0, 1000.0, 0.0, 0.0, 0.0]).tocsr()
        shift = 1.0e5
        A = M
        B = (C + shift * M).tocsr()

        op = st.SparseSymMatProd.from_full(A)
        bop = st.SparseCholesky.create(B)
        assert bop.info() == st.CompInfo.Successful
        eigs = st.SymGEigsSolver(op, bop, nev=4, ncv=5)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        evals = eigs.eigenvalues()
        evecs = np.asarray(eigs.eigenvectors())
        err = np.abs(A @ evecs - B @ evecs * evals[None, :]).max()
        assert err < 1e-9


class TestExampleInitNull:
    """Initial vector in the null space of A (reference: Example4.cpp):
    v = A v0 vanishes and init must fall back to v0 itself."""

    def _run(self, A, v0):
        true_evals = np.linalg.eigvalsh(A)
        op = st.DenseSymMatProd.create(A)
        eigs = st.SymEigsSolver(op, nev=3, ncv=6)
        eigs.init(v0)
        eigs.compute(st.SortRule.LargestAlge, 1000, 1e-10, st.SortRule.SmallestAlge)
        assert eigs.info() == st.CompInfo.Successful
        evals = eigs.eigenvalues()
        evecs = np.asarray(eigs.eigenvectors())
        err = np.abs(A @ evecs - evecs * evals[None, :]).max()
        assert err < 1e-8
        np.testing.assert_allclose(evals, true_evals[-3:], atol=1e-8)

    def test_zero_matrix(self):
        n = 100
        A = np.zeros((n, n))
        v0 = np.random.RandomState(123).uniform(-1, 1, n)
        self._run(A, v0)

    def test_null_space_start(self):
        n = 100
        rng = np.random.RandomState(123)
        U = rng.uniform(-1, 1, (n, n))
        M = U + U.T
        evals, evecs = np.linalg.eigh(M)
        evals[-1] = 0.0  # plant a zero eigenvalue
        A = (evecs * evals[None, :]) @ evecs.T
        v0 = evecs[:, -1]  # exactly in the null space
        self._run(A, v0)
