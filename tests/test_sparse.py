"""Sparse format + sparse MatProd tests.

Mirrors the reference's MatOp wrapper tests (product equals the dense
product) and the sparse solver integration tests with seeded random
sparse matrices (reference: test/SparseGenMatProd.cpp,
test/SymEigs.cpp:102-167).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.sparse import EllMatrix, ell_from_scipy, ell_from_dense


def _random_sparse(n, m, density, seed, complex_=False):
    rng = np.random.default_rng(seed)
    mat = sps.random(
        n, m, density=density, random_state=np.random.RandomState(seed), format="csr"
    )
    if complex_:
        mat = mat + 1j * sps.random(
            n, m, density=density, random_state=np.random.RandomState(seed + 1)
        )
    return mat.tocsr()


class TestEllFormat:
    def test_matvec_matches_dense(self):
        A = _random_sparse(60, 60, 0.1, 0)
        ell = ell_from_scipy(A)
        x = np.random.default_rng(1).normal(size=60)
        np.testing.assert_allclose(
            np.asarray(ell.matvec(x)), A @ x, rtol=0, atol=1e-13
        )

    def test_matmat_matches_dense(self):
        A = _random_sparse(40, 40, 0.15, 2)
        ell = ell_from_scipy(A)
        X = np.random.default_rng(3).normal(size=(40, 5))
        np.testing.assert_allclose(
            np.asarray(ell.matmat(X)), A @ X, rtol=0, atol=1e-13
        )

    def test_rmatvec_rectangular(self):
        A = _random_sparse(30, 50, 0.2, 4)
        ell = ell_from_scipy(A)
        x = np.random.default_rng(5).normal(size=30)
        np.testing.assert_allclose(
            np.asarray(ell.rmatvec(x)), A.T @ x, rtol=0, atol=1e-13
        )

    def test_rmatvec_complex_adjoint(self):
        A = _random_sparse(20, 25, 0.3, 6, complex_=True)
        ell = ell_from_scipy(A)
        x = np.random.default_rng(7).normal(size=20) + 1j
        np.testing.assert_allclose(
            np.asarray(ell.rmatvec(x)), A.conj().T @ x, rtol=0, atol=1e-13
        )

    def test_element_and_diagonal(self):
        A = _random_sparse(25, 25, 0.2, 8)
        ell = ell_from_scipy(A)
        D = A.toarray()
        np.testing.assert_allclose(np.asarray(ell.diagonal()), np.diag(D))
        for i, j in [(0, 0), (3, 7), (24, 24), (10, 2)]:
            assert float(ell.element(i, j)) == pytest.approx(D[i, j])

    def test_from_dense_roundtrip(self):
        rng = np.random.default_rng(9)
        D = rng.normal(size=(15, 12)) * (rng.uniform(size=(15, 12)) < 0.3)
        ell = ell_from_dense(D)
        np.testing.assert_allclose(np.asarray(ell.to_dense()), D)

    def test_empty_rows(self):
        A = sps.csr_matrix((np.array([1.0]), (np.array([2]), np.array([3]))), (5, 5))
        ell = ell_from_scipy(A)
        x = np.arange(5.0)
        np.testing.assert_allclose(np.asarray(ell.matvec(x)), A @ x)


class TestSparseMatProd:
    def test_gen_prod(self):
        A = _random_sparse(50, 50, 0.1, 10)
        op = st.SparseGenMatProd.create(A)
        x = np.random.default_rng(11).normal(size=50)
        np.testing.assert_allclose(np.asarray(op.perform_op(x)), A @ x, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(op.perform_trans_op(x)), A.T @ x, atol=1e-13
        )

    def test_sym_prod_triangle(self):
        A = _random_sparse(40, 40, 0.15, 12)
        A = A + A.T  # symmetric
        for uplo in ("L", "U"):
            op = st.SparseSymMatProd.create(A, uplo=uplo)
            x = np.random.default_rng(13).normal(size=40)
            np.testing.assert_allclose(
                np.asarray(op.perform_op(x)), A @ x, atol=1e-12
            )

    def test_herm_prod(self):
        A = _random_sparse(30, 30, 0.2, 14, complex_=True)
        A = A + A.conj().T
        op = st.SparseHermMatProd.create(A, uplo="L")
        x = np.random.default_rng(15).normal(size=30) + 0.5j
        np.testing.assert_allclose(np.asarray(op.perform_op(x)), A @ x, atol=1e-12)


class TestSparseSymEigs:
    """Sparse solver integration: residual bar 1e-9 as in the reference."""

    @pytest.mark.parametrize("n,k,m", [(100, 10, 20), (500, 10, 30)])
    def test_largest_magn(self, n, k, m):
        rng = np.random.RandomState(123)
        A = sps.random(n, n, density=0.1, random_state=rng, format="csr")
        A = A + A.T
        op = st.SparseSymMatProd.from_full(A)
        eigs = st.SymEigsSolver(op, nev=k, ncv=m)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = eigs.eigenvectors()
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9

    def test_laplacian_2d_smallest(self):
        """2D grid Laplacian (the flagship benchmark family), smallest
        eigenvalues via SmallestAlge."""
        g = 12
        n = g * g
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
        op = st.SparseSymMatProd.from_full(A)
        eigs = st.SymEigsSolver(op, nev=5, ncv=24)
        eigs.init()
        eigs.compute(st.SortRule.SmallestAlge)
        assert eigs.info() == st.CompInfo.Successful
        vals = np.sort(eigs.eigenvalues())
        true = np.sort(np.linalg.eigvalsh(A.toarray()))[:5]
        np.testing.assert_allclose(vals, true, atol=1e-9)
