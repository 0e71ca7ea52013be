"""DIA (diagonal) sparse format tests."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.sparse import DiaMatrix, dia_from_scipy, dia_suitability


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


class TestDiaFormat:
    def test_suitability(self):
        A = _laplacian_2d(20)
        assert dia_suitability(A)
        rng = np.random.RandomState(0)
        R = sps.random(200, 200, density=0.1, random_state=rng, format="csr")
        assert not dia_suitability(R)

    def test_matvec_matmat(self):
        A = _laplacian_2d(15)
        dia = dia_from_scipy(A)
        n = A.shape[0]
        x = np.random.default_rng(0).normal(size=n)
        np.testing.assert_allclose(np.asarray(dia.matvec(x)), A @ x, atol=1e-13)
        X = np.random.default_rng(1).normal(size=(n, 4))
        np.testing.assert_allclose(np.asarray(dia.matmat(X)), A @ X, atol=1e-13)

    def test_rmatvec_nonsymmetric(self):
        n = 50
        A = sps.diags(
            [np.arange(1.0, n), 2.0 + np.arange(n * 1.0), -np.ones(n - 3)],
            [-1, 0, 3],
            shape=(n, n),
        ).tocsr()
        dia = dia_from_scipy(A)
        x = np.random.default_rng(2).normal(size=n)
        np.testing.assert_allclose(np.asarray(dia.rmatvec(x)), A.T @ x, atol=1e-13)

    def test_element_diagonal_to_dense(self):
        A = _laplacian_2d(8)
        dia = dia_from_scipy(A)
        D = A.toarray()
        np.testing.assert_allclose(np.asarray(dia.to_dense()), D)
        np.testing.assert_allclose(np.asarray(dia.diagonal()), np.diag(D))
        assert float(dia.element(0, 1)) == D[0, 1]
        assert float(dia.element(5, 5)) == D[5, 5]

    def test_auto_selection(self):
        A = _laplacian_2d(12)
        op = st.SparseSymMatProd.from_full(A)
        assert isinstance(op.ell, DiaMatrix)
        op2 = st.SparseSymMatProd.from_full(A, format="ell")
        assert not isinstance(op2.ell, DiaMatrix)
        x = np.random.default_rng(3).normal(size=A.shape[0])
        np.testing.assert_allclose(
            np.asarray(op.perform_op(x)), np.asarray(op2.perform_op(x)), atol=1e-13
        )

    def test_solver_on_dia(self):
        A = _laplacian_2d(12)
        op = st.SparseSymMatProd.from_full(A)
        eigs = st.SymEigsSolver(op, nev=5, ncv=24)
        eigs.init()
        eigs.compute(st.SortRule.SmallestAlge)
        assert eigs.info() == st.CompInfo.Successful
        vals = np.sort(eigs.eigenvalues())
        true = np.sort(np.linalg.eigvalsh(A.toarray()))[:5]
        np.testing.assert_allclose(vals, true, atol=1e-9)
