"""Generalized symmetric solver tests across all five modes.

Mirrors the reference's mode x storage test grid with the correctness
bar ``||A U - B U Lambda||_inf <= 1e-9``
(reference: test/SymGEigs.cpp, test/SymGEigsShift.cpp:121-393).
"""

import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.util.geigsmode import GEigsMode


def _rand_sym(n, seed=123):
    rng = np.random.RandomState(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _spd(n, seed=42):
    """Diagonally-dominant SPD matrix (reference tests use the same
    construction idea for B)."""
    rng = np.random.RandomState(seed)
    M = rng.uniform(size=(n, n)) - 0.5
    B = (M + M.T) * 0.1
    np.fill_diagonal(B, np.abs(B).sum(axis=1) + 1.0)
    return B


def _sparse_sym(n, density=0.1, seed=123):
    rng = np.random.RandomState(seed)
    A = sps.random(n, n, density=density, random_state=rng, format="csr")
    return (A + A.T).tocsr()


def _sparse_spd(n, density=0.1, seed=42):
    B = _sparse_sym(n, density, seed) * 0.1
    d = np.abs(B).sum(axis=1).A1 + 1.0
    return (B + sps.diags(d)).tocsr()


def _check(A, B, vals, vecs, k, atol=1e-9):
    A = A.toarray() if sps.issparse(A) else A
    B = B.toarray() if sps.issparse(B) else B
    resid = np.abs(A @ vecs - B @ vecs * vals[None, :]).max()
    assert resid < atol, f"residual {resid}"
    w = scipy.linalg.eigh(A, B, eigvals_only=True)
    return w


class TestCholeskyMode:
    def test_dense(self):
        n, k, m = 100, 5, 20
        A, B = _rand_sym(n), _spd(n)
        op = st.DenseSymMatProd.create(A)
        bop = st.DenseCholesky.create(B)
        eigs = st.SymGEigsSolver(op, bop, nev=k, ncv=m)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestAlge)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        w = _check(A, B, vals, vecs, k)
        np.testing.assert_allclose(np.sort(vals), np.sort(w[-k:]), atol=1e-9)

    def test_sparse(self):
        n, k, m = 100, 5, 20
        A, B = _sparse_sym(n), _sparse_spd(n)
        op = st.SparseSymMatProd.from_full(A)
        bop = st.SparseCholesky.create(B)
        assert bop.info() == st.CompInfo.Successful
        eigs = st.SymGEigsSolver(op, bop, nev=k, ncv=m)
        eigs.init()
        eigs.compute(st.SortRule.LargestAlge)
        assert eigs.info() == st.CompInfo.Successful
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        w = _check(A, B, vals, vecs, k)
        np.testing.assert_allclose(np.sort(vals), np.sort(w[-k:]), atol=1e-9)


class TestRegularInverseMode:
    def test_sparse(self):
        n, k, m = 100, 5, 20
        A, B = _sparse_sym(n), _sparse_spd(n)
        op = st.SparseSymMatProd.from_full(A)
        bop = st.SparseRegularInverse.create(B)
        eigs = st.SymGEigsSolver(op, bop, nev=k, ncv=m, mode=GEigsMode.RegularInverse)
        eigs.init()
        eigs.compute(st.SortRule.LargestAlge)
        assert eigs.info() == st.CompInfo.Successful
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        w = _check(A, B, vals, vecs, k, atol=1e-7)
        np.testing.assert_allclose(np.sort(vals), np.sort(w[-k:]), atol=1e-7)


class TestShiftInvertMode:
    @pytest.mark.parametrize(
        "a_storage,b_storage",
        [("dense", "dense"), ("sparse", "sparse"), ("dense", "sparse"), ("sparse", "dense")],
    )
    def test_storage_grid(self, a_storage, b_storage):
        n, k, m, sigma = 80, 4, 16, 0.3
        Ad, Bd = _rand_sym(n), _spd(n)
        A = _sparse_sym(n) if a_storage == "sparse" else Ad
        if a_storage == "sparse":
            Ad = A.toarray()
        B = sps.csr_matrix(Bd) if b_storage == "sparse" else Bd
        op = st.SymShiftInvert.create(A, B)
        bop = (
            st.SparseSymMatProd.from_full(B)
            if b_storage == "sparse"
            else st.DenseSymMatProd.create(Bd)
        )
        eigs = st.SymGEigsShiftSolver(op, bop, nev=k, ncv=m, sigma=sigma)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        w = _check(Ad, Bd, vals, vecs, k)
        closest = w[np.argsort(np.abs(w - sigma))[:k]]
        np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-9)


class TestBucklingMode:
    def test_dense(self):
        n, k, m, sigma = 80, 4, 16, 1.0
        K = _spd(n, seed=5)  # spd "stiffness"
        KG = _rand_sym(n, seed=6)  # indefinite "geometric" matrix
        op = st.SymShiftInvert.create(K, KG)
        kop = st.DenseSymMatProd.create(K)
        eigs = st.SymGEigsShiftSolver(
            op, kop, nev=k, ncv=m, sigma=sigma, mode=GEigsMode.Buckling
        )
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        resid = np.abs(K @ vecs - KG @ vecs * vals[None, :]).max()
        assert resid < 1e-8
        # eigenvalues of the pencil closest to sigma in the nu metric
        w = np.real(scipy.linalg.eig(K, KG, right=False))
        nu = w / (w - sigma)
        closest = w[np.argsort(-np.abs(nu))[:k]]
        np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-8)

    def test_zero_sigma_raises(self):
        K = _spd(10)
        op = st.SymShiftInvert.create(K, _rand_sym(10))
        with pytest.raises(ValueError):
            st.SymGEigsShiftSolver(
                op, st.DenseSymMatProd.create(K), 2, 6, 0.0, GEigsMode.Buckling
            )


class TestCayleyMode:
    def test_dense(self):
        n, k, m, sigma = 80, 4, 16, 0.5
        A, B = _rand_sym(n, seed=9), _spd(n, seed=10)
        op = st.SymShiftInvert.create(A, B)
        bop = st.DenseSymMatProd.create(B)
        eigs = st.SymGEigsShiftSolver(
            op, bop, nev=k, ncv=m, sigma=sigma, mode=GEigsMode.Cayley
        )
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals, vecs = eigs.eigenvalues(), np.asarray(eigs.eigenvectors())
        w = _check(A, B, vals, vecs, k)
        nu = (w + sigma) / (w - sigma)
        closest = w[np.argsort(-np.abs(nu))[:k]]
        np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-9)


class TestIterativeShiftInvert:
    """SymShiftInvert routed through the shared on-device iterative
    machinery (build_shifted_iterative): the at-scale path for huge
    sparse (A, B) pairs on callback-free runtimes."""

    def _grid_pair(self, g):
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (
            sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))
        ).tocsr()
        n = A.shape[0]
        # SPD banded mass matrix (FEM-style 1D mass along one axis).
        m1 = sps.diags([1.0 / 6, 2.0 / 3, 1.0 / 6], [-1, 0, 1], shape=(g, g))
        B = sps.kron(sps.eye(g), m1).tocsr()
        return A, B, n

    @pytest.mark.parametrize("method", ["minres", "cheb"])
    def test_generalized_sigma0(self, method):
        g = 14
        A, B, n = self._grid_pair(g)
        op = st.SymShiftInvert.create(A, B, method=method)
        bop = st.SparseSymMatProd.from_full(B)
        eigs = st.SymGEigsShiftSolver(op, bop, nev=4, ncv=16, sigma=0.0)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-8)
        assert nconv == 4 and eigs.info() == st.CompInfo.Successful
        vals = np.asarray(eigs.eigenvalues())
        w = scipy.linalg.eigh(
            A.toarray(), B.toarray(), eigvals_only=True
        )
        np.testing.assert_allclose(np.sort(vals), np.sort(w)[:4], atol=1e-7)
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - B @ vecs * vals[None, :]).max()
        assert resid < 1e-6

    @pytest.mark.parametrize("mode_name", ["Buckling", "Cayley"])
    def test_iterative_route_other_modes(self, mode_name):
        """Buckling and Cayley modes through the on-device iterative
        shift-solve (MINRES: the shifted pencil matrix is symmetric
        indefinite in general) — the callback-free-runtime path for
        every spectral-transform mode, not just ShiftInvert."""
        g = 10
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        K = (
            sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))
        ).tocsr() + 0.5 * sps.eye(g * g)
        m1 = sps.diags([1.0 / 6, 2.0 / 3, 1.0 / 6], [-1, 0, 1], shape=(g, g))
        B = sps.kron(sps.eye(g), m1).tocsr()
        n, k, m, sigma = g * g, 3, 12, 0.25
        mode = getattr(GEigsMode, mode_name)
        op = st.SymShiftInvert.create(K, B, method="minres")
        # Buckling's second operator supplies K (the reference's KOp);
        # ShiftInvert/Cayley take B.
        second = K if mode == GEigsMode.Buckling else B
        bop = st.SparseSymMatProd.from_full(second)
        eigs = st.SymGEigsShiftSolver(op, bop, nev=k, ncv=m, sigma=sigma, mode=mode)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-9)
        assert nconv == k and eigs.info() == st.CompInfo.Successful
        vals = np.asarray(eigs.eigenvalues())
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(K @ vecs - B @ vecs * vals[None, :]).max()
        assert resid < 1e-7

    def test_matvec_granularity_parity(self):
        """Stepped execution through the B-inner-product generalized
        solver replays the compiled driver's decisions exactly."""
        g = 14
        A, B, n = self._grid_pair(g)

        def solve(stepped):
            op = st.SymShiftInvert.create(A, B, method="minres")
            bop = st.SparseSymMatProd.from_full(B)
            e = st.SymGEigsShiftSolver(op, bop, nev=4, ncv=16, sigma=0.0)
            if stepped:
                e.set_matvec_granularity(True)
            e.init()
            nc = e.compute(st.SortRule.LargestMagn, tol=1e-8)
            return nc, e

        nc_ref, ref = solve(False)
        nc_st, stp = solve(True)
        assert nc_ref == nc_st == 4
        assert stp.num_iterations() == ref.num_iterations()
        assert stp.num_operations() == ref.num_operations()
        np.testing.assert_allclose(
            np.sort(stp.eigenvalues()), np.sort(ref.eigenvalues()),
            rtol=0, atol=1e-10,
        )
