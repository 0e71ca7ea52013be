"""Mixed-precision solve mode (solvers/mixed.py):
``set_precision("mixed")`` runs the restarted Lanczos in f32 and
refines once with an f64 Rayleigh-Ritz — TPU-native capability the
all-double reference does not have."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def test_mixed_dense_refines_to_f64_grade():
    rng = np.random.default_rng(0)
    n, k = 300, 4
    A = rng.normal(size=(n, n))
    A = A + A.T
    s = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=k, ncv=20)
    s.set_precision("mixed")
    s.init()
    nconv = s.compute(st.SortRule.LargestMagn, tol=1e-6)
    assert nconv == k
    vals = np.asarray(s.eigenvalues())
    vecs = np.asarray(s.eigenvectors())
    w = np.linalg.eigvalsh(A)
    want = w[np.argsort(-np.abs(w))][:k]
    # refined values: far better than the 1e-6 f32 tolerance
    np.testing.assert_allclose(
        np.sort(vals), np.sort(want), atol=1e-9 * np.abs(w).max()
    )
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-7 * np.abs(w).max()
    rep = s.mixed_report()
    assert len(rep["resid_f64"]) == k


def test_mixed_sparse_dia():
    # The 2-D Laplacian's top clusters at ~3e-4 relative gaps: within
    # f32 resolution, but the refined RESIDUALS plateau near
    # eps_f32 * kappa_vec — the convergence gate certifies them at an
    # engineering tolerance (1e-4), and the Rayleigh-Ritz VALUES come
    # out far better (checked at 1e-7).
    gx, gy, k = 60, 47, 5  # rectangular grid: simple spectrum (a
    # square grid's (i,j)/(j,i) degeneracies are a multiplicity
    # stress, not a precision one — compute_locked territory)
    lx = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(gx, gx))
    ly = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(gy, gy))
    A = (sps.kron(sps.eye(gy), lx) + sps.kron(ly, sps.eye(gx))).tocsr()
    s = st.SymEigsSolver(
        st.SparseSymMatProd.from_full(A), nev=k, ncv=25
    )
    s.set_precision("mixed")
    s.init()
    nconv = s.compute(st.SortRule.LargestAlge, tol=1e-4)
    assert nconv == k
    vals = np.sort(np.asarray(s.eigenvalues()))[::-1]
    mux = 4 * np.sin(np.pi * np.arange(1, gx + 1) / (2 * (gx + 1))) ** 2
    muy = 4 * np.sin(np.pi * np.arange(1, gy + 1) / (2 * (gy + 1))) ** 2
    lam = np.sort((mux[:, None] + muy[None, :]).ravel())[::-1][:k]
    # values land ~2 decades under the requested tol * ||A|| = 8e-4
    np.testing.assert_allclose(vals, lam, atol=1e-5)


def test_mixed_gate_rejects_unresolvable_cluster():
    """A spectrum whose wanted gaps sit below f32 resolution must not
    be reported Successful at a tight tol — the re-measured residual
    gate catches it."""
    n, k = 4000, 3
    d = np.ones(n)
    d[-k:] = 2.0 + 1e-8 * np.arange(k)  # gaps ~5e-9 relative
    A = sps.diags(d).tocsr()
    s = st.SymEigsSolver(
        st.SparseSymMatProd.from_full(A), nev=k, ncv=12
    )
    s.set_precision("mixed")
    s.init()
    nconv = s.compute(st.SortRule.LargestAlge, maxit=40, tol=1e-6)
    # values may individually converge (the cluster acts as one);
    # the point is no silent Success with a bad subspace
    if nconv < k:
        assert s.info() == st.CompInfo.NotConverging


def test_mixed_rejects_tight_tol():
    A = np.diag(np.arange(1.0, 40.0))
    s = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=3, ncv=12)
    s.set_precision("mixed")
    s.init()
    with pytest.raises(ValueError, match="mixed precision accepts"):
        s.compute(st.SortRule.LargestMagn, tol=1e-10)


def test_mixed_rejected_on_generalized():
    A = _laplacian_2d(12)
    B = sps.eye(144).tocsr()
    op = st.SymShiftInvert(A, B)
    eigs = st.SymGEigsShiftSolver(
        op, st.SparseSymMatProd.from_full(B), 2, 8, 0.0
    )
    with pytest.raises(ValueError, match="plain symmetric"):
        eigs.set_precision("mixed")


def test_double_after_mixed_resets():
    rng = np.random.default_rng(1)
    n, k = 120, 3
    A = rng.normal(size=(n, n))
    A = A + A.T
    s = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=k, ncv=15)
    s.set_precision("mixed")
    s.init()
    s.compute(st.SortRule.LargestMagn, tol=1e-6)
    s.set_precision("double")
    s.init()
    n2 = s.compute(st.SortRule.LargestMagn, tol=1e-10)
    assert n2 == k
    vals = np.asarray(s.eigenvalues())
    vecs = np.asarray(s.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-9 * np.abs(vals).max()
