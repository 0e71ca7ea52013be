"""Converged-pair locking / deflated continuation (compute_locked).

A single restarted Krylov sequence cannot certify "the k smallest
counted with multiplicity": in exact arithmetic it holds one direction
per eigenplane, and restart compression truncates the rounding noise
that would grow the others — ARPACK and the reference share the
limitation (reference regression test test/Example1.cpp, issue #144).
``compute_locked`` locks converged Ritz vectors, re-runs the solver in
the deflated complement from a fresh random vector, and stops when the
complement holds nothing more wanted than the nev-th value.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule


def _laplacian_2d(g):
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    e = sps.eye(g)
    return (sps.kron(l1, e) + sps.kron(e, l1)).tocsr()


def _lap2d_spectrum(g, k):
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    lam = (mu[:, None] + mu[None, :]).ravel()
    return np.sort(lam)[:k]


def test_degenerate_smallest_full_multiplicity():
    # lambda_2 = lambda_3 (the permutation-degenerate pair): plain
    # compute() may capture only one copy; compute_locked must return
    # the true multiplicity-counted smallest four.
    g = 16
    A = _laplacian_2d(g)
    eigs = st.SymEigsSolver(st.SparseSymMatProd.from_full(A), nev=4, ncv=16)
    eigs.init()
    nconv = eigs.compute_locked(
        SortRule.SmallestAlge, sorting=SortRule.SmallestAlge
    )
    assert nconv == 4
    assert eigs.info() == CompInfo.Successful
    assert eigs.certified()
    lam = np.asarray(eigs.eigenvalues())
    np.testing.assert_allclose(lam, _lap2d_spectrum(g, 4), atol=1e-9)
    # Eigenvectors: true eigenpairs AND orthonormal across rounds.
    X = np.asarray(eigs.eigenvectors())
    assert np.abs(A @ X - X * lam[None, :]).max() < 1e-8
    np.testing.assert_allclose(X.T @ X, np.eye(4), atol=1e-8)


def test_cycle_laplacian_issue_144():
    # The #144 matrix: cycle-graph Laplacian, every interior eigenvalue
    # 2 - 2cos(2 pi k / n) is doubly degenerate.
    n = 64
    A = (
        sps.diags([2.0] * n)
        + sps.diags([-1.0] * (n - 1), 1)
        + sps.diags([-1.0] * (n - 1), -1)
    ).tolil()
    A[0, n - 1] = A[n - 1, 0] = -1.0
    A = A.tocsr()
    true = np.sort(2.0 - 2.0 * np.cos(2.0 * np.pi * np.arange(n) / n))

    eigs = st.SymEigsSolver(st.SparseSymMatProd.from_full(A), nev=6, ncv=18)
    eigs.init()
    nconv = eigs.compute_locked(
        SortRule.SmallestAlge, sorting=SortRule.SmallestAlge
    )
    assert nconv == 6
    assert eigs.certified()
    np.testing.assert_allclose(
        np.asarray(eigs.eigenvalues()), true[:6], atol=1e-9
    )


def test_shift_invert_locked_smallest():
    # k-smallest via shift-invert: selection on nu (LargestMagn), want
    # on lambda (SmallestAlge) — the north-star configuration in small.
    g = 12
    A = _laplacian_2d(g)
    op = st.SparseSymShiftSolve.create(A).set_shift(0.0)
    eigs = st.SymEigsShiftSolver.from_factored(op, 6, 20, 0.0)
    eigs.init()
    nconv = eigs.compute_locked(
        SortRule.LargestMagn,
        sorting=SortRule.SmallestAlge,
        want=SortRule.SmallestAlge,
    )
    assert nconv == 6
    assert eigs.certified()
    np.testing.assert_allclose(
        np.asarray(eigs.eigenvalues()), _lap2d_spectrum(g, 6), atol=1e-9
    )


def test_high_multiplicity_dense():
    # Multiplicity 3 at the top: a single Krylov run can never return
    # three copies started from one vector.
    rng = np.random.default_rng(5)
    Q, _ = np.linalg.qr(rng.normal(size=(80, 80)))
    d = np.concatenate([[9.0, 9.0, 9.0], np.linspace(1.0, 5.0, 77)])
    A = (Q * d[None, :]) @ Q.T
    A = 0.5 * (A + A.T)
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=4, ncv=16)
    eigs.init()
    nconv = eigs.compute_locked(SortRule.LargestAlge)
    assert nconv == 4
    assert eigs.certified()
    lam = np.sort(np.asarray(eigs.eigenvalues()))[::-1]
    np.testing.assert_allclose(lam[:3], [9.0, 9.0, 9.0], atol=1e-8)
    np.testing.assert_allclose(lam[3], 5.0, atol=1e-8)


def test_certified_without_degeneracy_one_extra_round():
    # A well-separated spectrum: round 1 already has the wanted set;
    # exactly one deflated round certifies it.
    n = 200
    d = np.linspace(1.0, 10.0, n)
    A = sps.diags(d).tocsr()
    eigs = st.SymEigsSolver(st.SparseSymMatProd.from_full(A), nev=3, ncv=12)
    eigs.init()
    nconv = eigs.compute_locked(SortRule.LargestAlge)
    assert nconv == 3
    assert eigs.certified()
    np.testing.assert_allclose(
        np.sort(np.asarray(eigs.eigenvalues())), np.sort(d)[-3:], atol=1e-9
    )


def test_generalized_b_metric_locking():
    # B-inner-product Lanczos: locked vectors live in the B metric and
    # the deflated rounds must respect it.
    rng = np.random.default_rng(3)
    n = 120
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.concatenate([[8.0, 8.0], np.linspace(0.5, 4.0, n - 2)])
    A = (Q * d[None, :]) @ Q.T
    A = 0.5 * (A + A.T)
    geigs = st.SymGEigsSolver(
        st.DenseSymMatProd.create(A),
        st.DenseCholesky.create(np.eye(n)),
        nev=3,
        ncv=12,
    )
    geigs.init()
    nconv = geigs.compute_locked(SortRule.LargestAlge)
    assert nconv == 3
    assert geigs.certified()
    lam = np.sort(np.asarray(geigs.eigenvalues()))[::-1]
    np.testing.assert_allclose(lam, [8.0, 8.0, 4.0], atol=1e-8)


def test_ncv_locked_continuation_rounds():
    # Reduced-basis continuation rounds (the extreme-scale memory
    # lever) must still certify and return the full wanted set.
    rng = np.random.default_rng(9)
    Q, _ = np.linalg.qr(rng.normal(size=(80, 80)))
    d = np.concatenate([[9.0, 9.0, 9.0], np.linspace(1.0, 5.0, 77)])
    A = (Q * d[None, :]) @ Q.T
    A = 0.5 * (A + A.T)
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=4, ncv=20)
    eigs.init()
    nconv = eigs.compute_locked(SortRule.LargestAlge, ncv_locked=10)
    assert nconv == 4
    assert eigs.certified()
    lam = np.sort(np.asarray(eigs.eigenvalues()))[::-1]
    np.testing.assert_allclose(lam[:3], [9.0, 9.0, 9.0], atol=1e-8)
    with pytest.raises(ValueError):
        eigs.compute_locked(SortRule.LargestAlge, ncv_locked=3)


def test_zero_convergence_leaves_clean_state():
    # Review finding: a compute_locked that converges nothing must not
    # leave a half-nulled result behind (eigenvectors() crashed).
    rng = np.random.default_rng(1)
    A = rng.uniform(size=(200, 200)) - 0.5
    A = A + A.T
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=6, ncv=10)
    eigs.init()
    nconv = eigs.compute_locked(SortRule.LargestMagn, maxit=1)
    if nconv == 0:
        assert np.asarray(eigs.eigenvalues()).size == 0
        assert np.asarray(eigs.eigenvectors()).shape[1] == 0


def test_compute_locked_restores_v0():
    # Review finding: compute_locked must not leave the last
    # continuation round's random v0 behind.
    n = 120
    d = np.linspace(1.0, 12.0, n)
    A = sps.diags(d).tocsr()
    eigs = st.SymEigsSolver(st.SparseSymMatProd.from_full(A), nev=3, ncv=12)
    my_v0 = np.linspace(1.0, 2.0, n)
    eigs.init(my_v0)
    eigs.compute_locked(SortRule.LargestAlge)
    np.testing.assert_allclose(np.asarray(eigs._v0), my_v0)
    with pytest.raises(ValueError):
        eigs.compute_locked(SortRule.BothEnds, want=SortRule.BothEnds)
