"""Selective (omega-recurrence) re-orthogonalization tests.

`HermEigsBase.set_reorth("selective")` replaces the always-on DGKS
projections with Simon's partial re-orthogonalization: an O(ncv)
recurrence estimates the orthogonality loss per step and the (n, ncv)
projections are paid only when the estimate crosses the PROPACK
threshold sqrt(eps/ncv). The contract: SEMIorthogonality of the basis
(~sqrt(eps)) and Ritz pairs matching the full-reorth mode to solver
tolerance. The reference has no counterpart (Lanczos.h:62-187 is
always-on DGKS); this is the fast path when the projections dominate
the step cost (large n, cheap operator / host-factored shift-solve).
"""

import os

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule


@pytest.fixture(autouse=True)
def _jax_dense_driver(monkeypatch):
    # Pin the jitted driver: the native dense driver ignores the reorth
    # knob (it has its own full-reorth Lanczos), and this test targets
    # the jitted Krylov loop.
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")


def _run(op, k, m, selection, reorth, tol=1e-10, **kw):
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.set_reorth(reorth)
    eigs.init()
    nconv = eigs.compute(selection, tol=tol, **kw)
    assert eigs.info() == CompInfo.Successful
    assert nconv == k
    return eigs


def test_rejects_unknown_method():
    A = np.eye(4)
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), 1, 3)
    with pytest.raises(ValueError):
        eigs.set_reorth("sometimes")


def test_matches_full_reorth_dense():
    rng = np.random.default_rng(7)
    A = rng.uniform(size=(200, 200)) - 0.5
    A = A + A.T
    op = st.DenseSymMatProd.create(A)
    e_full = _run(op, 6, 20, SortRule.LargestMagn, "full")
    e_sel = _run(op, 6, 20, SortRule.LargestMagn, "selective")
    v_full = np.sort(np.asarray(e_full.eigenvalues()))
    v_sel = np.sort(np.asarray(e_sel.eigenvalues()))
    assert np.abs(v_full - v_sel).max() <= 1e-9


def test_fast_convergence_no_ghosts():
    # Widely separated dominant eigenvalues: the classic case where
    # Lanczos without re-orthogonalization produces ghost copies.
    n = 500
    d = np.linspace(1.0, 100.0, n) ** 2
    A = sps.diags(d).tocsr()
    op = st.SparseSymMatProd.from_full(A)
    eigs = _run(op, 8, 24, SortRule.LargestMagn, "selective", tol=1e-12)
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    want = np.sort(d)[-8:]
    # No ghost duplicates; values at residual-level accuracy.
    assert np.abs((vals - want) / want).max() <= 1e-9
    X = np.asarray(eigs.eigenvectors())
    orth = np.abs(X.T @ X - np.eye(X.shape[1])).max()
    assert orth <= 1e-7  # semiorthogonality contract


def test_semiorthogonal_basis_residuals():
    rng = np.random.default_rng(11)
    A = rng.uniform(size=(300, 300)) - 0.5
    A = A + A.T
    op = st.DenseSymMatProd.create(A)
    eigs = _run(op, 10, 30, SortRule.BothEnds, "selective")
    vals = np.asarray(eigs.eigenvalues())
    X = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ X - X * vals[None, :]).max()
    assert resid <= 1e-9


def test_shift_invert_selective():
    n = 400
    main = 2.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    A = sps.diags([off, main, off], [-1, 0, 1]).tocsr()
    op = st.SparseSymShiftSolve.create(A).set_shift(0.0)
    eigs = st.SymEigsShiftSolver.from_factored(op, 4, 16, 0.0)
    eigs.set_reorth("selective")
    eigs.init()
    nconv = eigs.compute(SortRule.LargestMagn, tol=1e-10)
    assert eigs.info() == CompInfo.Successful
    assert nconv == 4
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    i = np.arange(1, 5)
    want = 4 * np.sin(i * np.pi / (2 * (n + 1))) ** 2
    assert np.abs(vals - want).max() <= 1e-10


def test_generalized_b_metric_selective():
    # B-inner-product Lanczos: the omega recurrence runs in the B metric
    # unchanged (all inner products route through the ArnoldiOp).
    rng = np.random.default_rng(3)
    n = 150
    A = rng.uniform(size=(n, n)) - 0.5
    A = A + A.T
    M = rng.uniform(size=(n, n)) - 0.5
    B = M @ M.T + n * np.eye(n)
    geigs = st.SymGEigsSolver(
        st.DenseSymMatProd.create(A),
        st.DenseCholesky.create(B),
        nev=5,
        ncv=18,
    )
    geigs.set_reorth("selective")
    geigs.init()
    nconv = geigs.compute(SortRule.LargestMagn, tol=1e-10)
    assert geigs.info() == CompInfo.Successful
    assert nconv == 5
    vals = np.sort(np.asarray(geigs.eigenvalues()))
    import scipy.linalg as sla

    w = np.sort(sla.eigh(A, B, eigvals_only=True))
    w = w[np.argsort(-np.abs(w))[:5]]
    assert np.abs(np.sort(w) - vals).max() <= 1e-9


def test_thick_restart_falls_back_to_full():
    # Thick restarts leave H an arrowhead; the omega recurrence reads
    # only diag/subdiag and would never detect loss against the locked
    # vectors — the combination must fall back to full reorth (advisor
    # round-3 finding: thick+selective returned eigenvalues ~1.9e10 on
    # a spectrum with max 1e4, reported Successful).
    n = 500
    d = np.linspace(1.0, 100.0, n) ** 2
    A = sps.diags(d).tocsr()
    op = st.SparseSymMatProd.from_full(A)
    eigs = st.SymEigsSolver(op, nev=8, ncv=16)
    eigs.set_restart_method("thick")
    eigs.set_reorth("selective")
    eigs.init()
    nconv = eigs.compute(SortRule.LargestMagn, tol=1e-10)
    assert eigs.info() == CompInfo.Successful
    assert nconv == 8
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    want = np.sort(d)[-8:]
    assert np.abs((vals - want) / want).max() <= 1e-9
    X = np.asarray(eigs.eigenvectors())
    assert np.abs(X.T @ X - np.eye(X.shape[1])).max() <= 1e-7


def test_stepped_driver_selective_parity():
    # The matvec-granularity stepped driver honors selective reorth
    # (round-3 verdict: the n >= 1e6 shift-invert — the workload the
    # mode was built for — runs ONLY stepped). Parity of eigenvalues
    # vs the full-reorth stepped run at 1e-10, on a spectrum that
    # ghosts without re-orthogonalization.
    n = 500
    d = np.linspace(1.0, 100.0, n) ** 2
    A = sps.diags(d).tocsr()
    op = st.SparseSymMatProd.from_full(A)

    def stepped(reorth):
        eigs = st.SymEigsSolver(op, nev=8, ncv=24)
        eigs.set_matvec_granularity(True)
        eigs.set_reorth(reorth)
        eigs.init()
        nconv = eigs.compute(SortRule.LargestMagn, tol=1e-12)
        assert eigs.info() == CompInfo.Successful
        assert nconv == 8
        return eigs

    e_sel = stepped("selective")
    vals = np.sort(np.asarray(e_sel.eigenvalues()))
    want = np.sort(d)[-8:]
    assert np.abs((vals - want) / want).max() <= 1e-9
    v_full = np.sort(np.asarray(stepped("full").eigenvalues()))
    assert np.abs((vals - v_full) / v_full).max() <= 1e-10
    X = np.asarray(e_sel.eigenvectors())
    assert np.abs(X.T @ X - np.eye(X.shape[1])).max() <= 1e-7


def test_stepped_selective_matches_compiled_selective():
    # Same mode through the two drivers (compiled fori_loop vs split
    # stepped programs) must execute the same arithmetic: eigenvalues
    # agree to tolerance.
    rng = np.random.default_rng(17)
    A = rng.uniform(size=(200, 200)) - 0.5
    A = A + A.T
    op = st.DenseSymMatProd.create(A)
    e_comp = _run(op, 6, 20, SortRule.LargestMagn, "selective")
    eigs = st.SymEigsSolver(op, nev=6, ncv=20)
    eigs.set_matvec_granularity(True)
    eigs.set_reorth("selective")
    eigs.init()
    nconv = eigs.compute(SortRule.LargestMagn, tol=1e-10)
    assert eigs.info() == CompInfo.Successful
    assert nconv == 6
    v1 = np.sort(np.asarray(e_comp.eigenvalues()))
    v2 = np.sort(np.asarray(eigs.eigenvalues()))
    assert np.abs(v1 - v2).max() <= 1e-9


def test_structured_op_falls_back_to_full():
    # Hermitian solvers on the real embedding use a J-structured op;
    # selective mode must silently fall back to full reorth there and
    # still produce correct eigenvalues.
    rng = np.random.default_rng(5)
    n = 60
    H = rng.uniform(size=(n, n)) + 1j * rng.uniform(size=(n, n))
    H = H + H.conj().T
    eigs = st.HermEigsSolver(st.DenseHermMatProd.create(H), 4, 14)
    eigs.set_reorth("selective")
    eigs.init()
    nconv = eigs.compute(SortRule.LargestMagn, tol=1e-10)
    assert eigs.info() == CompInfo.Successful
    assert nconv == 4
    w = np.linalg.eigvalsh(H)
    want = np.sort(w[np.argsort(-np.abs(w))[:4]])
    vals = np.sort(np.asarray(eigs.eigenvalues()).real)
    assert np.abs(vals - want).max() <= 1e-9
