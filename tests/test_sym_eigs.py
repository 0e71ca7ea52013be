"""SymEigsSolver integration tests.

Mirrors the reference's test/SymEigs.cpp: seeded random dense symmetric
matrices at sizes 10/100/1000 with (k, m) = (3,6)/(10,20)/(20,50),
iterating over every applicable selection rule, asserting success and
the residual bar ||A U - U L||_inf <= 1e-9.
"""

import numpy as np
import pytest

import spectra_tpu as st
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule

RULES = [
    SortRule.LargestMagn,
    SortRule.LargestAlge,
    SortRule.SmallestMagn,
    SortRule.SmallestAlge,
    SortRule.BothEnds,
]


def _sym_matrix(n, seed=123):
    rng = np.random.default_rng(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _run(A, k, m, selection, maxit=1000, tol=1e-10):
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.init()
    nconv = eigs.compute(selection, maxit=maxit, tol=tol)
    assert eigs.info() == CompInfo.Successful
    assert nconv == k
    assert eigs.num_iterations() > 0
    assert eigs.num_operations() > 0
    vals = np.asarray(eigs.eigenvalues())
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid <= 1e-9, f"residual {resid}"
    return vals


@pytest.mark.parametrize("selection", RULES)
@pytest.mark.parametrize("n,k,m", [(10, 3, 6), (100, 10, 20)])
def test_sym_eigs_dense(n, k, m, selection):
    A = _sym_matrix(n)
    vals = _run(A, k, m, selection)
    # Cross-check the selected eigenvalues against the full spectrum
    w = np.linalg.eigvalsh(A)
    if selection == SortRule.LargestAlge:
        want = w[-k:]
    elif selection == SortRule.SmallestAlge:
        want = w[:k]
    elif selection == SortRule.LargestMagn:
        want = w[np.argsort(-np.abs(w))[:k]]
    elif selection == SortRule.SmallestMagn:
        want = w[np.argsort(np.abs(w))[:k]]
    else:  # BothEnds
        lo, hi = k // 2, k - k // 2
        want = np.concatenate([w[:lo], w[-hi:]])
    np.testing.assert_allclose(np.sort(vals), np.sort(want), atol=1e-8)


@pytest.mark.slow
@pytest.mark.parametrize("selection", [SortRule.LargestMagn, SortRule.SmallestMagn])
def test_sym_eigs_n1000(selection):
    A = _sym_matrix(1000)
    _run(A, 20, 50, selection)


def test_sorting_parameter():
    A = _sym_matrix(100)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=5, ncv=20)
    eigs.init()
    eigs.compute(SortRule.LargestMagn, sorting=SortRule.SmallestAlge)
    vals = np.asarray(eigs.eigenvalues())
    assert np.all(np.diff(vals) >= 0)
    eigs.compute(SortRule.LargestMagn, sorting=SortRule.LargestAlge)
    vals = np.asarray(eigs.eigenvalues())
    assert np.all(np.diff(vals) <= 0)


def test_user_initial_residual():
    A = _sym_matrix(50)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=3, ncv=10)
    eigs.init(np.ones(50))
    nconv = eigs.compute(SortRule.LargestMagn)
    assert nconv == 3


def test_zero_initial_residual_raises():
    A = _sym_matrix(10)
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=2, ncv=5)
    with pytest.raises(ValueError):
        eigs.init(np.zeros(10))


def test_parameter_validation():
    A = _sym_matrix(10)
    op = st.DenseSymMatProd.create(A)
    with pytest.raises(ValueError):
        st.SymEigsSolver(op, nev=0, ncv=5)
    with pytest.raises(ValueError):
        st.SymEigsSolver(op, nev=10, ncv=11)
    with pytest.raises(ValueError):
        st.SymEigsSolver(op, nev=3, ncv=3)


def test_matvec_counts_reported():
    A = _sym_matrix(100)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=3, ncv=12)
    eigs.init()
    eigs.compute(SortRule.LargestMagn)
    # 2 for init, at least ncv - 1 for the first factorization
    assert eigs.num_operations() >= 13


def test_uplo_triangle_input():
    A = _sym_matrix(30)
    full = st.DenseSymMatProd.create(A, uplo="L")
    lower_only = st.DenseSymMatProd.create(np.tril(A), uplo="L")
    upper_only = st.DenseSymMatProd.create(np.triu(A), uplo="U")
    x = np.random.default_rng(0).normal(size=30)
    np.testing.assert_allclose(full.perform_op(x), lower_only.perform_op(x))
    np.testing.assert_allclose(full.perform_op(x), upper_only.perform_op(x))


@pytest.mark.parametrize("k,m", [(3, 6), (5, 12), (6, 12)])
def test_eigenvalue_multiplicity_cycle_laplacian(k, m):
    """Reference regression Example1.cpp (#144): cycle graph Laplacian
    has doubly-degenerate eigenvalues; largest-k at tol=1e-15 must find
    the degenerate copies through restarts."""
    n = 20
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 1.0
        A[i, (i + 1) % n] = -0.5
        A[i, (i - 1) % n] = -0.5
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.init()
    eigs.compute(SortRule.LargestMagn, maxit=1000, tol=1e-15,
                 sorting=SortRule.SmallestAlge)
    assert eigs.info() == CompInfo.Successful
    vals = np.asarray(eigs.eigenvalues())
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid <= 1e-9
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, w[-k:], atol=1e-9)


def test_restart_chunk_bitwise_identical(monkeypatch):
    """Segmented restarts reproduce the single-shot run exactly.

    Pins the jitted driver: segmentation is a property of the compiled
    path, while an unchunked solve would otherwise auto-route to the
    native dense driver (equal to ~1e-14, not bitwise).
    """
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")
    A = _sym_matrix(300)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(300)
    op = st.DenseSymMatProd.create(A)
    e1 = st.SymEigsSolver(op, nev=6, ncv=12)
    e1.init(v0)
    e1.compute(SortRule.LargestMagn)
    e2 = st.SymEigsSolver(op, nev=6, ncv=12)
    e2.set_restart_chunk(3)
    e2.init(v0)
    e2.compute(SortRule.LargestMagn)
    assert e1.num_iterations() == e2.num_iterations()
    np.testing.assert_array_equal(e1.eigenvalues(), e2.eigenvalues())
    np.testing.assert_array_equal(
        np.asarray(e1.eigenvectors()), np.asarray(e2.eigenvectors())
    )


@pytest.mark.parametrize("restart_method", ["implicit", "thick"])
def test_matvec_granularity_matches_compiled(monkeypatch, restart_method):
    """The stepped (one-operator-application-per-execution) driver
    replays the compiled restart loop's decisions exactly: same restart
    count, same matvec count, same eigenpairs. This is the execution
    mode that keeps remote-runtime executions watchdog-safe when each
    operator application is itself an expensive inner solve."""
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")
    A = _sym_matrix(300)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(300)
    op = st.DenseSymMatProd.create(A)

    ref = st.SymEigsSolver(op, nev=6, ncv=12)
    ref.set_restart_method(restart_method)
    ref.init(v0)
    ref.compute(SortRule.LargestMagn)

    stepped = st.SymEigsSolver(op, nev=6, ncv=12)
    stepped.set_restart_method(restart_method)
    stepped.set_matvec_granularity(True)
    stepped.init(v0)
    nconv = stepped.compute(SortRule.LargestMagn)

    assert stepped.info() == CompInfo.Successful
    assert nconv == 6
    assert stepped.num_iterations() == ref.num_iterations()
    assert stepped.num_operations() == ref.num_operations()
    np.testing.assert_allclose(
        stepped.eigenvalues(), ref.eigenvalues(), rtol=0, atol=1e-10
    )
    resid = np.abs(
        A @ np.asarray(stepped.eigenvectors())
        - np.asarray(stepped.eigenvectors()) * np.asarray(stepped.eigenvalues())
    ).max()
    assert resid < 1e-9


def test_matvec_granularity_shift_invert():
    """Stepped execution through the sparse shift-invert operator (the
    intended production pairing: each execution = one inner solve)."""
    import scipy.sparse as sps

    g = 30
    # Anisotropic weights keep the spectrum simple (the isotropic grid
    # has degenerate pairs lambda(i,j) = lambda(j,i), which
    # single-vector Lanczos resolves one copy of).
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))).tocsr()
    n = A.shape[0]
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(n)
    op = st.SparseSymShiftSolve.create(A, method="minres").set_shift(0.0)
    eigs = st.SymEigsShiftSolver.from_factored(op, 4, 12, 0.0)
    eigs.set_matvec_granularity(True)
    eigs.init(v0)
    nconv = eigs.compute(SortRule.LargestMagn, maxit=100, tol=1e-8)
    assert nconv == 4
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    lam = np.sort((mu[:, None] + 1.37 * mu[None, :]).ravel())[:4]
    np.testing.assert_allclose(vals, lam, rtol=1e-7)


def test_checkpoint_resume_identical(tmp_path):
    """An interrupted + resumed run equals the uninterrupted run
    (SURVEY.md section 5: checkpoint/resume for preemptible chips)."""
    A = _sym_matrix(300)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(300)
    op = st.DenseSymMatProd.create(A)

    ref = st.SymEigsSolver(op, nev=6, ncv=12)
    ref.set_restart_chunk(5)
    ref.init(v0)
    ref.compute(SortRule.LargestMagn)

    part = st.SymEigsSolver(op, nev=6, ncv=12)
    part.set_restart_chunk(5)
    part.init(v0)
    part.compute(SortRule.LargestMagn, maxit=10)
    assert part.info() == CompInfo.NotConverging
    path = str(tmp_path / "state.npz")
    part.save_checkpoint(path)

    res = st.SymEigsSolver(op, nev=6, ncv=12)
    res.set_restart_chunk(5)
    res.init(v0)
    res.load_checkpoint(path)
    res.compute(SortRule.LargestMagn)
    assert res.info() == CompInfo.Successful
    assert res.num_iterations() == ref.num_iterations()
    np.testing.assert_array_equal(res.eigenvalues(), ref.eigenvalues())


def test_thick_restart_matches_implicit():
    """Thick restart (TRLan) finds the same eigenpairs at the same
    tolerance as the reference-parity implicit-QR restart."""
    A = _sym_matrix(400)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(400)
    op = st.DenseSymMatProd.create(A)
    results = {}
    for meth in ("implicit", "thick"):
        e = st.SymEigsSolver(op, nev=6, ncv=20)
        e.set_restart_method(meth)
        e.init(v0)
        e.compute(SortRule.LargestMagn)
        assert e.info() == CompInfo.Successful
        v = e.eigenvalues()
        u = np.asarray(e.eigenvectors())
        assert np.abs(A @ u - u * v[None, :]).max() < 1e-9
        results[meth] = v
    np.testing.assert_allclose(
        results["thick"], results["implicit"], atol=1e-9
    )


def test_thick_restart_smallest_sparse():
    import scipy.sparse as sps

    g = 14
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    op = st.SparseSymMatProd.from_full(A)
    e = st.SymEigsSolver(op, nev=5, ncv=24)
    e.set_restart_method("thick")
    e.init()
    e.compute(SortRule.SmallestAlge)
    assert e.info() == CompInfo.Successful
    vals = np.sort(e.eigenvalues())
    true = np.sort(np.linalg.eigvalsh(A.toarray()))[:5]
    np.testing.assert_allclose(vals, true, atol=1e-9)


def test_recompute_with_different_selection():
    """Re-running compute() on the same solver object with another
    selection works (state resets through init/result overwrite)."""
    A = _sym_matrix(120)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=4, ncv=16)
    eigs.init()
    eigs.compute(SortRule.LargestAlge)
    top = eigs.eigenvalues().copy()
    eigs.init()
    eigs.compute(SortRule.SmallestAlge, sorting=SortRule.SmallestAlge)
    bottom = eigs.eigenvalues()
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.sort(top), w[-4:], atol=1e-9)
    np.testing.assert_allclose(np.sort(bottom), w[:4], atol=1e-9)


def test_eigenvectors_nvec_subset():
    A = _sym_matrix(100)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=5, ncv=20)
    eigs.init()
    eigs.compute(SortRule.LargestMagn)
    full = np.asarray(eigs.eigenvectors())
    two = np.asarray(eigs.eigenvectors(2))
    assert two.shape == (100, 2)
    np.testing.assert_array_equal(two, full[:, :2])


def test_matvec_granularity_checkpoint_resume(tmp_path, monkeypatch):
    """load_checkpoint() is honored on the stepped path: a run saved
    mid-iteration by the chunked driver resumes under matvec
    granularity and matches the uninterrupted solve."""
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")
    A = _sym_matrix(300)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(300)
    op = st.DenseSymMatProd.create(A)

    ref = st.SymEigsSolver(op, nev=6, ncv=12)
    ref.init(v0)
    ref.compute(SortRule.LargestMagn)

    part = st.SymEigsSolver(op, nev=6, ncv=12)
    part.set_restart_chunk(5)
    part.init(v0)
    part.compute(SortRule.LargestMagn, maxit=10)
    assert part.info() == CompInfo.NotConverging
    path = str(tmp_path / "state.npz")
    part.save_checkpoint(path)

    res = st.SymEigsSolver(op, nev=6, ncv=12)
    res.set_matvec_granularity(True)
    res.init(v0)
    res.load_checkpoint(path)
    res.compute(SortRule.LargestMagn)
    assert res.info() == CompInfo.Successful
    assert res.num_iterations() == ref.num_iterations()
    np.testing.assert_allclose(
        res.eigenvalues(), ref.eigenvalues(), rtol=0, atol=1e-10
    )


def test_matvec_granularity_breakdown_expansion(monkeypatch):
    """The stepped driver's host-side breakdown branch (rare path: the
    split-program port of expand_basis) replays the compiled driver's
    expansion exactly — eigenvector start forces ||f|| = 0 at init, so
    step 1 must random-restart the basis on both paths."""
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")
    n = 50
    A = np.diag(np.arange(1.0, n + 1.0))
    v0 = np.zeros(n)
    v0[-1] = 1.0  # exact eigenvector: init force-zeros the residual
    op = st.DenseSymMatProd.create(A)

    ref = st.SymEigsSolver(op, nev=3, ncv=8)
    ref.init(v0)
    ref.compute(SortRule.LargestMagn)

    stepped = st.SymEigsSolver(op, nev=3, ncv=8)
    stepped.set_matvec_granularity(True)
    stepped.init(v0)
    nconv = stepped.compute(SortRule.LargestMagn)

    assert nconv == 3
    assert stepped.info() == CompInfo.Successful
    # identical decisions: the expansion's extra operator application
    # is counted on both paths
    assert stepped.num_operations() == ref.num_operations()
    assert stepped.num_iterations() == ref.num_iterations()
    np.testing.assert_allclose(
        np.sort(stepped.eigenvalues()), [n - 2.0, n - 1.0, float(n)],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        stepped.eigenvalues(), ref.eigenvalues(), rtol=0, atol=1e-12
    )
