"""Krylov-Schur restarting for the general solvers (_gen_ks)."""

import numpy as np
import pytest

import spectra_tpu as st


def _dense(n, seed):
    return np.random.default_rng(seed).normal(size=(n, n))


def test_matches_implicit_restart_exactly():
    """With exact shifts, Krylov-Schur and implicit restarts are
    mathematically equivalent (Stewart 2001): identical restart and
    matvec counts on the same starting vector."""
    A = _dense(200, 0)
    runs = {}
    for method in ("implicit", "krylov_schur"):
        s = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=5, ncv=16)
        s.init()
        s.set_restart_method(method)
        nconv = s.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-10)
        assert nconv == 5
        assert s.info() == st.CompInfo.Successful
        runs[method] = (s.num_iterations(), s.num_operations(), s.eigenvalues())
    assert runs["implicit"][0] == runs["krylov_schur"][0]
    assert runs["implicit"][1] == runs["krylov_schur"][1]
    np.testing.assert_allclose(
        runs["implicit"][2], runs["krylov_schur"][2], rtol=1e-8
    )


@pytest.mark.parametrize("selection", [st.SortRule.LargestMagn, st.SortRule.LargestReal])
def test_residuals(selection):
    A = _dense(150, 3)
    s = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=4, ncv=14)
    s.init()
    s.set_restart_method("krylov_schur")
    nconv = s.compute(selection, maxit=500, tol=1e-10)
    assert nconv == 4
    vals = s.eigenvalues()
    vecs = s.eigenvectors()
    assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-8


def test_shift_invert_transform():
    """The Ritz-value back-transform must run on the KS path too."""
    A = _dense(120, 5)
    sigma = 0.3
    s = st.GenEigsRealShiftSolver(
        st.DenseGenRealShiftSolve.create(A), nev=3, ncv=12, sigma=sigma
    )
    s.init()
    s.set_restart_method("krylov_schur")
    nconv = s.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-10)
    assert nconv == 3
    vals = s.eigenvalues()
    vecs = s.eigenvectors()
    assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-7
    # these are the eigenvalues nearest sigma (conjugate-pair members
    # are tied in |lam - sigma| for real sigma, so close the set)
    lam = np.linalg.eigvals(A)
    near = lam[np.argsort(np.abs(lam - sigma), kind="stable")[:4]]
    near = np.concatenate([near, near.conj()])
    for v in vals:
        assert np.min(np.abs(near - v)) < 1e-7


def test_sparse_op():
    import scipy.sparse as sp

    rng = np.random.default_rng(9)
    n = 300
    M = sp.random(n, n, density=0.03, random_state=rng, format="csr")
    M = M + sp.diags(np.linspace(1.0, 2.0, n))
    s = st.GenEigsSolver(st.SparseGenMatProd.create(M), nev=3, ncv=12)
    s.init()
    s.set_restart_method("krylov_schur")
    nconv = s.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-10)
    assert nconv == 3
    vals = s.eigenvalues()
    vecs = s.eigenvectors()
    assert np.abs(M @ vecs - vecs * vals[None, :]).max() < 1e-8


def test_invalid_method_and_complex_rejected():
    A = _dense(30, 1)
    s = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=2, ncv=8)
    with pytest.raises(ValueError):
        s.set_restart_method("bogus")
    C = (A + 1j * _dense(30, 2)).astype(np.complex128)
    sc = st.GenEigsSolver(st.DenseGenMatProd.create(C), nev=2, ncv=8)
    sc.set_restart_method("krylov_schur")
    sc.init()
    with pytest.raises(ValueError):
        sc.compute(st.SortRule.LargestMagn)


def test_ks_matvec_granularity_matches():
    """Krylov-Schur restarts honor set_matvec_granularity (stepped
    factorization, one operator application per device execution) and
    reproduce the per-restart KS driver's decisions exactly."""
    import numpy as np

    import spectra_tpu as st
    from spectra_tpu.util.rng import SimpleRandom

    rng = np.random.default_rng(11)
    A = rng.uniform(size=(150, 150)) - 0.5
    v0 = SimpleRandom(0).random_vec(150)

    def solve(stepped):
        s = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=4, ncv=12)
        s.set_restart_method("krylov_schur")
        if stepped:
            s.set_matvec_granularity(True)
        s.init(v0)
        n = s.compute(st.SortRule.LargestMagn)
        return n, s

    n_ref, ref = solve(False)
    n_st, stp = solve(True)
    assert n_ref == n_st == 4
    assert stp.num_iterations() == ref.num_iterations()
    assert stp.num_operations() == ref.num_operations()
    np.testing.assert_allclose(
        np.sort_complex(stp.eigenvalues()),
        np.sort_complex(ref.eigenvalues()),
        rtol=0,
        atol=1e-10,
    )


def test_ks_locking_hard_spectrum():
    """Dominant well-separated pairs converge restarts before the
    clustered tail; locking freezes them (zero spike coupling) so the
    remaining restarts cannot perturb them. Correctness bar: all nev
    eigenpairs match numpy to the solver tolerance."""
    import numpy as np

    import spectra_tpu as st
    from spectra_tpu.util.rng import SimpleRandom

    n = 250
    rng = np.random.default_rng(42)
    # NORMAL matrix (orthogonal similarity of a block-diagonal) so the
    # eigenvalues are perfectly conditioned: two dominant rotation
    # blocks (complex pairs), one dominant real leader, and a cluster
    # near magnitude 1.
    D = np.zeros((n, n))
    c, s = np.cos(0.6), np.sin(0.6)
    D[:2, :2] = 50.0 * np.array([[c, -s], [s, c]])
    D[2:4, 2:4] = 40.0 * np.array([[c, s], [-s, c]])
    D[4, 4] = -30.0
    D[5:, 5:] = np.diag(1.0 + 0.01 * rng.standard_normal(n - 5))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = Q @ D @ Q.T

    s = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=6, ncv=16)
    s.set_restart_method("krylov_schur")
    s.init(SimpleRandom(0).random_vec(n))
    nconv = s.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-10)
    assert nconv >= 6
    vals = np.sort_complex(s.eigenvalues())[-6:]
    w = np.linalg.eigvals(A)
    want = np.sort_complex(w[np.argsort(-np.abs(w))[:6]])[-6:]
    # Full complex comparison: the dominant eigenvalues are conjugate
    # PAIRS, and the regression this guards against (locked Schur
    # blocks perturbed by later restarts) would corrupt exactly the
    # imaginary parts.
    np.testing.assert_allclose(vals, want, atol=1e-7)
