"""Complex Hermitian solver tests (reference: test/HermEigs.cpp)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _rand_herm(n, seed=123):
    rng = np.random.RandomState(seed)
    A = (rng.uniform(size=(n, n)) - 0.5) + 1j * (rng.uniform(size=(n, n)) - 0.5)
    return A + A.conj().T


@pytest.mark.parametrize("n,k,m", [(10, 3, 6), (100, 10, 20)])
@pytest.mark.parametrize(
    "selection",
    [st.SortRule.LargestMagn, st.SortRule.LargestAlge, st.SortRule.SmallestMagn],
)
def test_dense_herm(n, k, m, selection):
    A = _rand_herm(n)
    op = st.DenseHermMatProd.create(A)
    eigs = st.HermEigsSolver(op, nev=k, ncv=m)
    eigs.init()
    nconv = eigs.compute(selection)
    assert eigs.info() == st.CompInfo.Successful
    assert nconv == k
    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    assert vals.dtype.kind == "f"  # Hermitian eigenvalues are real
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-9
    w = np.linalg.eigvalsh(A)
    if selection == st.SortRule.LargestAlge:
        want = w[-k:]
    elif selection == st.SortRule.LargestMagn:
        want = w[np.argsort(-np.abs(w))[:k]]
    else:
        want = w[np.argsort(np.abs(w))[:k]]
    np.testing.assert_allclose(np.sort(vals), np.sort(want), atol=1e-9)


def test_sparse_herm():
    n, k, m = 80, 5, 16
    rng = np.random.RandomState(7)
    A = sps.random(n, n, density=0.1, random_state=rng, format="csr")
    A = A + 1j * sps.random(n, n, density=0.1, random_state=np.random.RandomState(8))
    A = (A + A.conj().T).tocsr()
    op = st.SparseHermMatProd.create(sps.tril(A, format="csr"), uplo="L")
    eigs = st.HermEigsSolver(op, nev=k, ncv=m)
    eigs.init()
    eigs.compute(st.SortRule.LargestMagn)
    assert eigs.info() == st.CompInfo.Successful
    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-9


def test_herm_shift_solve():
    """Hermitian shift-and-invert via BKLDLT (complex path)."""
    n, k, m = 60, 4, 12
    A = _rand_herm(n, seed=11)
    from spectra_tpu.matop.shift_solve import DenseHermShiftSolve

    op = DenseHermShiftSolve.create(A)
    eigs = st.SymEigsShiftSolver(op, nev=k, ncv=m, sigma=0.2)
    eigs.init()
    eigs.compute(st.SortRule.LargestMagn)
    assert eigs.info() == st.CompInfo.Successful
    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-9
    w = np.linalg.eigvalsh(A)
    closest = w[np.argsort(np.abs(w - 0.2))[:k]]
    np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-9)


def test_real_embedded_herm():
    """Hermitian solve through the real 2n-embedding — the path for
    accelerators without complex arithmetic (matop/herm_embed.py)."""
    from spectra_tpu.matop.herm_embed import RealEmbeddedHermMatProd

    n, k = 60, 4
    A = _rand_herm(n, seed=21)
    op = RealEmbeddedHermMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=4 * k)
    eigs.init()
    eigs.compute(st.SortRule.LargestAlge)
    assert eigs.info() == st.CompInfo.Successful
    vals = eigs.eigenvalues()
    vecs = op.recover_eigenvectors(np.asarray(eigs.eigenvectors()))
    # The J-structured Lanczos never admits both members of a J-orbit,
    # so the k Ritz values ARE the true top-k of A — no dedupe needed.
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.sort(vals)[::-1], w[::-1][:k], atol=1e-9)
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-8


def test_real_embedded_resolves_multiplicity():
    """Genuinely repeated Hermitian eigenvalues are resolved on the real
    embedding (round-1 caveat closed): both copies returned, with
    linearly independent complex eigenvectors."""
    from spectra_tpu.matop.herm_embed import RealEmbeddedHermMatProd

    rng = np.random.default_rng(7)
    n = 60
    M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    U, _ = np.linalg.qr(M)
    w = np.linspace(0.1, 5.0, n)
    w[-1] = w[-2] = 6.0  # double top eigenvalue
    A = (U * w) @ U.conj().T
    A = 0.5 * (A + A.conj().T)

    op = RealEmbeddedHermMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=4, ncv=16)
    eigs.init()
    eigs.compute(st.SortRule.LargestAlge)
    assert eigs.info() == st.CompInfo.Successful
    vals = np.sort(eigs.eigenvalues())[::-1]
    np.testing.assert_allclose(vals[:2], [6.0, 6.0], atol=1e-9)
    vecs = op.recover_eigenvectors(np.asarray(eigs.eigenvectors()))
    resid = np.abs(A @ vecs - vecs * eigs.eigenvalues()[None, :]).max()
    assert resid < 1e-8
    # complex eigenvectors must be mutually orthogonal — in particular
    # the two copies of 6.0 are not the same J-orbit re-reported
    G = vecs.conj().T @ vecs
    assert np.abs(G - np.diag(np.diag(G))).max() < 1e-8


def test_j_structured_factorization_invariants():
    """The embedded Lanczos basis satisfies V^T V = I  and  V^T J V = 0
    (complex-linear independence), plus the Krylov relation."""
    import jax

    from spectra_tpu.linalg import krylov
    from spectra_tpu.matop.arnoldi_op import ArnoldiOp, JStructuredArnoldiOp
    from spectra_tpu.matop.herm_embed import RealEmbeddedHermMatProd
    from spectra_tpu.util.rng import SimpleRandom

    n, m = 40, 12
    A = _rand_herm(n, seed=5)
    op = RealEmbeddedHermMatProd.create(A)
    arnop = ArnoldiOp.create(op)
    assert isinstance(arnop, JStructuredArnoldiOp)
    v0 = SimpleRandom(0).random_vec(2 * n)
    state = krylov.init(arnop, v0, m, jax.random.key(0))
    state = krylov.factorize_from(arnop, state, 1, "lanczos")
    V = np.asarray(state.V).T
    H = np.asarray(state.H)
    f = np.asarray(state.f)
    JV = np.asarray(op.j_map(state.V)).T
    assert np.abs(V.T @ V - np.eye(m)).max() < 1e-12
    assert np.abs(V.T @ JV).max() < 1e-12
    E = np.block(
        [[np.real(A), -np.imag(A)], [np.imag(A), np.real(A)]]
    )
    lhs = E @ V
    rhs = V @ H + np.outer(f, np.eye(m)[-1])
    assert np.abs(lhs - rhs).max() < 1e-11


def test_large_result_leaves_stay_on_device(monkeypatch):
    # At extreme scale the final basis V is GBs; _finish_result keeps
    # leaves above _FETCH_LIMIT_BYTES device-resident and the accessors
    # (eigenvalues / eigenvectors / compute_locked) must work with the
    # device copy (round-4 north-star requirement).
    import jax

    from spectra_tpu.solvers import base as base_mod

    monkeypatch.setattr(base_mod, "_FETCH_LIMIT_BYTES", 1024)
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")  # not native
    rng = np.random.default_rng(0)
    A = rng.uniform(size=(60, 60)) - 0.5
    A = A + A.T
    eigs = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=4, ncv=16)
    eigs.init()
    nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
    assert nconv == 4
    assert isinstance(eigs._result.V, jax.Array)  # stayed on device
    vals = np.asarray(eigs.eigenvalues())
    X = np.asarray(eigs.eigenvectors())
    assert np.abs(A @ X - X * vals[None, :]).max() <= 1e-9
