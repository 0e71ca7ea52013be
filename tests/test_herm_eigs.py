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
    # Lanczos finds one copy per doubled eigenvalue; dedupe and take
    # the distinct top-k.
    distinct = []
    for v in sorted(vals, reverse=True):
        if not distinct or abs(v - distinct[-1]) > 1e-8:
            distinct.append(v)
    w = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(distinct[: k // 2], w[::-1][: k // 2], atol=1e-9)
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-8
