"""General complex matrices through the real 2n embedding
(matop/gen_embed.py + solvers/gen_eigs.EmbeddedGenEigsSolver) — the
complex `GenEigsSolver` capability (reference: GenEigsSolver.h:159-186,
v1.2.0) on complex-free accelerators. These tests run the embedding
path explicitly on the CPU runtime and check against the direct
complex solve / dense ground truth."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.matop.gen_embed import RealEmbeddedGenMatProd


def _rand_complex(n, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))


def _check(A, vals, vecs, k, rule, atol=1e-8):
    n = A.shape[0]
    assert len(vals) == k, f"{len(vals)} != {k}"
    Ad = A.toarray() if hasattr(A, "toarray") else A
    resid = np.abs(Ad @ vecs - vecs * vals[None, :]).max()
    assert resid < atol, f"residual {resid}"
    w = np.linalg.eigvals(Ad)
    if rule == st.SortRule.LargestMagn:
        want = w[np.argsort(-np.abs(w))][:k]
        np.testing.assert_allclose(
            np.sort(np.abs(vals)), np.sort(np.abs(want)), atol=atol
        )
    elif rule == st.SortRule.LargestReal:
        want = w[np.argsort(-w.real)][:k]
        np.testing.assert_allclose(
            np.sort(vals.real), np.sort(want.real), atol=atol
        )


@pytest.mark.parametrize(
    "rule", [st.SortRule.LargestMagn, st.SortRule.LargestReal]
)
def test_embedded_dense_complex(rule):
    n, k = 60, 4
    A = _rand_complex(n, 3)
    op = RealEmbeddedGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=4 * k)
    eigs.init()
    nconv = eigs.compute(rule, maxit=500, tol=1e-12, sorting=rule)
    assert nconv == k
    _check(A, eigs.eigenvalues(), eigs.eigenvectors(), k, rule)


def test_embedded_sparse_complex():
    n, k = 200, 5
    rng = np.random.default_rng(11)
    A = sps.random(
        n, n, density=0.05, random_state=4, format="csr",
        dtype=np.float64,
    )
    A = A + 1j * sps.random(
        n, n, density=0.05, random_state=5, format="csr",
        dtype=np.float64,
    )
    A = A + sps.diags(3.0 + rng.normal(size=n))  # spread the spectrum
    op = RealEmbeddedGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=6 * k)
    eigs.init()
    nconv = eigs.compute(
        st.SortRule.LargestMagn, maxit=800, tol=1e-12
    )
    assert nconv == k
    vals, vecs = eigs.eigenvalues(), eigs.eigenvectors()
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < 1e-8
    w = np.linalg.eigvals(A.toarray())
    want = np.sort(np.abs(w))[::-1][:k]
    np.testing.assert_allclose(
        np.sort(np.abs(vals))[::-1], want, atol=1e-8
    )


def test_embedded_matches_direct_complex_solver():
    """Embedding vs the direct complex IRAM on the same matrix."""
    n, k = 80, 4
    A = _rand_complex(n, 17)
    op_c = st.DenseGenMatProd.create(A)
    direct = st.GenEigsSolver(op_c, nev=k, ncv=24)
    direct.init()
    direct.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-12)
    op_e = RealEmbeddedGenMatProd.create(A)
    emb = st.GenEigsSolver(op_e, nev=k, ncv=24)
    emb.init()
    emb.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-12)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(direct.eigenvalues()))),
        np.sort(np.abs(emb.eigenvalues())),
        atol=1e-9,
    )


def test_embedded_real_eigenvalue_matrix():
    """A complex matrix with some real eigenvalues (phantom/C parts
    coincide in value): the dedupe keeps one copy per C-eigenpair."""
    rng = np.random.default_rng(23)
    n, k = 50, 3
    # similar transform of a real diagonal + small complex perturbation
    d = np.diag(np.linspace(1.0, 5.0, n))
    S = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)) * 0.1
    A = np.linalg.solve(S, d @ S)  # complex matrix, REAL spectrum
    op = RealEmbeddedGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=20)
    eigs.init()
    nconv = eigs.compute(st.SortRule.LargestMagn, maxit=800, tol=1e-12)
    assert nconv == k
    vals = np.sort(eigs.eigenvalues().real)[::-1]
    np.testing.assert_allclose(
        vals, np.linspace(1.0, 5.0, n)[::-1][:k], atol=1e-7
    )
    assert np.abs(eigs.eigenvalues().imag).max() < 1e-7


def test_embedded_complex_v0_realifies():
    n, k = 40, 3
    A = _rand_complex(n, 31)
    op = RealEmbeddedGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=16)
    rng = np.random.default_rng(0)
    v0 = rng.normal(size=n) + 1j * rng.normal(size=n)
    eigs.init(v0)
    nconv = eigs.compute(st.SortRule.LargestMagn, maxit=500, tol=1e-11)
    assert nconv == k


def test_embedded_largest_imag():
    """LI selection through the embedding: the conjugate-closed Ritz
    set of the real IRAM keeps both pair members, so phantom filtering
    leaves exactly C's largest-imaginary eigenvalues — including when
    every eigenvalue of C has negative imaginary part (the all-phantom
    top case)."""
    n, k = 60, 3
    # asymmetric imaginary spectrum (shifted): LI on the embedding
    # without the rotation would return largest |Im| instead
    A = _rand_complex(n, 41) - 3.0j * np.eye(n)
    op = RealEmbeddedGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=28)
    eigs.init()
    nconv = eigs.compute(
        st.SortRule.LargestImag, maxit=800, tol=1e-12,
        sorting=st.SortRule.LargestImag,
    )
    assert nconv == k
    vals = eigs.eigenvalues()
    w = np.linalg.eigvals(A)
    want = np.sort(w.imag)[::-1][:k]
    np.testing.assert_allclose(
        np.sort(vals.imag)[::-1], want, atol=1e-8
    )
    # each returned value is a TRUE eigenvalue of C (not a phantom
    # conjugate: the conj spectrum's top-|Im| values differ from these)
    dist = np.abs(vals[:, None] - w[None, :]).min(axis=1)
    assert dist.max() < 1e-8
