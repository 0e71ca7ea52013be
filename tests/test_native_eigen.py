"""Native (callback-free) Hessenberg eigen pipeline tests, and
equivalence of the gen solvers under the native backend."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import spectra_tpu as st
from spectra_tpu.linalg.schur import (
    complexify_schur,
    hessenberg_schur,
    hessenberg_schur_complex,
    hessenberg_eigen_native,
    triangular_eigenvectors,
)


def _rand_hess(m, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(m, m))
    if complex_:
        H = H + 1j * rng.normal(size=(m, m))
    return np.triu(H, -1)


@pytest.mark.parametrize("m", [8, 30])
def test_complexify_schur(m):
    H = _rand_hess(m, seed=m)
    res = hessenberg_schur(jnp.asarray(H))
    Tc, Uc = complexify_schur(res.T, res.U)
    Tc, Uc = np.asarray(Tc), np.asarray(Uc)
    assert np.abs(np.tril(Tc, -1)).max() == 0
    np.testing.assert_allclose(Uc.conj().T @ Uc, np.eye(m), atol=1e-11)
    np.testing.assert_allclose(Uc @ Tc @ Uc.conj().T, H, atol=1e-10)


@pytest.mark.parametrize("m", [10, 40])
def test_complex_schur(m):
    H = _rand_hess(m, seed=m, complex_=True)
    res = hessenberg_schur_complex(jnp.asarray(H))
    assert bool(res.converged)
    T, U = np.asarray(res.T), np.asarray(res.U)
    assert np.abs(np.tril(T, -1)).max() == 0
    np.testing.assert_allclose(U.conj().T @ U, np.eye(m), atol=1e-11)
    np.testing.assert_allclose(U @ T @ U.conj().T, H, atol=1e-10)


def test_triangular_eigenvectors():
    m = 20
    rng = np.random.default_rng(5)
    T = np.triu(rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m)))
    Y = np.asarray(triangular_eigenvectors(jnp.asarray(T)))
    lam = np.diag(T)
    resid = np.abs(T @ Y - Y * lam[None, :]).max()
    assert resid < 1e-10
    np.testing.assert_allclose(np.linalg.norm(Y, axis=0), np.ones(m), atol=1e-12)


@pytest.mark.parametrize("complex_", [False, True])
@pytest.mark.parametrize("m", [12, 35])
def test_native_eigen_pairs(m, complex_):
    H = _rand_hess(m, seed=m + 1, complex_=complex_)
    evals, evecs = hessenberg_eigen_native(jnp.asarray(H))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    resid = np.abs(H @ evecs - evecs * evals[None, :]).max()
    assert resid < 1e-9
    true = np.linalg.eigvals(H)
    np.testing.assert_allclose(
        np.sort_complex(np.round(evals, 8)),
        np.sort_complex(np.round(true, 8)),
        atol=1e-7,
    )
    if not complex_:
        # conjugate pairs exact and adjacent
        for i in range(m - 1):
            if evals[i].imag > 0:
                assert evals[i + 1] == np.conj(evals[i])


class TestGenSolverNativeBackend:
    """GenEigsSolver with the native (callback-free) Ritz extraction."""

    def setup_method(self):
        self._old = os.environ.get("SPECTRA_TPU_EIGEN_BACKEND")
        os.environ["SPECTRA_TPU_EIGEN_BACKEND"] = "native"

    def teardown_method(self):
        if self._old is None:
            os.environ.pop("SPECTRA_TPU_EIGEN_BACKEND", None)
        else:
            os.environ["SPECTRA_TPU_EIGEN_BACKEND"] = self._old

    def test_real(self):
        rng = np.random.RandomState(123)
        A = rng.uniform(size=(80, 80)) - 0.5
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=5, ncv=20)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == 5
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9

    def test_complex(self):
        rng = np.random.RandomState(7)
        A = (rng.uniform(size=(50, 50)) - 0.5) + 1j * (
            rng.uniform(size=(50, 50)) - 0.5
        )
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=4, ncv=16)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9


def test_native_degenerate_complex_pairs():
    """Eigenvector assembly pairs re/im columns by ORIGINAL LAPACK
    column adjacency (via the retained selection permutation), so two
    conjugate pairs with bit-identical eigenvalues cannot cross-match
    into non-eigenvectors."""
    import numpy as np

    from spectra_tpu.native import dense_eigs as nd

    if not nd.available():
        import pytest

        pytest.skip("native toolchain unavailable")

    c, s = np.cos(0.7), np.sin(0.7)
    R = np.array([[c, -s], [s, c]])
    A = np.zeros((10, 10))
    A[:2, :2] = 1.3 * R
    A[2:4, 2:4] = 1.3 * R  # exactly degenerate second pair
    A[4:, 4:] = np.diag([0.9, 0.5, 0.3, -0.2, 0.1, -0.05])
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((10, 10)))
    A = Q @ A @ Q.T
    out = nd.dense_eigs(
        A, 4, 9, 0, False, 1e-10, 2000, rng.standard_normal(10)
    )
    w, V, nconv = out["values"], out["vectors"], int(out["nconv"])
    assert nconv == 4
    res = np.abs(A @ V - V * w[None, :]).max(axis=0)
    assert res[:4].max() < 1e-8
