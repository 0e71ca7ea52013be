"""scipy.sparse.linalg-compatible frontend (spectra_tpu.api).

Ground truth: numpy dense eigendecompositions and scipy's own
eigsh/eigs/svds on small seeded matrices (the reference's test bar:
residual <= 1e-9 at tol 1e-10, test/SymEigs.cpp:44-65).
"""

import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

import spectra_tpu as st


def _sym(n, seed=123):
    rng = np.random.default_rng(seed)
    A = rng.uniform(-0.5, 0.5, size=(n, n))
    return A + A.T


def _spd(n, seed=7):
    rng = np.random.default_rng(seed)
    B = rng.uniform(-0.5, 0.5, size=(n, n))
    return B @ B.T + n * np.eye(n)


def test_eigsh_dense_largest_matches_numpy():
    A = _sym(100)
    w, v = st.eigsh(A, k=5, which="LA")
    wt = np.linalg.eigvalsh(A)
    assert w.shape == (5,) and v.shape == (100, 5)
    assert np.all(np.diff(w) >= 0)  # scipy's ascending order
    np.testing.assert_allclose(w, wt[-5:], atol=1e-9)
    assert np.abs(A @ v - v * w[None, :]).max() < 1e-9


@pytest.mark.parametrize("which", ["LM", "SA", "BE"])
def test_eigsh_which_rules(which):
    A = _sym(60)
    w = st.eigsh(A, k=4, which=which, return_eigenvectors=False)
    wt = np.linalg.eigvalsh(A)
    if which == "LM":
        expect = wt[np.argsort(np.abs(wt))[-4:]]
    elif which == "SA":
        expect = wt[:4]
    else:  # BE: 2 from each end
        expect = np.concatenate([wt[:2], wt[-2:]])
    np.testing.assert_allclose(np.sort(w), np.sort(expect), atol=1e-9)


def test_eigsh_sparse_shift_invert_matches_scipy():
    g = 12
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    sigma = 0.3
    w, v = st.eigsh(A, k=4, sigma=sigma)
    ws = spla.eigsh(A, k=4, sigma=sigma, return_eigenvectors=False)
    np.testing.assert_allclose(w, np.sort(ws), atol=1e-9)
    assert np.abs(A @ v - v * w[None, :]).max() < 1e-8


def test_eigsh_generalized_cholesky():
    A, B = _sym(50), _spd(50)
    w, v = st.eigsh(A, k=3, M=B, which="LA")
    wt = np.sort(np.real(np.linalg.eigvals(np.linalg.solve(B, A))))
    np.testing.assert_allclose(w, wt[-3:], atol=1e-8)
    assert np.abs(A @ v - (B @ v) * w[None, :]).max() < 1e-8


@pytest.mark.parametrize("mode", ["normal", "buckling", "cayley"])
def test_eigsh_generalized_shift_modes(mode):
    A, B = _spd(40, seed=3), _spd(40, seed=4)
    sigma = 1.0
    w, v = st.eigsh(A, k=3, M=B, sigma=sigma, mode=mode)
    assert np.abs(A @ v - (B @ v) * w[None, :]).max() < 1e-8
    # nearest-sigma selection
    wt = np.real(np.linalg.eigvals(np.linalg.solve(B, A)))
    if mode == "buckling":
        # buckling selects largest nu = lambda/(lambda - sigma)
        assert w.shape == (3,)
    else:
        expect = wt[np.argsort(np.abs(wt - sigma))[:3]]
        np.testing.assert_allclose(np.sort(w), np.sort(expect), atol=1e-8)


def test_eigsh_complex_hermitian():
    rng = np.random.default_rng(5)
    H = rng.normal(size=(40, 40)) + 1j * rng.normal(size=(40, 40))
    H = H + H.conj().T
    w, v = st.eigsh(H, k=3, which="LA")
    wt = np.linalg.eigvalsh(H)
    np.testing.assert_allclose(w, wt[-3:], atol=1e-8)
    assert np.abs(H @ v - v * w[None, :]).max() < 1e-8


def test_eigsh_operator_passthrough():
    A = _sym(80)
    op = st.DenseSymMatProd.create(A)
    w = st.eigsh(op, k=3, which="LA", return_eigenvectors=False)
    np.testing.assert_allclose(w, np.linalg.eigvalsh(A)[-3:], atol=1e-9)


def test_eigsh_no_convergence_partial_results():
    A = _sym(200, seed=9)
    with pytest.raises(st.NoConvergence) as ei:
        st.eigsh(A, k=6, ncv=7, maxiter=1, which="LA")
    err = ei.value
    assert err.eigenvalues.shape[0] < 6
    # whatever DID converge is accurate
    if err.eigenvalues.size:
        wt = np.linalg.eigvalsh(A)
        for lam in err.eigenvalues:
            assert np.abs(wt - lam).min() < 1e-8


def test_eigsh_validation_errors():
    A = _sym(20)
    with pytest.raises(ValueError):
        st.eigsh(A, k=0)
    with pytest.raises(ValueError):
        st.eigsh(A, k=3, which="XX")
    with pytest.raises(ValueError):
        st.eigsh(A, k=3, M=np.eye(20), mode="buckling")  # needs sigma


def test_eigs_general_matches_scipy():
    rng = np.random.default_rng(11)
    A = rng.uniform(-0.5, 0.5, size=(80, 80))
    w, v = st.eigs(A, k=4, which="LM")
    wt = np.linalg.eigvals(A)
    expect = wt[np.argsort(-np.abs(wt))[:4]]
    np.testing.assert_allclose(
        np.sort_complex(w), np.sort_complex(expect), atol=1e-8
    )
    assert np.abs(A @ v - v * w[None, :]).max() < 1e-8


def test_eigs_real_shift():
    rng = np.random.default_rng(13)
    A = rng.uniform(-0.5, 0.5, size=(60, 60))
    sigma = 0.1
    w = st.eigs(A, k=3, sigma=sigma, return_eigenvectors=False)
    wt = np.linalg.eigvals(A)
    expect = wt[np.argsort(np.abs(wt - sigma))[:3]]
    # a conjugate pair is equidistant from a real sigma: compare
    # modulo conjugation
    for lam in w:
        assert (
            np.minimum(np.abs(expect - lam), np.abs(expect - np.conj(lam))).min()
            < 1e-8
        )


def test_eigs_complex_shift():
    rng = np.random.default_rng(17)
    A = rng.uniform(-0.5, 0.5, size=(60, 60))
    sigma = 0.1 + 0.2j
    w = st.eigs(A, k=3, sigma=sigma, return_eigenvectors=False)
    wt = np.linalg.eigvals(A)
    # complex-shift transform magnifies eigenvalues near sigma AND
    # conj(sigma) (real-matrix spectrum is conjugate-symmetric)
    d = np.minimum(np.abs(wt - sigma), np.abs(wt - np.conj(sigma)))
    expect = wt[np.argsort(d)[:3]]
    # members of a conjugate pair are interchangeable here (the op
    # magnifies lambda near sigma and conj(sigma) alike): each returned
    # value must match an expected one up to conjugation
    for lam in w:
        assert (
            np.minimum(np.abs(expect - lam), np.abs(expect - np.conj(lam))).min()
            < 1e-7
        )


def test_svds_matches_numpy():
    rng = np.random.default_rng(19)
    A = rng.normal(size=(60, 40))
    u, s, vh = st.svds(A, k=4)
    st_true = np.linalg.svd(A, compute_uv=False)
    assert np.all(np.diff(s) >= 0)  # scipy's ascending order
    np.testing.assert_allclose(s, np.sort(st_true[:4]), atol=1e-9)
    np.testing.assert_allclose(
        A @ vh.conj().T, u * s[None, :], atol=1e-8
    )
    s_only = st.svds(sps.csr_matrix(A), k=4, return_singular_vectors=False)
    np.testing.assert_allclose(s_only, s, atol=1e-9)


def test_svds_operator_passthrough():
    # MatProd-protocol operators flow through svds (module docstring
    # advertises it); ones without the adjoint raise a clear TypeError
    # instead of an obscure downstream failure (advisor round-3 low).
    rng = np.random.default_rng(23)
    A = rng.normal(size=(50, 30))
    op = st.DenseGenMatProd.create(A)
    u, s, vh = st.svds(op, k=3)
    st_true = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(s, np.sort(st_true[:3]), atol=1e-9)
    np.testing.assert_allclose(A @ vh.conj().T, u * s[None, :], atol=1e-8)

    class NoAdjoint:
        def rows(self):
            return 50

        def cols(self):
            return 30

        def perform_op(self, x):
            return x

    with pytest.raises(TypeError, match="perform_adjoint_op"):
        st.svds(NoAdjoint(), k=3)
