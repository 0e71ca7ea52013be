"""General (non-symmetric) solver tests (reference: test/GenEigs.cpp,
GenEigsComplex tests; sizes 10/100/1000 with (k,m) grids)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _rand_mat(n, seed=123, complex_=False):
    rng = np.random.RandomState(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    if complex_:
        A = A + 1j * (rng.uniform(size=(n, n)) - 0.5)
    return A


def _check_residual(A, vals, vecs, bar=1e-9):
    if sps.issparse(A):
        A = A.toarray()
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    assert resid < bar, f"residual {resid}"


def _select(w, rule, k):
    if rule == st.SortRule.LargestMagn:
        return w[np.argsort(-np.abs(w), kind="stable")[:k]]
    if rule == st.SortRule.LargestReal:
        return w[np.argsort(-w.real, kind="stable")[:k]]
    if rule == st.SortRule.SmallestMagn:
        return w[np.argsort(np.abs(w), kind="stable")[:k]]
    raise ValueError(rule)


class TestGenEigsReal:
    @pytest.mark.parametrize("n,k,m", [(10, 3, 6), (100, 10, 30)])
    @pytest.mark.parametrize(
        "selection", [st.SortRule.LargestMagn, st.SortRule.LargestReal]
    )
    def test_dense(self, n, k, m, selection):
        A = _rand_mat(n)
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=k, ncv=m)
        eigs.init()
        nconv = eigs.compute(selection)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        assert vals.dtype.kind == "c"
        _check_residual(A, vals, vecs)
        # Every returned value is a true eigenvalue (the reference's own
        # tests also only assert the residual: with a conjugate pair at
        # the selection boundary, IRAM legitimately keeps the pair).
        w = np.linalg.eigvals(A)
        for v in vals:
            assert np.min(np.abs(w - v)) < 1e-8
        if selection == st.SortRule.LargestMagn:
            want = _select(w, selection, k)
            np.testing.assert_allclose(
                np.sort_complex(np.round(vals, 9)),
                np.sort_complex(np.round(want, 9)),
                atol=1e-8,
            )

    def test_sparse(self):
        n, k, m = 120, 6, 24
        rng = np.random.RandomState(11)
        A = sps.random(n, n, density=0.1, random_state=rng, format="csr")
        op = st.SparseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=k, ncv=m)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        _check_residual(A, vals, vecs)

    def test_matches_true_top_magnitude(self):
        A = _rand_mat(60, seed=3)
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=6, ncv=20)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        vals = eigs.eigenvalues()
        w = np.linalg.eigvals(A)
        want = w[np.argsort(-np.abs(w), kind="stable")[:6]]
        np.testing.assert_allclose(
            np.sort_complex(np.round(vals, 9)),
            np.sort_complex(np.round(want, 9)),
            atol=1e-8,
        )


class TestGenEigsComplex:
    @pytest.mark.parametrize("n,k,m", [(10, 3, 6), (80, 6, 20)])
    def test_dense_complex(self, n, k, m):
        A = _rand_mat(n, seed=5, complex_=True)
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=k, ncv=m)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        _check_residual(A, vals, vecs)
        w = np.linalg.eigvals(A)
        want = _select(w, st.SortRule.LargestMagn, k)
        np.testing.assert_allclose(
            np.sort_complex(np.round(vals, 9)),
            np.sort_complex(np.round(want, 9)),
            atol=1e-8,
        )


class TestBounds:
    def test_nev_bounds(self):
        A = _rand_mat(10)
        op = st.DenseGenMatProd.create(A)
        with pytest.raises(ValueError):
            st.GenEigsSolver(op, nev=9, ncv=10)
        with pytest.raises(ValueError):
            st.GenEigsSolver(op, nev=3, ncv=4)


def test_gen_matvec_granularity_matches_host_driver(monkeypatch):
    """Gen-side stepped execution (one operator application per device
    execution) replays the host-driven IRAM's decisions exactly."""
    A = _rand_mat(200)
    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(200)
    monkeypatch.setenv("SPECTRA_TPU_GEN_DRIVER", "host")
    monkeypatch.setenv("SPECTRA_TPU_DENSE_DRIVER", "jax")

    ref = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=4, ncv=12)
    ref.init(v0)
    ref.compute(st.SortRule.LargestMagn)

    stepped = st.GenEigsSolver(st.DenseGenMatProd.create(A), nev=4, ncv=12)
    stepped.set_matvec_granularity(True)
    stepped.init(v0)
    nconv = stepped.compute(st.SortRule.LargestMagn)

    assert nconv == 4
    assert stepped.num_iterations() == ref.num_iterations()
    assert stepped.num_operations() == ref.num_operations()
    np.testing.assert_allclose(
        np.sort_complex(stepped.eigenvalues()),
        np.sort_complex(ref.eigenvalues()),
        rtol=0,
        atol=1e-10,
    )
