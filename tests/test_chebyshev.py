"""Chebyshev-filtered solver tests: the clustered-spectrum regime
where direct Lanczos (and ARPACK) stall. Truth is analytic (2D grid
Laplacian eigenvalues 4 sin^2 + 4 sin^2)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.matop.chebyshev import ChebyshevFilteredOp, estimate_spectrum_bounds
from spectra_tpu.solvers.cheb_sym_eigs import ChebSymEigsSolver


def _laplacian(g):
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()


def _analytic(g):
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    return np.sort((mu[:, None] + mu[None, :]).ravel())


class TestChebyshevOp:
    def test_filter_is_polynomial_of_A(self):
        """p(A) x computed by recurrence equals the explicit Chebyshev
        polynomial applied to A's eigendecomposition."""
        rng = np.random.default_rng(0)
        n = 60
        M = rng.normal(size=(n, n))
        A = M + M.T
        op = st.DenseSymMatProd.create(A)
        lo, hi = -2.0, 2.0
        deg = 9
        fop = ChebyshevFilteredOp.create(op, lo, hi, deg)
        x = rng.normal(size=n)
        y = np.asarray(fop.perform_op(x))
        w, V = np.linalg.eigh(A)
        Lw = (2 * w - (hi + lo)) / (hi - lo)
        # T_d via the cos/cosh closed forms
        pw = np.where(
            np.abs(Lw) <= 1,
            np.cos(deg * np.arccos(np.clip(Lw, -1, 1))),
            np.sign(Lw) ** deg * np.cosh(deg * np.arccosh(np.abs(Lw))),
        )
        want = V @ (pw * (V.T @ x))
        np.testing.assert_allclose(y, want, rtol=1e-9, atol=1e-9)

    def test_bounds_estimate_encloses(self):
        g = 20
        A = _laplacian(g)
        op = st.SparseSymMatProd.from_full(A)
        lo, hi = estimate_spectrum_bounds(op)
        lam = _analytic(g)
        assert lo <= lam[0] and hi >= lam[-1]


class TestChebSolver:
    def test_largest_clustered(self):
        g = 60
        A = _laplacian(g)
        op = st.SparseSymMatProd.from_full(A)
        lam = _analytic(g)
        k = 8
        e = ChebSymEigsSolver(op, nev=k, ncv=24, which="largest", degree=40,
                              cut_fraction=0.02)
        e.init()
        nconv = e.compute()
        assert e.info() == st.CompInfo.Successful
        assert nconv == k
        vals = e.eigenvalues()
        vecs = np.asarray(e.eigenvectors())
        np.testing.assert_allclose(np.sort(vals), lam[-k:], atol=1e-10)
        assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-9
        # dramatically fewer restarts than direct Lanczos
        assert e.num_iterations() < 20

    def test_smallest(self):
        g = 40
        A = _laplacian(g)
        op = st.SparseSymMatProd.from_full(A)
        lam = _analytic(g)
        k = 6
        e = ChebSymEigsSolver(op, nev=k, ncv=20, which="smallest", degree=40,
                              cut_fraction=0.02)
        e.init()
        e.compute(sorting=st.SortRule.SmallestAlge)
        assert e.info() == st.CompInfo.Successful
        np.testing.assert_allclose(np.sort(e.eigenvalues()), lam[:k], atol=1e-10)


@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 virtual devices"
)
def test_chebyshev_over_sharded_halo_op():
    """Full composition: Chebyshev filter x halo-exchange sharded
    stencil operator x 8-device mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectra_tpu.parallel import row_mesh, ShardedStencilMatProd
    from spectra_tpu.sparse import dia_from_scipy
    from spectra_tpu.util.rng import SimpleRandom

    g = 40
    A = _laplacian(g)
    lam = _analytic(g)
    mesh = row_mesh(8)
    op = ShardedStencilMatProd.create(dia_from_scipy(A), mesh)
    v0 = jax.device_put(
        jax.numpy.asarray(SimpleRandom(0).random_vec(g * g)),
        NamedSharding(mesh, P("rows")),
    )
    e = ChebSymEigsSolver(op, nev=6, ncv=24, which="largest", degree=40,
                          cut_fraction=0.02)
    e.init(v0)
    nconv = e.compute()
    assert e.info() == st.CompInfo.Successful
    assert nconv == 6
    np.testing.assert_allclose(np.sort(e.eigenvalues()), lam[-6:], atol=1e-10)
