"""contrib tests: PartialSVDSolver (reference: test/SVD.cpp) and
LOBPCGSolver (reference: test/LOBPCG.cpp)."""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


class TestPartialSVD:
    @pytest.mark.parametrize("shape", [(100, 60), (60, 100), (80, 80)])
    def test_dense(self, shape):
        m, n = shape
        rng = np.random.default_rng(m * 1000 + n)
        A = rng.normal(size=(m, n))
        k = 5
        svds = st.PartialSVDSolver(A, ncomp=k, ncv=15)
        nconv = svds.compute()
        assert nconv == k
        s = svds.singular_values()
        U = svds.matrix_U(k)
        V = svds.matrix_V(k)
        true_s = np.linalg.svd(A, compute_uv=False)[:k]
        np.testing.assert_allclose(s, true_s, atol=1e-8)
        # A V = U S
        np.testing.assert_allclose(A @ V, U * s[None, :], atol=1e-7)
        # orthonormal factors
        np.testing.assert_allclose(U.T @ U, np.eye(k), atol=1e-7)
        np.testing.assert_allclose(V.T @ V, np.eye(k), atol=1e-7)

    def test_sparse(self):
        rng = np.random.RandomState(3)
        A = sps.random(150, 80, density=0.2, random_state=rng, format="csr")
        k = 4
        svds = st.PartialSVDSolver(A, ncomp=k, ncv=12)
        svds.compute()
        s = svds.singular_values()
        true_s = np.linalg.svd(A.toarray(), compute_uv=False)[:k]
        np.testing.assert_allclose(s, true_s, atol=1e-8)
        U, V = svds.matrix_U(k), svds.matrix_V(k)
        np.testing.assert_allclose(A @ V, U * s[None, :], atol=1e-7)


class TestLOBPCG:
    def _laplacian(self, g):
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()

    def test_smallest_standard(self):
        g = 10
        A = self._laplacian(g)
        n = g * g
        k = 4
        rng = np.random.default_rng(0)
        X0 = rng.normal(size=(n, k))
        solver = st.LOBPCGSolver(A, X0)
        nconv = solver.compute(maxit=200, tol_div_n=1e-10)
        assert solver.info() == st.CompInfo.Successful
        assert nconv == k
        vals = solver.eigenvalues()
        vecs = solver.eigenvectors()
        w = np.sort(np.linalg.eigvalsh(A.toarray()))[:k]
        np.testing.assert_allclose(np.sort(vals), w, atol=1e-6)
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-5

    def test_generalized_with_preconditioner(self):
        g = 8
        A = self._laplacian(g)
        n = g * g
        k = 3
        B = sps.diags(1.0 + 0.5 * np.sin(np.arange(n))).tocsr()
        T = sps.diags(1.0 / A.diagonal()).tocsr()  # Jacobi preconditioner
        rng = np.random.default_rng(1)
        X0 = rng.normal(size=(n, k))
        solver = st.LOBPCGSolver(A, X0)
        solver.set_B(B)
        solver.set_preconditioner(T)
        nconv = solver.compute(maxit=300, tol_div_n=1e-10)
        assert solver.info() == st.CompInfo.Successful
        vals = solver.eigenvalues()
        import scipy.linalg

        w = np.sort(scipy.linalg.eigh(A.toarray(), B.toarray(), eigvals_only=True))[:k]
        np.testing.assert_allclose(np.sort(vals), w, atol=1e-6)


def test_lobpcg_constraints_deflation():
    """setConstraints deflates known eigenvectors: the solver finds the
    next-smallest eigenpairs orthogonal to Y."""
    import scipy.sparse as sps

    g = 8
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    n = g * g
    w, V = np.linalg.eigh(A.toarray())

    rng = np.random.default_rng(3)
    solver = st.LOBPCGSolver(A, rng.normal(size=(n, 2)))
    solver.set_constraints(V[:, :2])  # deflate the two smallest
    nconv = solver.compute(maxit=300, tol_div_n=1e-10)
    assert solver.info() == st.CompInfo.Successful
    vals = np.sort(solver.eigenvalues())
    np.testing.assert_allclose(vals, w[2:4], atol=1e-6)


def test_lobpcg_soft_locking_saves_matvecs():
    """With soft locking (default), converged Ritz vectors stop costing
    matvecs; results match the unlocked run."""
    import scipy.sparse as sps
    import jax.numpy as jnp

    g = 10
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    n = g * g
    k = 6
    rng = np.random.default_rng(7)
    X0 = rng.normal(size=(n, k))
    w = np.sort(np.linalg.eigvalsh(A.toarray()))[:k]

    counts = {}
    results = {}
    for lock in (True, False):
        ncols = []

        def counting_A(X, _n=ncols):
            _n.append(X.shape[1])
            return jnp.asarray(A @ np.asarray(X))

        solver = st.LOBPCGSolver(counting_A, X0)
        nconv = solver.compute(maxit=300, tol_div_n=1e-10, soft_locking=lock)
        assert solver.info() == st.CompInfo.Successful
        assert nconv == k
        counts[lock] = sum(ncols)
        results[lock] = np.sort(solver.eigenvalues())
        np.testing.assert_allclose(results[lock], w, atol=1e-6)

    # Locking must not cost extra matvecs; on this clustered grid
    # problem it saves some (early-converged columns leave W).
    assert counts[True] <= counts[False]


def test_lobpcg_rank_deficient_guess_recovers():
    """A rank-deficient initial block (duplicated columns) must not
    abort with NumericalIssue: the rank-revealing recovery in
    _b_orthonormalize replaces null directions with guard vectors (the
    reference's contrib solver fails outright on a singular Gram)."""
    import numpy as np
    import scipy.sparse as sps

    from spectra_tpu.contrib.lobpcg import LOBPCGSolver
    from spectra_tpu.util.compinfo import CompInfo

    g = 12
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(3)
    X0 = rng.standard_normal((n, 4))
    X0[:, 1] = X0[:, 0]  # exactly dependent pair
    X0[:, 3] = 2.0 * X0[:, 2]

    s = LOBPCGSolver(A, X0)
    nconv = s.compute(maxit=200, tol_div_n=1e-10)
    assert s.info() == CompInfo.Successful
    assert nconv == 4
    w = np.sort(np.linalg.eigvalsh(A.toarray()))[:4]
    np.testing.assert_allclose(np.sort(s.eigenvalues()), w, atol=1e-6)
