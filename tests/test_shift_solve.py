"""Shift-solve operators + SymEigsShiftSolver integration.

Mirrors the reference's shift-mode solver tests: eigenvalues closest
to sigma with residual ``||A U - U Lambda||_inf <= 1e-9``
(reference: test/SymEigsShift.cpp).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st


def _rand_sym(n, seed=123):
    rng = np.random.RandomState(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _rand_sparse_sym(n, density=0.1, seed=123):
    rng = np.random.RandomState(seed)
    A = sps.random(n, n, density=density, random_state=rng, format="csr")
    return (A + A.T).tocsr()


class TestShiftSolveOps:
    def test_dense_sym_shift_solve(self):
        A = _rand_sym(50)
        op = st.DenseSymShiftSolve.create(A).set_shift(0.7)
        x = np.random.default_rng(1).normal(size=50)
        y = np.asarray(op.perform_op(x))
        np.testing.assert_allclose((A - 0.7 * np.eye(50)) @ y, x, atol=1e-10)

    def test_dense_sym_shift_solve_uplo(self):
        A = _rand_sym(30)
        for uplo in ("L", "U"):
            op = st.DenseSymShiftSolve.create(A, uplo=uplo).set_shift(-0.3)
            x = np.ones(30)
            y = np.asarray(op.perform_op(x))
            np.testing.assert_allclose((A + 0.3 * np.eye(30)) @ y, x, atol=1e-10)

    def test_dense_gen_real_shift_solve(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(40, 40))
        op = st.DenseGenRealShiftSolve.create(A).set_shift(1.1)
        x = rng.normal(size=40)
        y = np.asarray(op.perform_op(x))
        np.testing.assert_allclose((A - 1.1 * np.eye(40)) @ y, x, atol=1e-10)

    def test_dense_gen_complex_shift_solve(self):
        rng = np.random.default_rng(3)
        A = rng.normal(size=(30, 30))
        op = st.DenseGenComplexShiftSolve.create(A).set_shift(0.5, 0.8)
        x = rng.normal(size=30)
        y = np.asarray(op.perform_op(x))
        want = np.real(
            np.linalg.solve(A - (0.5 + 0.8j) * np.eye(30), x.astype(complex))
        )
        np.testing.assert_allclose(y, want, atol=1e-10)

    def test_sparse_sym_shift_solve_splu(self):
        A = _rand_sparse_sym(80)
        op = st.SparseSymShiftSolve.create(A).set_shift(0.2)
        x = np.random.default_rng(4).normal(size=80)
        y = np.asarray(op.perform_op(x))
        np.testing.assert_allclose(
            (A - 0.2 * sps.eye(80)) @ y, x, atol=1e-9
        )

    def test_sparse_gen_complex_shift_solve(self):
        rng = np.random.RandomState(5)
        A = sps.random(40, 40, density=0.2, random_state=rng, format="csr")
        op = st.SparseGenComplexShiftSolve.create(A).set_shift(0.3, 0.4)
        x = np.random.default_rng(6).normal(size=40)
        y = np.asarray(op.perform_op(x))
        want = np.real(
            np.linalg.solve(
                A.toarray() - (0.3 + 0.4j) * np.eye(40), x.astype(complex)
            )
        )
        np.testing.assert_allclose(y, want, atol=1e-9)

    def test_singular_shift_raises(self):
        A = np.diag([1.0, 2.0, 3.0])
        with pytest.raises(Exception):
            st.DenseSymShiftSolve.create(A).set_shift(2.0)


class TestSymEigsShiftSolver:
    @pytest.mark.parametrize("sigma", [0.0, 1.0])
    def test_dense(self, sigma):
        n, k, m = 100, 6, 20
        A = _rand_sym(n)
        op = st.DenseSymShiftSolve.create(A)
        eigs = st.SymEigsShiftSolver(op, nev=k, ncv=m, sigma=sigma)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == k
        vals = eigs.eigenvalues()
        vecs = eigs.eigenvectors()
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-9
        # the k closest eigenvalues to sigma
        w = np.linalg.eigvalsh(A)
        closest = w[np.argsort(np.abs(w - sigma))[:k]]
        np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-9)

    @pytest.mark.parametrize("method", ["splu", "cg"])
    def test_sparse(self, method):
        n, k, m = 120, 5, 20
        A = _rand_sparse_sym(n)
        op = st.SparseSymShiftSolve.create(A, method=method)
        eigs = st.SymEigsShiftSolver(op, nev=k, ncv=m, sigma=0.0)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        vals = eigs.eigenvalues()
        vecs = eigs.eigenvectors()
        resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
        assert resid < 1e-8
        w = np.linalg.eigvalsh(A.toarray())
        closest = w[np.argsort(np.abs(w))[:k]]
        np.testing.assert_allclose(np.sort(vals), np.sort(closest), atol=1e-8)

    def test_sparse_banded_iterative_uses_dia(self):
        """Banded matrices route the iterative inner solve through the
        gather-free DIA matvec (at n~1e6 this is the difference between
        a practical and an impractical shift-invert, see bench.py) and
        still converge to the reference accuracy."""
        import scipy.sparse as sps

        from spectra_tpu.sparse.formats import DiaMatrix

        g = 16  # n = 256, 2-D Laplacian: 5-diagonal stencil
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
        op = st.SparseSymShiftSolve.create(A, method="minres")
        assert isinstance(op.set_shift(0.0).shifted, DiaMatrix)
        eigs = st.SymEigsShiftSolver(op, nev=4, ncv=16, sigma=0.0)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
        assert nconv == 4 and eigs.info() == st.CompInfo.Successful
        vals = np.sort(eigs.eigenvalues())
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        lam = np.sort((mu[:, None] + mu[None, :]).ravel())[:4]
        np.testing.assert_allclose(vals, lam, atol=1e-9)

    def test_sorting_of_back_transformed(self):
        """Returned eigenvalues follow `sorting` on lambda, not nu."""
        n = 60
        A = _rand_sym(n, seed=7)
        op = st.DenseSymShiftSolve.create(A)
        eigs = st.SymEigsShiftSolver(op, nev=4, ncv=16, sigma=0.5)
        eigs.init()
        eigs.compute(st.SortRule.LargestMagn, sorting=st.SortRule.SmallestAlge)
        vals = eigs.eigenvalues()
        assert np.all(np.diff(vals) >= 0)


class TestChebyshevInnerSolve:
    """The reduction-free Chebyshev semi-iteration (linalg/cheb_solve.py)
    — the inner solver for SPD shift-invert at scale, where MINRES's
    per-iteration reductions dominate wall time on latency-bound
    runtimes."""

    def test_direct_solve_spd(self):
        from spectra_tpu.linalg.cheb_solve import chebyshev_solve

        g = 24
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        mv = lambda x: jnp.asarray(A @ np.asarray(x))  # noqa: E731

        import jax

        with jax.disable_jit():  # host matvec closure; numerics only
            x, relres = chebyshev_solve(
                mv, b, 1e-3, 8.0, rtol=1e-11, maxiter=40000
            )
        true = np.linalg.norm(np.asarray(b) - A @ np.asarray(x))
        assert float(relres) <= 1e-11
        assert true / np.linalg.norm(np.asarray(b)) < 1e-9

    def test_alpha_adapts_on_stall(self):
        """A 100x-overestimated alpha must self-correct (the short-
        Lanczos interval estimate is this loose on clustered-bottom
        spectra) instead of stalling above tolerance."""
        from spectra_tpu.linalg.cheb_solve import chebyshev_solve

        g = 40
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
        lam_min = 2 * 4 * np.sin(np.pi / (2 * (g + 1))) ** 2
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        b = jnp.asarray(rng.standard_normal(A.shape[0]))
        mv = lambda x: jnp.asarray(A @ np.asarray(x))  # noqa: E731
        with jax.disable_jit():
            x, relres = chebyshev_solve(
                mv, b, 100.0 * lam_min, 8.0, rtol=1e-10, maxiter=60000
            )
        assert float(relres) <= 1e-10

    def test_interval_estimator_rejects_indefinite(self):
        from spectra_tpu.linalg.cheb_solve import estimate_spd_interval

        A = _rand_sparse_sym(200)  # indefinite (random symmetric)
        with pytest.raises(ValueError, match="not positive definite"):
            estimate_spd_interval(A)

    def test_cheb_method_end_to_end(self):
        """method='cheb' through SymEigsShiftSolver matches the
        analytic spectrum (anisotropic grid: simple eigenvalues)."""
        g = 30
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (
            sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))
        ).tocsr()
        from spectra_tpu.util.rng import SimpleRandom

        v0 = SimpleRandom(0).random_vec(A.shape[0])
        op = st.SparseSymShiftSolve.create(A, method="cheb").set_shift(0.0)
        assert op.cheb_interval[0] > 0
        eigs = st.SymEigsShiftSolver.from_factored(op, 4, 12, 0.0)
        eigs.init(v0)
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=100, tol=1e-8)
        assert nconv == 4 and eigs.info() == st.CompInfo.Successful
        vals = np.sort(np.asarray(eigs.eigenvalues()))
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        lam = np.sort((mu[:, None] + 1.37 * mu[None, :]).ravel())[:4]
        np.testing.assert_allclose(vals, lam, rtol=1e-7)

    def test_cheb_interval_translates_across_shifts(self):
        """A sigma sweep reuses the learned Chebyshev interval by exact
        translation: eig(A - s'I) = eig(A - sI) - (s' - s), so the
        second set_shift must carry [alpha - d, beta - d] verbatim
        (bitwise, since no re-learning solve runs) and still produce a
        correct inverse operator."""
        g = 30
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (
            sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))
        ).tocsr()
        w = st.SparseSymShiftSolve.create(A, method="cheb")
        op1 = w.set_shift(0.0)
        a1, b1 = op1.cheb_interval
        assert a1 > 0
        # second shift, still well below lambda_min (~2.37 mu_1): the
        # translated interval stays SPD-safe and is reused verbatim.
        sigma2 = -0.5
        op2 = w.set_shift(sigma2)
        a2, b2 = op2.cheb_interval
        assert a2 == a1 + 0.5 and b2 == b1 + 0.5
        import jax.numpy as jnp
        import scipy.sparse.linalg as spla

        rng = np.random.default_rng(3)
        x = rng.standard_normal(A.shape[0])
        y = np.asarray(op2.with_inner_rtol(1e-12).perform_op(jnp.asarray(x)))
        y_ref = spla.spsolve(
            (A - sigma2 * sps.eye(A.shape[0])).tocsc(), x
        )
        np.testing.assert_allclose(y, y_ref, rtol=1e-8, atol=1e-10)

    def test_cheb_interval_relearns_when_translation_unsafe(self):
        """When the translated lower bound would be <= 0 (shift moved
        at/above the learned alpha), set_shift falls back to the
        auto-learning path instead of running Chebyshev on a possibly
        indefinite interval."""
        g = 30
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (
            sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))
        ).tocsr()
        w = st.SparseSymShiftSolve.create(A, method="cheb")
        op1 = w.set_shift(-2.0)
        a1, _ = op1.cheb_interval
        # sigma2 chosen so a1 - (sigma2 - sigma1) <= 0 but the matrix
        # is still SPD (sigma2 < lambda_min): must re-learn, not reuse.
        sigma2 = -2.0 + a1
        op2 = w.set_shift(sigma2)
        a2, _ = op2.cheb_interval
        assert a2 > 0
        assert a2 != pytest.approx(a1 - (sigma2 - (-2.0)), abs=0.0)

    def test_recompute_tighter_tol_recouples_inner_rtol(self):
        """A second compute() with a tighter tol must tighten the inner
        solve too: the coupled inner_rtol is re-derived per compute(),
        not pinned by the first call (a stale loose coupling converges
        tightly on a perturbed operator and silently reports Successful
        with wrong eigenvalues)."""
        import scipy.sparse as sps

        g = 12
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (
            sps.kron(sps.eye(g), lap1) + 1.37 * sps.kron(lap1, sps.eye(g))
        ).tocsr()
        n = A.shape[0]
        from spectra_tpu.util.rng import SimpleRandom

        v0 = SimpleRandom(0).random_vec(n)
        op = st.SparseSymShiftSolve.create(A, method="minres")
        eigs = st.SymEigsShiftSolver(op, nev=4, ncv=16, sigma=0.0)
        eigs.init(v0)
        eigs.compute(st.SortRule.LargestMagn, tol=1e-2)  # loose first
        eigs.init(v0)
        nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
        assert nconv == 4
        vals = np.sort(eigs.eigenvalues())
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        lam = np.sort((mu[:, None] + 1.37 * mu[None, :]).ravel())[:4]
        np.testing.assert_allclose(vals, lam, atol=1e-9)

    def test_user_inner_rtol_survives_coupling(self):
        """An explicitly user-set inner_rtol is never overridden by the
        per-compute coupling."""
        import scipy.sparse as sps

        g = 8
        lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
        from spectra_tpu.matop.shift_solve import couple_inner_tolerance

        op = st.SparseSymShiftSolve.create(
            A, method="minres", inner_rtol=3e-7
        ).set_shift(0.0)
        assert op.inner_rtol_user
        coupled = couple_inner_tolerance(op, 1e-10)
        assert coupled.inner_rtol == 3e-7
