"""Geometric multigrid inner solver (linalg/multigrid.py).

The reference has no multigrid — its sparse shift-solve is a serial
SuperLU factorization (SparseSymShiftSolve.h:85-102). These tests pin
(a) the grid inference, (b) exact agreement of the device strided
transfers with the host Galerkin ``P``/``P^T``, (c) V-cycle
convergence on constant- and variable-coefficient stencils in 1/2/3-D,
and (d) the shift-solve routing: explicit ``method="mg"``, the silent
MINRES upgrade, and the fallbacks on non-grid or indefinite problems.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

import spectra_tpu as st
from spectra_tpu.linalg.multigrid import (
    MGBuildError,
    build_mg,
    coarse_dims,
    infer_grid_dims,
    mg_solve,
    prolong_matrix,
    prolong_nd,
    restrict_nd,
)
from spectra_tpu.util.rng import SimpleRandom


def lap1d(g):
    return sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g)).tocsr()


def lap2d(gy, gx=None):
    gx = gy if gx is None else gx
    return (
        sps.kron(sps.eye(gy), lap1d(gx)) + sps.kron(lap1d(gy), sps.eye(gx))
    ).tocsr()


def lap3d(g):
    e = sps.eye(g)
    return (
        sps.kron(sps.kron(lap1d(g), e), e)
        + sps.kron(sps.kron(e, lap1d(g)), e)
        + sps.kron(sps.kron(e, e), lap1d(g))
    ).tocsr()


def weighted_lap2d(gy, gx, seed=0):
    """Variable-coefficient 5-point operator: graph Laplacian of the
    grid with random positive edge weights + small diagonal mass."""
    rng = np.random.default_rng(seed)
    n = gy * gx
    rows, cols, vals = [], [], []

    def add_edge(i, j, w):
        rows.extend([i, j, i, j])
        cols.extend([j, i, i, j])
        vals.extend([-w, -w, w, w])

    for iy in range(gy):
        for ix in range(gx):
            i = iy * gx + ix
            if ix + 1 < gx:
                add_edge(i, i + 1, rng.uniform(0.5, 2.0))
            if iy + 1 < gy:
                add_edge(i, i + gx, rng.uniform(0.5, 2.0))
    A = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
    return (A + 0.1 * sps.eye(n)).tocsr()


class TestInference:
    def test_2d(self):
        A = lap2d(40)
        coo = A.tocoo()
        offs = np.unique(coo.col - coo.row)
        assert infer_grid_dims(offs, A.shape[0]) == (40, 40)

    def test_2d_rect(self):
        A = lap2d(24, 37)
        coo = A.tocoo()
        offs = np.unique(coo.col - coo.row)
        assert infer_grid_dims(offs, A.shape[0]) == (24, 37)

    def test_3d(self):
        A = lap3d(9)
        coo = A.tocoo()
        offs = np.unique(coo.col - coo.row)
        assert infer_grid_dims(offs, A.shape[0]) == (9, 9, 9)

    def test_1d_band(self):
        assert infer_grid_dims([-1, 0, 1], 100) == (100,)

    def test_nine_point(self):
        g = 20
        offs = [
            dy * g + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        ]
        assert infer_grid_dims(sorted(offs), g * g) == (g, g)

    def test_non_grid(self):
        # arrow-matrix offsets: no small-radius decomposition exists
        assert infer_grid_dims([-97, -5, 0, 5, 97], 100) is None


class TestTransfers:
    @pytest.mark.parametrize("boundary", ["clip", "const"])
    @pytest.mark.parametrize(
        "dims", [(9,), (16,), (13, 16), (12, 12), (7, 9, 11)]
    )
    def test_match_host_operators(self, dims, boundary):
        rng = np.random.default_rng(3)
        dc = coarse_dims(dims)
        P = prolong_matrix(dims, boundary)
        e = rng.normal(size=P.shape[1])
        got = np.asarray(prolong_nd(jnp.asarray(e), dc, dims, boundary))
        np.testing.assert_allclose(got, P @ e, atol=1e-14)
        r = rng.normal(size=P.shape[0])
        got = np.asarray(restrict_nd(jnp.asarray(r), dims, dc, boundary))
        np.testing.assert_allclose(got, P.T @ r, atol=1e-14)

    def test_const_boundary_preserves_constants(self):
        dims = (12, 16)
        dc = coarse_dims(dims)
        ones = jnp.ones(int(np.prod(dc)))
        got = np.asarray(prolong_nd(ones, dc, dims, "const"))
        np.testing.assert_allclose(got, 1.0, atol=1e-15)


class TestVcycleSolve:
    @pytest.mark.parametrize(
        "A,dims,max_cycles",
        [
            (lap1d(200), None, 30),
            (lap2d(48), None, 30),
            (lap2d(24, 37), None, 30),
            (lap3d(17), None, 30),
            # iid random edge weights in [0.5, 2]: linear interpolation
            # keeps enough approximation for ~15 cycles once the
            # boundary weights are right (truly degenerate coefficient
            # jumps would need AMG-style operator interpolation)
            (weighted_lap2d(40, 40), None, 40),
        ],
        ids=["1d", "2d", "2d-rect", "3d", "2d-roughcoef"],
    )
    def test_converges(self, A, dims, max_cycles):
        mg = build_mg(A, dims=dims, max_coarse_n=128)
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.normal(size=A.shape[0]))
        x, k = mg_solve(mg, b, rtol=1e-12)
        relres = float(
            jnp.linalg.norm(mg.ops[0].matvec(x) - b) / jnp.linalg.norm(b)
        )
        assert relres <= 1e-11
        assert int(k) <= max_cycles

    def test_smooth_varcoef_fast(self):
        """Smoothly varying coefficients keep the O(1)-cycle bound."""
        gy = gx = 40
        n = gy * gx
        rows, cols, vals = [], [], []

        def w_at(iy, ix):
            return 1.0 + 0.9 * np.sin(2 * np.pi * iy / gy) * np.cos(
                2 * np.pi * ix / gx
            )

        def add_edge(i, j, w):
            rows.extend([i, j, i, j])
            cols.extend([j, i, i, j])
            vals.extend([-w, -w, w, w])

        for iy in range(gy):
            for ix in range(gx):
                i = iy * gx + ix
                if ix + 1 < gx:
                    add_edge(i, i + 1, w_at(iy, ix + 0.5))
                if iy + 1 < gy:
                    add_edge(i, i + gx, w_at(iy + 0.5, ix))
        A = (
            sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
            + 0.05 * sps.eye(n)
        ).tocsr()
        mg = build_mg(A, max_coarse_n=128)
        b = jnp.asarray(np.random.default_rng(1).normal(size=n))
        x, k = mg_solve(mg, b, rtol=1e-12)
        relres = float(
            jnp.linalg.norm(mg.ops[0].matvec(x) - b) / jnp.linalg.norm(b)
        )
        assert relres <= 1e-11
        assert int(k) <= 30

    def test_galerkin_consistency(self):
        """Level-1 operator equals the host P^T A P exactly."""
        A = weighted_lap2d(16, 16, seed=4)
        mg = build_mg(A, max_coarse_n=8)
        P = prolong_matrix((16, 16), mg.boundary)
        Ac = (P.T @ A @ P).todense()
        got = np.asarray(mg.ops[1].to_dense())
        np.testing.assert_allclose(got, np.asarray(Ac), atol=1e-13)

    def test_neumann_constant_mode(self):
        """Graph Laplacian + small mass (zero row sums): the auto
        boundary heuristic must pick the constant-preserving P, and the
        near-null constant mode must not spoil the O(1)-cycle bound."""
        A = weighted_lap2d(48, 48, seed=9)  # includes +0.1 I mass
        mg = build_mg(A, max_coarse_n=128)
        assert mg.boundary == "const"
        b = jnp.asarray(np.random.default_rng(2).normal(size=A.shape[0]))
        x, k = mg_solve(mg, b, rtol=1e-12)
        relres = float(
            jnp.linalg.norm(mg.ops[0].matvec(x) - b) / jnp.linalg.norm(b)
        )
        assert relres <= 1e-11
        assert int(k) <= 40

    def test_non_grid_raises(self):
        rng = np.random.default_rng(2)
        R = sps.random(200, 200, density=0.03, random_state=2)
        S = (R + R.T + 10 * sps.eye(200)).tocsr()
        with pytest.raises(MGBuildError):
            build_mg(S)


class TestShiftSolveRouting:
    def test_explicit_mg_shift_invert(self):
        g = 32
        A = lap2d(g)
        op = st.SparseSymShiftSolve.create(A, method="mg").set_shift(0.0)
        assert op.method == "mg" and op.mg is not None
        eigs = st.SymEigsShiftSolver.from_factored(op, 6, 20, 0.0)
        eigs.init(SimpleRandom(0).random_vec(g * g))
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=50, tol=1e-10)
        assert nconv == 6
        vals = np.sort(np.asarray(eigs.eigenvalues()))
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        lam = np.sort((mu[:, None] + mu[None, :]).ravel())[:6]
        assert np.abs(vals - lam).max() < 1e-9

    def test_minres_auto_upgrades_on_grid(self):
        A = lap2d(24)
        op = st.SparseSymShiftSolve.create(A, method="minres").set_shift(0.0)
        assert op.method == "mg"

    def test_mg_falls_back_on_non_grid(self):
        rng = np.random.default_rng(5)
        R = sps.random(150, 150, density=0.03, random_state=5)
        S = (R + R.T + 10 * sps.eye(150)).tocsr()
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            op = st.SparseSymShiftSolve.create(S, method="mg").set_shift(0.0)
        assert op.method == "minres"
        assert any("mg" in str(x.message) for x in w)

    def test_mildly_indefinite_shift_still_correct(self):
        """sigma just above the 4th eigenvalue: the coarse grid still
        resolves the few crossed modes, so the trial may legitimately
        accept the hierarchy (MG handles mildly indefinite systems) —
        what matters is that whichever method survives validation
        produces correct eigenpairs. (Reference values are the ANALYTIC
        2-D Laplacian spectrum — scipy eigsh(which="SM") with its
        random start is itself flaky at these clustered smallest
        eigenvalues.)"""
        g = 24
        A = lap2d(g)
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        w = np.sort((mu[:, None] + mu[None, :]).ravel())[:8]
        sigma = float((w[3] + w[4]) / 2)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            op = st.SparseSymShiftSolve.create(A, method="mg").set_shift(
                sigma
            )
        assert op.method in ("mg", "minres")
        eigs = st.SymEigsShiftSolver.from_factored(op, 4, 16, sigma)
        eigs.init(SimpleRandom(0).random_vec(g * g))
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=100, tol=1e-9)
        assert nconv == 4
        vals = np.sort(np.asarray(eigs.eigenvalues()))
        ref = np.sort(w[np.argsort(np.abs(w - sigma))[:4]])
        np.testing.assert_allclose(vals, ref, atol=1e-8)

    def test_mg_falls_back_on_deep_indefinite_shift(self):
        """sigma mid-spectrum: hundreds of crossed modes the coarse
        grids cannot represent — the V-cycle trial must reject the
        hierarchy and fall back to MINRES."""
        A = lap2d(32)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            op = st.SparseSymShiftSolve.create(A, method="mg").set_shift(
                4.0
            )
        assert op.method == "minres"

    def test_generalized_mg(self):
        """SymShiftInvert(A, B) with grid A and grid mass B routes
        through mg and matches scipy's generalized eigsh."""
        import scipy.sparse.linalg as spla

        g = 24
        n = g * g
        A = lap2d(g)
        # 2-D FEM-style mass matrix: tensor of tridiag(1/6, 4/6, 1/6)
        m1 = sps.diags(
            [1 / 6, 4 / 6, 1 / 6], [-1, 0, 1], shape=(g, g)
        )
        B = sps.kron(m1, m1).tocsr()
        op = st.SymShiftInvert.create(A, B, method="mg")
        bop = st.SparseSymMatProd.from_full(B)
        eigs = st.SymGEigsShiftSolver(
            op, bop, nev=4, ncv=16, sigma=0.0, mode=st.GEigsMode.ShiftInvert
        )
        eigs.init(SimpleRandom(0).random_vec(n))
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=60, tol=1e-9)
        assert nconv == 4
        vals = np.sort(np.asarray(eigs.eigenvalues()))
        ref = np.sort(spla.eigsh(A, k=4, M=B, sigma=0.0, which="LM")[0])
        np.testing.assert_allclose(vals, ref, rtol=1e-7)
