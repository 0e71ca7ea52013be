"""Sharded-execution tests on the 8-virtual-device CPU mesh
(SURVEY.md section 4 build implication (c): multi-host behavior is
validated on a forced-host-device mesh)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax

import spectra_tpu as st
from spectra_tpu.parallel import row_mesh, shard_problem
from spectra_tpu.util.rng import SimpleRandom


requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


@requires_multidevice
class TestShardedSolve:
    def _run(self, op, v0):
        eigs = st.SymEigsSolver(op, nev=4, ncv=16)
        eigs.init(v0)
        eigs.compute(st.SortRule.LargestMagn)
        return np.asarray(eigs.eigenvalues()), np.asarray(eigs.eigenvectors())

    def test_sharded_ell_matches_unsharded(self):
        n = 16 * 8
        rng = np.random.RandomState(0)
        A = sps.random(n, n, density=0.1, random_state=rng, format="csr")
        A = A + A.T
        v0 = SimpleRandom(0).random_vec(n)

        op = st.SparseSymMatProd.from_full(A, format="ell")
        vals_ref, _ = self._run(op, v0)

        mesh = row_mesh(8)
        op_s, v0_s = shard_problem(op, v0, mesh)
        vals_s, vecs_s = self._run(op_s, v0_s)

        np.testing.assert_allclose(vals_s, vals_ref, atol=1e-10)
        resid = np.abs(A @ vecs_s - vecs_s * vals_s[None, :]).max()
        assert resid < 1e-9

    def test_sharded_dia_matches_unsharded(self):
        g = 16  # 256 rows over 8 devices
        A = _laplacian_2d(g)
        v0 = SimpleRandom(0).random_vec(g * g)

        op = st.SparseSymMatProd.from_full(A)  # auto -> DIA
        from spectra_tpu.sparse.formats import DiaMatrix

        assert isinstance(op.ell, DiaMatrix)
        vals_ref, _ = self._run(op, v0)

        mesh = row_mesh(8)
        op_s, v0_s = shard_problem(op, v0, mesh)
        vals_s, vecs_s = self._run(op_s, v0_s)

        np.testing.assert_allclose(vals_s, vals_ref, atol=1e-10)
        resid = np.abs(A @ vecs_s - vecs_s * vals_s[None, :]).max()
        assert resid < 1e-9

    def test_sharded_dense(self):
        n = 32 * 8
        rng = np.random.default_rng(5)
        A = rng.normal(size=(n, n))
        A = A + A.T
        v0 = SimpleRandom(0).random_vec(n)
        op = st.DenseSymMatProd.create(A)
        vals_ref, _ = self._run(op, v0)

        mesh = row_mesh(8)
        op_s, v0_s = shard_problem(op, v0, mesh)
        vals_s, _ = self._run(op_s, v0_s)
        np.testing.assert_allclose(vals_s, vals_ref, atol=1e-10)


@requires_multidevice
def test_spmv_sharded_correct():
    """Sharded DIA/ELL matvec equals the scipy product exactly."""
    g = 24
    A = _laplacian_2d(g)
    x = np.random.default_rng(1).normal(size=g * g)
    mesh = row_mesh(8)
    for fmt in ("dia", "ell"):
        op = st.SparseSymMatProd.from_full(A, format=fmt)
        op_s, x_s = shard_problem(op, x, mesh)
        y = np.asarray(jax.jit(op_s.perform_op)(x_s))
        np.testing.assert_allclose(y, A @ x, atol=1e-12)


@requires_multidevice
class TestHaloStencilSpMV:
    """Explicit halo-exchange stencil SpMV (parallel/stencil_spmv.py):
    O(halo) neighbor traffic instead of GSPMD's all-gather."""

    def test_matvec_exact(self):
        from spectra_tpu.sparse import dia_from_scipy
        from spectra_tpu.parallel.stencil_spmv import ShardedStencilMatProd
        from jax.sharding import NamedSharding, PartitionSpec as P

        g = 16
        A = _laplacian_2d(g)
        dia = dia_from_scipy(A)
        mesh = row_mesh(8)
        op = ShardedStencilMatProd.create(dia, mesh)
        x = np.random.default_rng(0).normal(size=g * g)
        xs = jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh, P("rows"))
        )
        y = np.asarray(jax.jit(op.perform_op)(xs))
        np.testing.assert_allclose(y, A @ x, atol=1e-13)
        # chained applications (the solver's usage pattern)
        y2 = np.asarray(jax.jit(lambda v: op.perform_op(op.perform_op(v)))(xs))
        np.testing.assert_allclose(y2, A @ (A @ x), atol=1e-12)

    def test_interior_compute_independent_of_halo_exchange(self):
        """Comm/compute overlap by construction: in the compiled HLO the
        bulk interior multiply must not consume any collective-permute
        result (only the O(halo) boundary corrections join after the
        exchange), and the ppermutes must ship boundary slices, not the
        whole shard. On TPU, XLA's latency-hiding scheduler turns
        exactly this dependence structure into collective-permute-
        start/done pairs with the interior fusion scheduled in between
        (see docs/SCALING.md)."""
        import re

        from jax.sharding import NamedSharding, PartitionSpec as P

        from spectra_tpu.parallel.stencil_spmv import make_stencil_matvec

        mesh = row_mesh(8)
        offsets = (-128, -1, 0, 1, 128)
        n = 8 * 1024
        mv = make_stencil_matvec(mesh, offsets)
        f = jax.jit(
            mv,
            in_shardings=(
                NamedSharding(mesh, P(None, "rows")),
                NamedSharding(mesh, P("rows")),
            ),
        )
        data = jax.numpy.ones((len(offsets), n))
        x = jax.numpy.ones((n,))
        hlo = f.lower(data, x).compile().as_text()

        permute_ids = set()
        interior_ops = []
        for line in hlo.splitlines():
            m = re.match(r"\s*(ROOT )?%?([\w.\-]+) = ", line)
            if not m:
                continue
            name = m.group(2)
            if "collective-permute(" in line:
                permute_ids.add(name)
                # operands are the (128,)-element boundary slices
                shapes = re.findall(r"f64\[(\d+)\]", line)
                assert shapes and all(int(s) <= 128 for s in shapes)
            if "multiply_add_fusion" in name:
                interior_ops.append(line)
        assert permute_ids and interior_ops
        for line in interior_ops:
            operands = set(re.findall(r"%([\w.\-]+)", line)[1:])
            assert not (operands & permute_ids), (
                "interior multiply depends on a collective-permute: "
                + line
            )

    def test_solver_matches_unsharded(self):
        from spectra_tpu.sparse import dia_from_scipy
        from spectra_tpu.parallel.stencil_spmv import ShardedStencilMatProd
        from jax.sharding import NamedSharding, PartitionSpec as P

        g = 16
        A = _laplacian_2d(g)
        v0 = SimpleRandom(0).random_vec(g * g)

        ref = st.SymEigsSolver(st.SparseSymMatProd.from_full(A), nev=4, ncv=16)
        ref.init(v0)
        ref.compute(st.SortRule.SmallestAlge)

        mesh = row_mesh(8)
        op = ShardedStencilMatProd.create(dia_from_scipy(A), mesh)
        v0s = jax.device_put(
            jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
        )
        eigs = st.SymEigsSolver(op, nev=4, ncv=16)
        eigs.init(v0s)
        eigs.compute(st.SortRule.SmallestAlge)
        assert eigs.info() == st.CompInfo.Successful
        # The 2-D Laplacian's low spectrum is degenerate (lambda_2 =
        # lambda_3); which copies of a multiple eigenvalue restarted
        # Lanczos resolves depends on rounding noise, and the sharded
        # run sums in a different (psum) order than the unsharded ref —
        # so assert true-eigenpair correctness (residual) and exact
        # capture of the simple smallest value, not set equality.
        # Full multiplicity capture is the locking test's job
        # (test_locking.py).
        lam = np.asarray(eigs.eigenvalues())
        vecs = np.asarray(eigs.eigenvectors())
        resid = np.abs(A @ vecs - vecs * lam[None, :]).max()
        assert resid < 1e-9
        np.testing.assert_allclose(
            lam.min(), np.asarray(ref.eigenvalues()).min(), atol=1e-12
        )


def test_partition_report():
    from spectra_tpu.parallel import partition_report

    g = 32
    A = _laplacian_2d(g)
    rep = partition_report(A, 4)
    assert rep["stencil_path_applicable"]
    assert rep["halo_per_part"][0] == g and rep["halo_per_part"][-1] == g
    assert all(h == 2 * g for h in rep["halo_per_part"][1:-1])
    assert rep["halo_bytes_per_spmv"] < rep["allgather_bytes_per_spmv"] / 10


@requires_multidevice
class TestHaloEllSpMV:
    """General-sparsity O(halo) SpMV (parallel/halo_spmv.py): per-SpMV
    traffic = distance-grouped boundary gathers, not an all-gather of x
    (reference hot op: MatOp/SparseSymMatProd.h:83-89 at scale)."""

    def _sharded(self, x, mesh, spec):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh, spec)
        )

    def test_matvec_and_block_exact(self):
        from jax.sharding import PartitionSpec as P
        from spectra_tpu.parallel import ShardedEllMatProd

        rng = np.random.RandomState(0)
        n = 16 * 8
        A = sps.random(n, n, density=0.08, random_state=rng, format="csr")
        A = (A + A.T).tocsr()
        mesh = row_mesh(8)
        op = ShardedEllMatProd.create(A, mesh)
        x = rng.normal(size=n)
        y = np.asarray(jax.jit(op.perform_op)(self._sharded(x, mesh, P("rows"))))
        np.testing.assert_allclose(y, A @ x, atol=1e-12)
        X = rng.normal(size=(n, 5))
        Y = np.asarray(
            jax.jit(op.perform_op)(self._sharded(X, mesh, P("rows", None)))
        )
        np.testing.assert_allclose(Y, A @ X, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(op.diagonal()), A.diagonal(), atol=1e-14
        )

    def test_comm_volume_beats_allgather(self):
        """For the banded benchmark family the plan moves an order of
        magnitude fewer bytes than GSPMD's all-gather of x."""
        from spectra_tpu.parallel import plan_halo_partition

        g = 32
        A = _laplacian_2d(g)
        plan = plan_halo_partition(A, 8)
        rep = plan.comm_report()
        assert plan.dists == (-1, 1)  # nearest-neighbor only
        assert rep["halo_bytes"] * 10 <= rep["allgather_bytes"]

    def test_solver_matches_unsharded(self):
        from jax.sharding import PartitionSpec as P
        from spectra_tpu.parallel import ShardedEllMatProd

        rng = np.random.RandomState(3)
        n = 16 * 8
        A = sps.random(n, n, density=0.08, random_state=rng, format="csr")
        A = (A + A.T).tocsr()
        v0 = SimpleRandom(0).random_vec(n)

        ref = st.SymEigsSolver(
            st.SparseSymMatProd.from_full(A, format="ell"), nev=4, ncv=16
        )
        ref.init(v0)
        ref.compute(st.SortRule.LargestMagn)

        mesh = row_mesh(8)
        op = ShardedEllMatProd.create(A, mesh)
        eigs = st.SymEigsSolver(op, nev=4, ncv=16)
        eigs.init(self._sharded(v0, mesh, P("rows")))
        eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        np.testing.assert_allclose(
            eigs.eigenvalues(), ref.eigenvalues(), atol=1e-10
        )
        vecs = np.asarray(eigs.eigenvectors())
        lam = np.asarray(eigs.eigenvalues())
        resid = np.abs(A @ vecs - vecs * lam[None, :]).max()
        assert resid < 1e-9 * max(1.0, np.abs(lam).max())

    def test_block_diagonal_no_comm(self):
        """A block-diagonal partition needs no halo at all."""
        from jax.sharding import PartitionSpec as P
        from spectra_tpu.parallel import ShardedEllMatProd

        rng = np.random.RandomState(1)
        blocks = [sps.random(16, 16, density=0.3, random_state=rng) for _ in range(8)]
        A = sps.block_diag(blocks).tocsr()
        mesh = row_mesh(8)
        op = ShardedEllMatProd.create(A, mesh)
        assert op.dists == ()
        x = rng.normal(size=A.shape[0])
        y = np.asarray(jax.jit(op.perform_op)(self._sharded(x, mesh, P("rows"))))
        np.testing.assert_allclose(y, A @ x, atol=1e-13)


@requires_multidevice
def test_sharded_shift_invert_solver():
    """Distributed shift-invert: inner MINRES over the halo-exchange
    stencil SpMV, whole eigensolve with row-sharded vectors — matches
    the analytic spectrum of the 2-D Laplacian near sigma=0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectra_tpu.parallel import sharded_stencil_shift_solve

    g = 16
    A = _laplacian_2d(g)
    mesh = row_mesh(8)
    op = sharded_stencil_shift_solve(A, 0.0, mesh)
    eigs = st.SymEigsShiftSolver.from_factored(op, 4, 16, 0.0)
    v0 = SimpleRandom(0).random_vec(g * g)
    eigs.init(
        jax.device_put(
            jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
        )
    )
    nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
    assert nconv == 4 and eigs.info() == st.CompInfo.Successful
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    lam = np.sort((mu[:, None] + mu[None, :]).ravel())[:4]
    np.testing.assert_allclose(vals, lam, atol=1e-9)


def test_stencil_block_matvec():
    """The stencil op ships a block through one halo exchange."""
    from jax.sharding import PartitionSpec as P, NamedSharding
    from spectra_tpu.sparse import dia_from_scipy
    from spectra_tpu.parallel.stencil_spmv import ShardedStencilMatProd

    g = 16
    A = _laplacian_2d(g)
    mesh = row_mesh(8)
    op = ShardedStencilMatProd.create(dia_from_scipy(A), mesh)
    X = np.random.default_rng(0).normal(size=(g * g, 4))
    Xs = jax.device_put(
        jax.numpy.asarray(X), NamedSharding(mesh, P("rows", None))
    )
    Y = np.asarray(jax.jit(op.perform_op)(Xs))
    np.testing.assert_allclose(Y, A @ X, atol=1e-12)


@requires_multidevice
def test_sharded_generalized_b_inner_product():
    """SymGEigsShiftSolver with sharded A and B: the (A - sigma B)^{-1}B
    operator and the ArnoldiOp Bv cache both run over the mesh, inner
    products psum-reduced (reference: internal/ArnoldiOp.h:33-98,
    SymGEigsShiftSolver.h:147-205)."""
    import scipy.linalg as sla
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectra_tpu.parallel import sharded_stencil_shift_solve
    from spectra_tpu.parallel.stencil_spmv import ShardedStencilMatProd
    from spectra_tpu.sparse import dia_from_scipy
    from spectra_tpu.solvers.sym_geigs_shift import SymGEigsShiftSolver

    g = 16
    A = _laplacian_2d(g)
    mass1 = sps.diags([1.0, 4.0, 1.0], [-1, 0, 1], shape=(g, g)) / 6.0
    B = (sps.kron(sps.eye(g), mass1) + sps.kron(mass1, sps.eye(g))).tocsr()
    mesh = row_mesh(8)
    solve = sharded_stencil_shift_solve(A, 0.0, mesh, b_csr=B)
    bop = ShardedStencilMatProd.create(dia_from_scipy(B), mesh)
    eigs = SymGEigsShiftSolver.from_factored(solve, bop, 3, 14, 0.0)
    v0 = SimpleRandom(0).random_vec(g * g)
    eigs.init(
        jax.device_put(
            jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
        )
    )
    nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
    assert nconv == 3 and eigs.info() == st.CompInfo.Successful
    vals = np.sort(np.asarray(eigs.eigenvalues()))
    want = np.sort(
        sla.eigh(A.toarray(), B.toarray(), eigvals_only=True)
    )[:3]
    np.testing.assert_allclose(vals, want, atol=1e-8)


@requires_multidevice
def test_sharded_davidson_block_products():
    """DavidsonSymEigsSolver over ShardedEllMatProd: the W = A V block
    extension runs through the distance-grouped halo exchange
    (reference: SearchSpace.h:57-63 block product seam)."""
    from spectra_tpu.parallel.halo_spmv import ShardedEllMatProd
    from spectra_tpu.solvers.davidson import DavidsonSymEigsSolver

    g = 16
    n = g * g
    A = (_laplacian_2d(g) + sps.diags(np.arange(n) * 0.05)).tocsr()
    mesh = row_mesh(8)
    op = ShardedEllMatProd.create(A, mesh)
    dav = DavidsonSymEigsSolver(op, 3, 12)
    nconv = dav.compute(st.SortRule.LargestAlge, maxit=100, tol=1e-9)
    assert nconv == 3
    vals = np.sort(np.asarray(dav.eigenvalues()))
    want = np.sort(np.linalg.eigvalsh(A.toarray()))[-3:]
    np.testing.assert_allclose(vals, want, atol=1e-7)


@requires_multidevice
def test_sharded_compute_locked_continuation():
    """compute_locked over the sharded shift-invert operator: locked-
    block deflation (LockedArnoldiOp) with row-sharded blocks, at
    least one deflated continuation round."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectra_tpu.parallel import sharded_stencil_shift_solve

    g = 16
    A = _laplacian_2d(g)
    mesh = row_mesh(8)
    op = sharded_stencil_shift_solve(A, 0.0, mesh)
    eigs = st.SymEigsShiftSolver.from_factored(op, 2, 8, 0.0)
    v0 = SimpleRandom(0).random_vec(g * g)
    eigs.init(
        jax.device_put(
            jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
        )
    )
    nconv = eigs.compute_locked(
        st.SortRule.LargestMagn,
        maxit=60,
        tol=1e-9,
        sorting=st.SortRule.SmallestAlge,
        want=st.SortRule.SmallestAlge,
        max_rounds=2,
    )
    assert nconv >= 2
    got = np.sort(np.asarray(eigs.eigenvalues()))
    w_all = np.sort(np.linalg.eigvalsh(A.toarray()))
    # locked values are true eigenvalues; the wanted smallest-2
    # multiplicity-counted prefix is captured
    dist = np.abs(got[:, None] - w_all[None, :]).min(axis=1)
    assert dist.max() < 1e-8
    np.testing.assert_allclose(got[:2], w_all[:2], atol=1e-8)


@requires_multidevice
class TestHaloStencilHiLoSpMV:
    """Row-sharded stencil SpMV through the fused double-single hi/lo
    Pallas kernel (parallel/stencil_spmv.py::ShardedStencilHiLoMatProd)
    — the multi-chip composition of the 100M-nnz HBM path (interpret
    mode on the CPU mesh; on TPU the same shard_map lowers the real
    Mosaic kernel per shard)."""

    def test_matvec_block_diag_exact(self):
        from spectra_tpu.sparse import dia_from_scipy
        from spectra_tpu.parallel import ShardedStencilHiLoMatProd
        from jax.sharding import NamedSharding, PartitionSpec as P

        g = 16
        A = _laplacian_2d(g)
        dia = dia_from_scipy(A)
        mesh = row_mesh(8)
        op = ShardedStencilHiLoMatProd.create(dia, mesh, chunk=32)
        rng = np.random.default_rng(0)
        x = rng.normal(size=g * g)
        xs = jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh, P("rows"))
        )
        y = np.asarray(jax.jit(op.perform_op)(xs))
        np.testing.assert_allclose(y, A @ x, atol=1e-12)
        # chained applications (the solver's usage pattern)
        y2 = np.asarray(
            jax.jit(lambda v: op.perform_op(op.perform_op(v)))(xs)
        )
        np.testing.assert_allclose(y2, A @ (A @ x), atol=1e-11)
        # block products (Davidson/LOBPCG seam)
        X = rng.normal(size=(g * g, 3))
        Xs = jax.device_put(
            jax.numpy.asarray(X), NamedSharding(mesh, P("rows", None))
        )
        Y = np.asarray(jax.jit(op.perform_op)(Xs))
        np.testing.assert_allclose(Y, A @ X, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(op.diagonal()), A.diagonal(), atol=0
        )

    def test_solver_through_kernel_matches_dense(self):
        from spectra_tpu.sparse import dia_from_scipy
        from spectra_tpu.parallel import ShardedStencilHiLoMatProd
        from jax.sharding import NamedSharding, PartitionSpec as P

        g = 16
        A = _laplacian_2d(g)
        mesh = row_mesh(8)
        op = ShardedStencilHiLoMatProd.create(
            dia_from_scipy(A), mesh, chunk=32
        )
        eigs = st.SymEigsSolver(op, 4, 12)
        v0 = SimpleRandom(0).random_vec(g * g)
        eigs.init(
            jax.device_put(
                jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
            )
        )
        nconv = eigs.compute()
        assert nconv >= 4
        got = np.sort(np.asarray(eigs.eigenvalues()))
        w = np.sort(np.linalg.eigvalsh(A.toarray()))
        # The Laplacian's top cluster carries doubled eigenvalues, so
        # plain Lanczos may return either member; validate the sharded
        # compute: every value is a true eigenvalue, and the strictly
        # separated top-2 distinct values are present.
        dist = np.abs(got[:, None] - w[None, :]).min(axis=1)
        assert dist.max() < 1e-10
        distinct = np.unique(np.round(w, 9))
        np.testing.assert_allclose(got[-2:], distinct[-2:], atol=1e-10)

    def test_auto_routing_policy(self):
        """sharded_stencil_op: hilo=True forces the kernel class; the
        CPU backend's "auto" stays on the exact-f64 stencil path."""
        from spectra_tpu.sparse import dia_from_scipy
        from spectra_tpu.parallel import (
            ShardedStencilHiLoMatProd,
            ShardedStencilMatProd,
            sharded_stencil_op,
        )

        g = 16
        dia = dia_from_scipy(_laplacian_2d(g))
        mesh = row_mesh(8)
        assert isinstance(
            sharded_stencil_op(dia, mesh, hilo="auto"),
            ShardedStencilMatProd,
        )
        assert isinstance(
            sharded_stencil_op(dia, mesh, hilo=True),
            ShardedStencilHiLoMatProd,
        )
