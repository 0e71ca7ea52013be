"""Row-sharded multigrid (parallel/mg_sharded.py) on the 8-device CPU
mesh: transfer parity with the single-device operators, V-cycle parity,
and the distributed shift-invert routing."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import spectra_tpu as st
from spectra_tpu.linalg.multigrid import (
    build_mg,
    coarse_dims,
    mg_solve,
    prolong_nd,
    restrict_nd,
)
from spectra_tpu.parallel import row_mesh
from spectra_tpu.parallel.mg_sharded import (
    build_mg_sharded,
    make_prolong0,
    make_restrict0,
    mg_solve_sharded,
    shardable_levels,
    v_cycle_sharded,
)
from spectra_tpu.util.rng import SimpleRandom

requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def lap2d(gy, gx=None):
    gx = gy if gx is None else gx
    ly = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(gy, gy))
    lx = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(gx, gx))
    return (sps.kron(sps.eye(gy), lx) + sps.kron(ly, sps.eye(gx))).tocsr()


def _shard(x, mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))


class TestShardedTransfers:
    @requires_multidevice
    @pytest.mark.parametrize("boundary", ["clip", "const"])
    @pytest.mark.parametrize(
        "dims", [(32, 24), (16, 13), (16, 6, 10)]
    )
    def test_match_single_device(self, dims, boundary):
        mesh = row_mesh(8)
        dims_c = coarse_dims(dims)
        rng = np.random.default_rng(0)
        r = rng.normal(size=int(np.prod(dims)))
        got = np.asarray(
            make_restrict0(mesh, "rows", dims, dims_c, boundary)(
                _shard(r, mesh)
            )
        )
        want = np.asarray(restrict_nd(jnp.asarray(r), dims, dims_c, boundary))
        np.testing.assert_allclose(got, want, atol=1e-13)

        e = rng.normal(size=int(np.prod(dims_c)))
        got = np.asarray(
            make_prolong0(mesh, "rows", dims_c, dims, boundary)(
                _shard(e, mesh)
            )
        )
        want = np.asarray(prolong_nd(jnp.asarray(e), dims_c, dims, boundary))
        np.testing.assert_allclose(got, want, atol=1e-13)


class TestShardedVcycle:
    @requires_multidevice
    def test_levels_split(self):
        # 64 planes over 8 devices: 64 -> 32 -> 16 sharded (p = 8, 4, 2
        # even), 8 planes would leave p = 1 -> replicated tail.
        assert shardable_levels([(64, 8), (32, 4), (16, 2), (8, 1)], 8) == 3

    @requires_multidevice
    def test_solve_matches_unsharded(self):
        A = lap2d(64, 24)
        mesh = row_mesh(8)
        smg = build_mg_sharded(A, mesh, max_coarse_n=128)
        assert len(smg.s_ops) >= 1
        mg = build_mg(A, max_coarse_n=128)
        rng = np.random.default_rng(1)
        b = rng.normal(size=A.shape[0])
        xs, ks = mg_solve_sharded(smg, _shard(b, mesh), rtol=1e-12)
        xu, ku = mg_solve(mg, jnp.asarray(b), rtol=1e-12)
        relres = np.linalg.norm(A @ np.asarray(xs) - b) / np.linalg.norm(b)
        assert relres <= 1e-11
        assert abs(int(ks) - int(ku)) <= 2
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xu), atol=1e-9)

    @requires_multidevice
    def test_single_cycle_matches_unsharded(self):
        from spectra_tpu.linalg.multigrid import v_cycle

        A = lap2d(32, 32)
        mesh = row_mesh(8)
        smg = build_mg_sharded(A, mesh, max_coarse_n=64)
        mg = build_mg(A, max_coarse_n=64)
        rng = np.random.default_rng(2)
        b = rng.normal(size=A.shape[0])
        ys = np.asarray(
            v_cycle_sharded(smg, _shard(b, mesh), _shard(0 * b, mesh))
        )
        yu = np.asarray(v_cycle(mg, jnp.asarray(b), jnp.zeros(A.shape[0])))
        np.testing.assert_allclose(ys, yu, atol=1e-12)


class TestShardedShiftInvert:
    @requires_multidevice
    def test_auto_routes_to_mg_and_solves(self):
        from spectra_tpu.parallel import sharded_stencil_shift_solve

        g = 32
        A = lap2d(g)
        mesh = row_mesh(8)
        op = sharded_stencil_shift_solve(A, 0.0, mesh)
        assert op.method == "mg" and hasattr(op.mg, "s_ops")
        eigs = st.SymEigsShiftSolver.from_factored(op, 4, 16, 0.0)
        eigs.init(_shard(SimpleRandom(0).random_vec(g * g), mesh))
        nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-10)
        assert nconv == 4 and eigs.info() == st.CompInfo.Successful
        vals = np.sort(np.asarray(eigs.eigenvalues()))
        i = np.arange(1, g + 1)
        mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
        lam = np.sort((mu[:, None] + mu[None, :]).ravel())[:4]
        np.testing.assert_allclose(vals, lam, atol=1e-9)

    @requires_multidevice
    def test_minres_pin_still_works(self):
        from spectra_tpu.parallel import sharded_stencil_shift_solve

        g = 16
        A = lap2d(g)
        mesh = row_mesh(8)
        op = sharded_stencil_shift_solve(A, 0.0, mesh, method="minres")
        assert op.method == "minres" and op.mg is None
