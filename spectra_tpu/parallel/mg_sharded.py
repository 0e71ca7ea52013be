"""Row-sharded geometric multigrid: the distributed inner solve.

`linalg/multigrid.py` makes grid-stencil shift-invert O(1) V-cycles per
application on one chip; this module distributes the V-cycle over a
1-D device mesh so the inner solve scales with the SpMV instead of
becoming the serial bottleneck (SURVEY.md section 2.6 — the reference
has nothing to distribute: its SparseLU factorization is inherently
serial, SparseSymShiftSolve.h:85-102).

Layout: vectors row-sharded (``PartitionSpec(axis)``) with shard
boundaries aligned to planes of the FIRST grid axis. Then, per level:

  * smoothing = the existing halo-exchange stencil SpMV
    (:class:`~spectra_tpu.parallel.stencil_spmv.ShardedStencilMatProd`,
    O(halo) bytes/device) + sharded elementwise work;
  * grid transfers along the unsharded axes are shard-local; along the
    sharded axis each device exchanges exactly ONE boundary plane with
    a ring neighbor (``lax.ppermute``) — the transfer analogue of the
    SpMV halo;
  * coarsening halves the plane count per shard, so a level is
    shardable while ``g0 % n_dev == 0`` and planes-per-shard is even;
    below that the remaining levels are tiny and the cycle switches to
    a REPLICATED tail hierarchy (one all-gather of the coarse
    residual per V-cycle, O(n / 2^s) bytes — the same replicated-small-
    problem seam as the ncv x ncv dense pipeline).

The sharded transfers apply the same weights as the single-device
``restrict_nd``/``prolong_nd`` (unit-tested against them), so the
sharded V-cycle computes the single-device iteration up to fp
reduction order.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectra_tpu.linalg.multigrid import (
    MGBuildError,
    MGState,
    _prolong_axis_last,
    _restrict_axis_last,
    _smooth,
    build_level_chain,
    coarse_dims,
    resolve_grid,
    v_cycle,
)
from spectra_tpu.parallel.stencil_spmv import ShardedStencilMatProd
from spectra_tpu.util.pytree import pytree_dataclass


def _local_other_axes(x, dims_from, dims_to, op_axis_last, boundary):
    """Apply a 1-D transfer along every axis except the sharded axis 0.
    ``x`` is the local block (p, *dims_from[1:])."""
    for ax in range(1, len(dims_from)):
        x = jnp.moveaxis(x, ax, -1)
        x = op_axis_last(x, dims_from[ax], dims_to[ax], boundary)
        x = jnp.moveaxis(x, -1, ax)
    return x


@functools.lru_cache(maxsize=64)
def make_restrict0(mesh: Mesh, axis: str, dims_f: tuple, dims_c: tuple,
                   boundary: str):
    """Sharded restriction (flat P(axis) fine -> flat P(axis) coarse).
    One left-neighbor plane ppermute; everything else shard-local."""
    n_dev = mesh.shape[axis]
    p = dims_f[0] // n_dev

    def local(x_flat):
        x = x_flat.reshape((p,) + tuple(dims_f[1:]))
        x = _local_other_axes(
            x, dims_f, dims_c, _restrict_axis_last, boundary
        )
        pc = p // 2
        if n_dev > 1:
            left = jax.lax.ppermute(
                x[-1:], axis, [(i, i + 1) for i in range(n_dev - 1)]
            )
        else:
            left = jnp.zeros_like(x[-1:])
        xp = jnp.concatenate([left, x], axis=0)  # (p + 1, ...)
        center = xp[1 : p : 2]
        left_t = xp[0 : p : 2]
        right_t = xp[2 : p + 1 : 2]
        uc = center + 0.5 * (left_t + right_t)
        if boundary == "const":
            # Global last fine plane (last shard only): full weight.
            idx = jax.lax.axis_index(axis)
            w = jnp.where(idx == n_dev - 1, 0.5, 0.0).astype(x.dtype)
            uc = uc.at[-1].add(w * x[-1])
        return uc.reshape((-1,))

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
    )


@functools.lru_cache(maxsize=64)
def make_prolong0(mesh: Mesh, axis: str, dims_c: tuple, dims_f: tuple,
                  boundary: str):
    """Sharded prolongation (flat P(axis) coarse -> flat P(axis) fine).
    One right-neighbor plane ppermute; everything else shard-local."""
    n_dev = mesh.shape[axis]
    pc = dims_c[0] // n_dev

    def local(c_flat):
        c = c_flat.reshape((pc,) + tuple(dims_c[1:]))
        if n_dev > 1:
            right = jax.lax.ppermute(
                c[:1], axis, [(i + 1, i) for i in range(n_dev - 1)]
            )
        else:
            right = jnp.zeros_like(c[:1])
        cnext = jnp.concatenate([c[1:], right], axis=0)
        if boundary == "const":
            idx = jax.lax.axis_index(axis)
            last = jnp.where(idx == n_dev - 1, c[-1], cnext[-1])
            cnext = cnext.at[-1].set(last)
        odd = 0.5 * (c + cnext)
        y = jnp.stack([c, odd], axis=1).reshape((2 * pc,) + c.shape[1:])
        y = _local_other_axes(
            y, (2 * pc,) + tuple(dims_c[1:]), (2 * pc,) + tuple(dims_f[1:]),
            _prolong_axis_last, boundary,
        )
        return y.reshape((-1,))

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
    )


@pytree_dataclass(
    meta_fields=("dims_per_level", "boundary", "nu1", "nu2", "mesh", "axis")
)
class ShardedMGState:
    """Sharded hierarchy: ``s_ops[l]`` are halo-exchange stencil
    operators over the mesh (vectors P(axis)); ``bottom`` is the
    replicated tail (possibly zero levels — then it is just the dense
    coarse inverse). ``dims_per_level`` covers the SHARDED levels plus
    the switch level (== bottom.dims_per_level[0])."""

    s_ops: tuple
    s_inv_diags: tuple
    s_lam: tuple
    bottom: MGState
    dims_per_level: tuple
    boundary: str
    nu1: int
    nu2: int
    mesh: Mesh
    axis: str

    @property
    def n(self) -> int:
        return int(np.prod(self.dims_per_level[0]))


def shardable_levels(dims_per_level, n_dev: int):
    """How many leading levels can be row-sharded: the first grid axis
    must split evenly with an even plane count per shard (so coarse
    shard boundaries stay aligned), and the level must be worth
    sharding at all."""
    s = 0
    for dims in dims_per_level[:-1]:
        g0 = dims[0]
        if g0 % n_dev != 0 or (g0 // n_dev) % 2 != 0:
            break
        s += 1
    return s


def build_mg_sharded(
    shifted_csr,
    mesh: Mesh,
    axis: str = "rows",
    dims=None,
    max_coarse_n: int = 1024,
    nu1: int = 2,
    nu2: int = 2,
    boundary: str = "auto",
):
    """Build a :class:`ShardedMGState` over ``mesh``. Raises
    :class:`MGBuildError` when the matrix is not a grid stencil or the
    leading grid axis does not split over the mesh."""
    A, dims, auto_boundary = resolve_grid(shifted_csr, dims)
    if boundary == "auto":
        boundary = auto_boundary
    levels, coarse_inv, dims_per_level = build_level_chain(
        A, dims, boundary, max_coarse_n=max_coarse_n
    )
    n_dev = mesh.shape[axis]
    s = shardable_levels(dims_per_level, n_dev)
    if s == 0:
        raise MGBuildError(
            f"grid axis 0 ({dims[0]}) does not split over {n_dev} devices "
            "with even planes per shard"
        )

    from spectra_tpu.sparse.formats import dia_from_scipy
    from spectra_tpu.distributed import global_put

    s_ops, s_inv_diags, s_lam = [], [], []
    for lv in levels[:s]:
        dia = dia_from_scipy(lv["csr"])
        s_ops.append(ShardedStencilMatProd.create(dia, mesh, axis))
        s_inv_diags.append(
            global_put(
                np.asarray(lv["inv_diag"]), NamedSharding(mesh, P(axis))
            )
        )
        s_lam.append(jnp.asarray(lv["lam"]))

    dtype = levels[0]["csr"].dtype
    bottom = MGState(
        ops=tuple(
            dia_from_scipy(lv["csr"]) for lv in levels[s:]
        ),
        inv_diags=tuple(jnp.asarray(lv["inv_diag"]) for lv in levels[s:]),
        lam_max=tuple(jnp.asarray(lv["lam"]) for lv in levels[s:]),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        dims_per_level=tuple(dims_per_level[s:]),
        nu1=int(nu1),
        nu2=int(nu2),
        boundary=boundary,
    )
    return ShardedMGState(
        s_ops=tuple(s_ops),
        s_inv_diags=tuple(s_inv_diags),
        s_lam=tuple(s_lam),
        bottom=bottom,
        dims_per_level=tuple(dims_per_level[: s + 1]),
        boundary=boundary,
        nu1=int(nu1),
        nu2=int(nu2),
        mesh=mesh,
        axis=axis,
    )


def v_cycle_sharded(smg: ShardedMGState, b, x):
    """One V(nu1, nu2) cycle: sharded levels smooth/transfer with
    O(halo) + one-plane traffic; the tail runs replicated after one
    all-gather of the (small) switch-level residual."""
    mesh, axis = smg.mesh, smg.axis
    s = len(smg.s_ops)

    def go(lv, b, x):
        if lv == s:
            b_rep = jax.lax.with_sharding_constraint(
                b, NamedSharding(mesh, P())
            )
            e = v_cycle(smg.bottom, b_rep, jnp.zeros_like(b_rep))
            return jax.lax.with_sharding_constraint(
                e, NamedSharding(mesh, P(axis))
            )
        op = smg.s_ops[lv]
        inv_d, lam = smg.s_inv_diags[lv], smg.s_lam[lv]
        x = _smooth(op, inv_d, lam, x, b, smg.nu1)
        r = b - op.matvec(x)
        dims_f = smg.dims_per_level[lv]
        dims_c = (
            smg.dims_per_level[lv + 1]
            if lv + 1 < len(smg.dims_per_level)
            else smg.bottom.dims_per_level[0]
        )
        rc = make_restrict0(mesh, axis, dims_f, dims_c, smg.boundary)(r)
        ec = go(lv + 1, rc, jnp.zeros_like(rc))
        x = x + make_prolong0(mesh, axis, dims_c, dims_f, smg.boundary)(ec)
        x = _smooth(op, inv_d, lam, x, b, smg.nu2)
        return x

    return go(0, b, x)


def mg_solve_sharded(smg: ShardedMGState, b, rtol=1e-12, maxiter: int = 100,
                     x0=None):
    """Stationary sharded multigrid iteration (same contract as
    :func:`spectra_tpu.linalg.multigrid.mg_solve`): one psum-reduced
    stopping-test norm per cycle; stalls out instead of burning budget
    when the cycle is not contracting."""
    op = smg.s_ops[0]
    b = b.astype(op.dtype)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(op.dtype)
    bnorm = jnp.linalg.norm(b)
    tol = rtol * jnp.maximum(bnorm, jnp.finfo(op.dtype).tiny)

    def cond(carry):
        x, r, k, rn, rn_prev = carry
        still = (rn > tol) & (k < maxiter)
        progressing = rn < 0.8 * rn_prev
        return still & (progressing | (k < 4))

    def body(carry):
        x, r, k, rn, rn_prev = carry
        x = x + v_cycle_sharded(smg, r, jnp.zeros_like(r))
        r = b - op.matvec(x)
        return x, r, k + 1, jnp.linalg.norm(r), rn

    r0 = b - op.matvec(x)
    rn0 = jnp.linalg.norm(r0)
    x, r, k, rn, _ = jax.lax.while_loop(
        cond, body, (x, r0, jnp.zeros((), jnp.int32), rn0, jnp.inf * rn0)
    )
    return x, k
