"""Halo-exchange stencil SpMV over a row-partitioned mesh.

GSPMD handles the row-sharded DIA SpMV correctness-first by inserting
an all-gather of x (O(n) bytes per device). For banded matrices that is
wildly pessimistic: a shard only ever reads ``hi`` elements from its
right neighbor and ``lo`` from its left (the halo). This module
implements the communication-optimal version explicitly with
``shard_map`` + ``lax.ppermute``: per SpMV each device exchanges
``lo + hi`` boundary elements with its ring neighbors over ICI —
O(halo) instead of O(n) traffic — and computes the local stencil
multiply on its own rows (SURVEY.md section 2.6: halo exchange with
local compute).

Requires the halo to fit in one neighbor shard (``max|offset| <=
n/n_devices``), true for any reasonable partition of a banded matrix.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectra_tpu.sparse.formats import DiaMatrix
from spectra_tpu.util.pytree import pytree_dataclass


def _interior_matvec(data_loc, x_loc, offsets):
    """Stencil multiply with zero halos (no neighbor dependency).

    Uses x_loc zero-extended on both sides; boundary rows get their
    missing halo contributions added separately, which keeps this bulk
    compute independent of the ppermutes so XLA overlaps them.
    """
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    rows = x_loc.shape[0]
    pad = [(lo, hi)] + [(0, 0)] * (x_loc.ndim - 1)
    xe = jnp.pad(x_loc, pad)
    y = jnp.zeros_like(x_loc)
    for k, off in enumerate(offsets):
        seg = jax.lax.dynamic_slice_in_dim(xe, lo + off, rows, axis=0)
        dk = data_loc[k] if x_loc.ndim == 1 else data_loc[k][:, None]
        y = y + dk * seg
    return y


@functools.lru_cache(maxsize=64)
def make_stencil_matvec(
    mesh: Mesh, offsets: tuple, axis: str = "rows", blocked: bool = False
):
    """Build a sharded DIA matvec with explicit halo exchange.

    Returns ``matvec(data_sharded, x_sharded) -> y_sharded`` where data
    is (d, n) sharded on axis 1 and x is (n,) — or (n, k) with
    ``blocked=True`` — sharded on axis 0. The interior multiply is
    independent of the halo traffic (boundary rows are corrected after
    the exchange), so the collectives overlap with the bulk compute.
    """
    offsets = tuple(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    n_dev = mesh.shape[axis]

    def local_fn(data_loc, x_loc):
        rows = x_loc.shape[0]
        left_halo = right_halo = None
        if n_dev > 1 and lo > 0:
            # My bottom `lo` rows feed the right neighbor's left halo;
            # shard 0 has no left neighbor (no sender) -> zeros.
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            left_halo = jax.lax.ppermute(x_loc[rows - lo :], axis, perm)
        if n_dev > 1 and hi > 0:
            perm = [(i + 1, i) for i in range(n_dev - 1)]
            right_halo = jax.lax.ppermute(x_loc[:hi], axis, perm)
        y = _interior_matvec(data_loc, x_loc, offsets)
        # Boundary corrections (tiny slices; join after the exchange).
        for k, off in enumerate(offsets):
            if off < 0 and left_halo is not None:
                dk = data_loc[k, : -off]
                seg = left_halo[lo + off : lo + off + (-off)]
                if x_loc.ndim == 2:
                    dk = dk[:, None]
                y = y.at[: -off].add(dk * seg)
            elif off > 0 and right_halo is not None:
                dk = data_loc[k, rows - off :]
                seg = right_halo[:off]
                if x_loc.ndim == 2:
                    dk = dk[:, None]
                y = y.at[rows - off :].add(dk * seg)
        return y

    vec = P(axis, None) if blocked else P(axis)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), vec),
        out_specs=vec,
    )


@pytree_dataclass(meta_fields=("offsets", "n_rows", "mesh", "axis"))
class ShardedStencilMatProd:
    """MatProd operator backed by the halo-exchange stencil SpMV.

    Drop-in for the solver drivers: the Krylov inner products reduce
    with one psum (inserted by GSPMD around the shard_map), and the
    matvec itself moves only O(halo) bytes per device per application.
    """

    data: jnp.ndarray  # (d, n) sharded P(None, axis)
    offsets: tuple
    n_rows: int
    mesh: Mesh
    axis: str

    @classmethod
    def create(cls, dia: DiaMatrix, mesh: Mesh, axis: str = "rows"):
        rows_per = dia.n_rows // mesh.shape[axis]
        lo = max(0, -min(dia.offsets))
        hi = max(0, max(dia.offsets))
        if dia.n_rows % mesh.shape[axis] != 0:
            raise ValueError(
                "n must divide evenly over the mesh for the halo SpMV "
                f"({dia.n_rows} rows over {mesh.shape[axis]} devices)"
            )
        if max(lo, hi) > rows_per:
            raise ValueError("halo exceeds shard size; use fewer devices")
        from spectra_tpu.distributed import global_put

        data = global_put(
            np.asarray(dia.data), NamedSharding(mesh, P(None, axis))
        )
        return cls(
            data=data,
            offsets=dia.offsets,
            n_rows=dia.n_rows,
            mesh=mesh,
            axis=axis,
        )

    @property
    def dtype(self):
        return self.data.dtype

    def rows(self) -> int:
        return self.n_rows

    def cols(self) -> int:
        return self.n_rows

    def perform_op(self, x):
        # One halo exchange per call, vector or block (the block path
        # ships (lo+hi, k) halo rows in the same two ppermutes).
        mv = make_stencil_matvec(
            self.mesh, tuple(self.offsets), self.axis, blocked=(x.ndim == 2)
        )
        return mv(self.data, x)

    # Inner Krylov solvers (MINRES) consume the operator through the
    # ``matvec`` protocol; the sharded SpMV serves both seams.
    matvec = perform_op

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros((self.n_rows,), self.data.dtype)


@functools.lru_cache(maxsize=64)
def make_stencil_matvec_hilo(
    mesh: Mesh,
    offsets: tuple,
    axis: str,
    rows_per: int,
    chunk: int,
    interpret: bool,
):
    """Row-sharded DIA matvec through the fused double-single Pallas
    kernel (ops/dia_ds.py): per call each device exchanges its
    O(halo) boundary rows with its ring neighbors (two ppermutes),
    then runs ONE fused pass over all of its diagonals' hi/lo planes.
    This composes the 100M-nnz single-chip HBM path with the
    multi-chip halo design — the per-shard SpMV no longer drops back
    to the per-diagonal XLA f64 lowering (docs/ROADMAP.md round-5
    Open #2). Boundary shards receive zero halos (no ppermute
    sender), matching the zero-padded DIA rows there.
    """
    offsets = tuple(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    n_dev = mesh.shape[axis]

    from spectra_tpu.ops.dia_ds import (
        combine_f64,
        dia_spmv_ds_ext,
        split_f64,
    )

    def local_fn(dh_loc, dl_loc, x_loc):
        left = jnp.zeros((lo,), x_loc.dtype)
        right = jnp.zeros((hi,), x_loc.dtype)
        if n_dev > 1 and lo > 0:
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            left = jax.lax.ppermute(x_loc[rows_per - lo :], axis, perm)
        if n_dev > 1 and hi > 0:
            perm = [(i + 1, i) for i in range(n_dev - 1)]
            right = jax.lax.ppermute(x_loc[:hi], axis, perm)
        xh, xl = split_f64(jnp.concatenate([left, x_loc, right]))
        yh, yl = dia_spmv_ds_ext(
            dh_loc,
            dl_loc,
            xh,
            xl,
            offsets=offsets,
            n=rows_per,
            chunk=chunk,
            interpret=interpret,
        )
        return combine_f64(yh, yl)

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis)),
        out_specs=P(axis),
        # pallas_call's out_shape carries no varying-mesh-axes info;
        # every operand/output here is explicitly specced anyway.
        check_vma=False,
    )


@functools.lru_cache(maxsize=64)
def make_stencil_matmat_hilo(
    mesh: Mesh,
    offsets: tuple,
    axis: str,
    rows_per: int,
    chunk: int,
    interpret: bool,
):
    """Block version of :func:`make_stencil_matvec_hilo`: ONE halo
    exchange for all k columns (the (halo, k) boundary blocks ride a
    single ppermute pair, like the plain stencil path's blocked mode),
    then the fused vector kernel runs per column inside the shard
    (``lax.map``: one compiled instance, k sequential fused passes —
    the Davidson/LOBPCG block-product seam)."""
    offsets = tuple(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    n_dev = mesh.shape[axis]

    from spectra_tpu.ops.dia_ds import (
        combine_f64,
        dia_spmv_ds_ext,
        split_f64,
    )

    def local_fn(dh_loc, dl_loc, X_loc):
        k = X_loc.shape[1]
        left = jnp.zeros((lo, k), X_loc.dtype)
        right = jnp.zeros((hi, k), X_loc.dtype)
        if n_dev > 1 and lo > 0:
            perm = [(i, i + 1) for i in range(n_dev - 1)]
            left = jax.lax.ppermute(X_loc[rows_per - lo :], axis, perm)
        if n_dev > 1 and hi > 0:
            perm = [(i + 1, i) for i in range(n_dev - 1)]
            right = jax.lax.ppermute(X_loc[:hi], axis, perm)
        X_ext = jnp.concatenate([left, X_loc, right], axis=0)

        def col(x_ext):
            xh, xl = split_f64(x_ext)
            yh, yl = dia_spmv_ds_ext(
                dh_loc,
                dl_loc,
                xh,
                xl,
                offsets=offsets,
                n=rows_per,
                chunk=chunk,
                interpret=interpret,
            )
            return combine_f64(yh, yl)

        return jax.lax.map(col, X_ext.T).T

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )


@pytree_dataclass(
    meta_fields=("offsets", "n_rows", "mesh", "axis", "chunk", "rows_per")
)
class ShardedStencilHiLoMatProd:
    """Row-sharded stencil operator whose per-shard SpMV is the fused
    double-single hi/lo kernel — the multi-chip version of
    :class:`~spectra_tpu.sparse.formats.DiaHiLoMatrix`.

    Data layout: each shard holds its own rows of every diagonal's
    hi/lo f32 planes, zero-padded per shard to a multiple of the
    kernel chunk (global shape ``(d, n_dev * n_pad_local)``, sharded
    ``P(None, axis)`` so the pad is paid once at construction, never
    per call). ``perform_op`` moves O(halo) f64 bytes per device per
    application and one fused HBM pass over the local planes.

    Reference hot op: include/Spectra/MatOp/SparseSymMatProd.h:83-89;
    the reference has no distributed-memory analogue.
    """

    data_hi: jnp.ndarray  # (d, n_dev*n_pad_local) f32, P(None, axis)
    data_lo: jnp.ndarray
    offsets: tuple
    n_rows: int
    mesh: Mesh
    axis: str
    chunk: int
    rows_per: int

    @classmethod
    def create(
        cls,
        dia: DiaMatrix,
        mesh: Mesh,
        axis: str = "rows",
        chunk: int | None = None,
    ):
        from spectra_tpu.distributed import global_put
        from spectra_tpu.ops.dia_ds import pick_hilo_chunk

        n_dev = mesh.shape[axis]
        if dia.n_rows % n_dev != 0:
            raise ValueError(
                "n must divide evenly over the mesh for the halo SpMV "
                f"({dia.n_rows} rows over {n_dev} devices)"
            )
        rows_per = dia.n_rows // n_dev
        lo = max(0, -min(dia.offsets))
        hi = max(0, max(dia.offsets))
        if max(lo, hi) > rows_per:
            raise ValueError("halo exceeds shard size; use fewer devices")
        if chunk is None:
            chunk = pick_hilo_chunk(dia.offsets, dia.data.shape[0])
            if chunk is None:
                raise ValueError(
                    "DIA shape does not fit the hi/lo kernel VMEM "
                    "budget (see ops.dia_ds.pick_hilo_chunk)"
                )
            # Clamp padding waste for small shards, but keep the block
            # lane-aligned (Mosaic requires chunk % 128 == 0; we keep
            # the stronger 1024 alignment the window math assumes).
            chunk = min(
                int(chunk), max(1024, -(-rows_per // 1024) * 1024)
            )
        chunk = int(chunk)
        if mesh.devices.flat[0].platform == "tpu" and chunk % 128 != 0:
            raise ValueError(
                f"chunk={chunk} must be a multiple of 128 on TPU "
                "(Mosaic lane alignment); omit chunk to auto-pick"
            )
        n_pad = (rows_per + chunk - 1) // chunk * chunk
        # Host-side per-shard padding: (d, n) -> (d, n_dev, n_pad).
        data = np.asarray(dia.data, np.float64).reshape(
            dia.data.shape[0], n_dev, rows_per
        )
        padded = np.zeros(
            (data.shape[0], n_dev, n_pad), np.float64
        )
        padded[:, :, :rows_per] = data
        padded = padded.reshape(data.shape[0], n_dev * n_pad)
        hi_p = padded.astype(np.float32)
        lo_p = (padded - hi_p.astype(np.float64)).astype(np.float32)
        sh = NamedSharding(mesh, P(None, axis))
        return cls(
            data_hi=global_put(hi_p, sh),
            data_lo=global_put(lo_p, sh),
            offsets=tuple(dia.offsets),
            n_rows=dia.n_rows,
            mesh=mesh,
            axis=axis,
            chunk=chunk,
            rows_per=rows_per,
        )

    @property
    def dtype(self):
        return jnp.dtype(jnp.float64)

    def rows(self) -> int:
        return self.n_rows

    def cols(self) -> int:
        return self.n_rows

    def _interpret(self) -> bool:
        # Key off the MESH's devices, not the default backend: a
        # CPU-device mesh (virtual-device dryruns/tests) must take the
        # interpret path even when a TPU plugin is the default.
        return self.mesh.devices.flat[0].platform != "tpu"

    def perform_op(self, x):
        maker = (
            make_stencil_matmat_hilo
            if x.ndim == 2
            else make_stencil_matvec_hilo
        )
        mv = maker(
            self.mesh,
            tuple(self.offsets),
            self.axis,
            self.rows_per,
            self.chunk,
            self._interpret(),
        )
        return mv(self.data_hi, self.data_lo, x)

    matvec = perform_op

    def diagonal(self):
        if 0 not in self.offsets:
            return jnp.zeros((self.n_rows,), jnp.float64)
        k = self.offsets.index(0)
        d = (
            self.data_hi[k].astype(jnp.float64)
            + self.data_lo[k].astype(jnp.float64)
        )
        n_dev = self.mesh.shape[self.axis]
        n_pad = d.shape[0] // n_dev
        return d.reshape(n_dev, n_pad)[:, : self.rows_per].reshape(-1)


def sharded_stencil_op(
    dia: DiaMatrix,
    mesh: Mesh,
    axis: str = "rows",
    hilo: str | bool = "auto",
):
    """Build the row-sharded stencil operator, routing the per-shard
    SpMV to the fused hi/lo kernel the same way the single-chip path
    does (``sparse.formats.maybe_hilo``): on the TPU backend, for f64
    square stencils whose PER-SHARD working set exceeds VMEM
    residency. ``hilo=True`` forces the kernel path (tests /
    interpret mode), ``hilo=False`` pins the XLA lowering."""
    from spectra_tpu.ops.dia_ds import pick_hilo_chunk
    from spectra_tpu.sparse.formats import HILO_BYTES_THRESHOLD

    d = dia.data.shape[0]
    rows_per = dia.n_rows // max(1, mesh.shape[axis])
    eligible = (
        dia.dtype == jnp.float64
        and dia.n_rows == dia.n_cols
        and pick_hilo_chunk(dia.offsets, d) is not None
    )
    if hilo == "auto":
        work = (d + 2) * 8 * rows_per
        hilo = (
            eligible
            and mesh.devices.flat[0].platform == "tpu"
            and work >= HILO_BYTES_THRESHOLD
        )
    if hilo and eligible:
        return ShardedStencilHiLoMatProd.create(dia, mesh, axis)
    return ShardedStencilMatProd.create(dia, mesh, axis)


def sharded_stencil_shift_solve(
    csr,
    sigma,
    mesh: Mesh,
    axis: str = "rows",
    inner_rtol=None,
    precond: str = "none",
    cheb_degree: int = 16,
    cheb_interval=None,
    method: str = "auto",
    grid_dims=None,
    b_csr=None,
):
    """Distributed shift-invert operator: ``(A - sigma I)^{-1} x``
    — or the generalized ``(A - sigma B)^{-1} x`` when ``b_csr`` is
    given (the SymGEigsShiftSolver at-scale seam; reference:
    SymShiftInvert.h:218-227 factors A - sigma B serially)
    with every vector of the inner iteration row-sharded.

    ``method="auto"`` (and ``"mg"``) first tries the SHARDED geometric
    multigrid (parallel/mg_sharded.py: O(1) V-cycles per solve, halo +
    one-plane transfer traffic per level, replicated tail), validated
    by a trial solve; it falls back to MINRES over the halo-exchange
    stencil SpMV (O(sqrt(kappa)) iterations, O(halo) bytes per step).
    ``method="minres"`` pins the Krylov path.

    This is the at-scale answer to the reference's serial SparseLU
    shift-solve (SparseSymShiftSolve.h:51): a sparse direct
    factorization does not distribute; multigrid and inner Krylov
    solves do (reference precedent for iterative inverse ops:
    SparseRegularInverse.h:105-116). Use from
    ``SymEigsShiftSolver.from_factored(op, ...)`` with a sharded v0.
    """
    import scipy.sparse as sps

    from spectra_tpu.matop.shift_solve import SparseShiftSolveBase
    from spectra_tpu.sparse.formats import dia_from_scipy

    csr = csr.tocsr()
    n = csr.shape[0]
    metric = (
        b_csr.tocsr()
        if b_csr is not None
        else sps.eye(n, dtype=csr.dtype, format="csr")
    )
    shifted = (csr - sigma * metric).tocsr()
    # Auto-routes the per-shard SpMV to the fused hi/lo kernel at
    # HBM-resident scale on TPU (same policy as maybe_hilo).
    op = sharded_stencil_op(dia_from_scipy(shifted), mesh, axis)

    mg_state = None
    if method in ("auto", "mg"):
        mg_state = _maybe_build_mg_sharded(shifted, op, mesh, axis, grid_dims)
        if mg_state is None and method == "mg":
            import warnings

            warnings.warn(
                "method='mg' requested but no validated sharded multigrid "
                "hierarchy could be built; falling back to MINRES.",
                stacklevel=2,
            )
    return SparseShiftSolveBase(
        shifted=op,
        solver=None,
        n=n,
        method="mg" if mg_state is not None else "minres",
        out_real=False,
        inner_rtol=inner_rtol,
        precond=precond,
        cheb_degree=cheb_degree,
        cheb_interval=cheb_interval,
        inner_rtol_user=inner_rtol is not None,
        mg=mg_state,
    )


def _maybe_build_mg_sharded(shifted, op, mesh, axis, grid_dims):
    """Sharded analogue of shift_solve._maybe_build_mg: build + one
    trial solve with a backward-error gate; None on any failure."""
    from spectra_tpu.distributed import global_put
    from spectra_tpu.linalg.multigrid import MGBuildError
    from spectra_tpu.matop.precond import gershgorin_upper
    from spectra_tpu.parallel.mg_sharded import (
        build_mg_sharded,
        mg_solve_sharded,
    )
    from spectra_tpu.util.rng import SimpleRandom

    try:
        smg = build_mg_sharded(shifted, mesh, axis, dims=grid_dims)
    except MGBuildError:
        return None
    n = shifted.shape[0]
    b = global_put(
        SimpleRandom(1).random_vec(n, op.dtype),
        NamedSharding(mesh, P(axis)),
    )
    y = jax.jit(
        lambda m, bb: mg_solve_sharded(m, bb, rtol=1e-12, maxiter=60)[0]
    )(smg, b)
    resid = jnp.linalg.norm(op.matvec(y) - b)
    scale = gershgorin_upper(op) * jnp.linalg.norm(y) + jnp.linalg.norm(b)
    if not bool(resid <= 1e-11 * scale):
        return None
    return smg
