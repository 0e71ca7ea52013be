"""Row-partition meshes and sharding placement.

Maps every operator storage format onto a 1-D ``("rows",)`` mesh:

* ELL arrays ``(n, L)``       -> ``P("rows", None)``
* DIA data  ``(d, n)``        -> ``P(None, "rows")``
* dense operator matrices     -> ``P("rows", None)``
* Krylov vectors ``(n,)``     -> ``P("rows")``

``shard_problem`` device_puts an (operator, v0) pair; the jitted solver
cores then auto-partition through GSPMD sharding propagation.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectra_tpu.sparse.formats import DiaMatrix, EllMatrix


def row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ``"rows"`` axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("rows",))


def row_sharded(mesh: Mesh, *trailing_dims: int):
    """NamedSharding partitioning axis 0, replicating the rest."""
    return NamedSharding(mesh, P("rows", *([None] * len(trailing_dims))))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _put(x, sharding):
    # Process-spanning shardings can't be device_put from one host;
    # route through the per-process placement helper.
    from spectra_tpu.distributed import global_put

    return global_put(x, sharding)


def shard_operator(op, mesh: Mesh):
    """Place an operator pytree on the mesh, row-partitioning the
    n-dimensional leaves and replicating everything else."""

    def place(leaf):
        if isinstance(leaf, EllMatrix):
            return EllMatrix(
                cols=_put(leaf.cols, NamedSharding(mesh, P("rows", None))),
                vals=_put(leaf.vals, NamedSharding(mesh, P("rows", None))),
                n_rows=leaf.n_rows,
                n_cols=leaf.n_cols,
            )
        if isinstance(leaf, DiaMatrix):
            return DiaMatrix(
                data=_put(leaf.data, NamedSharding(mesh, P(None, "rows"))),
                offsets=leaf.offsets,
                n_rows=leaf.n_rows,
                n_cols=leaf.n_cols,
            )
        return leaf

    # Handle wrapped stores (EllMatrix/DiaMatrix inside op pytrees) and
    # dense matrices by structural dispatch.
    if isinstance(op, (EllMatrix, DiaMatrix)):
        return place(op)
    if hasattr(op, "ell"):
        import dataclasses

        return dataclasses.replace(op, ell=place(op.ell))
    if hasattr(op, "mat"):
        import dataclasses

        n = op.rows()
        mat = op.mat
        if hasattr(mat, "shape") and mat.shape[0] == n:
            return dataclasses.replace(
                op, mat=_put(mat, NamedSharding(mesh, P("rows", None)))
            )
    return op


def shard_problem(op, v0, mesh: Mesh):
    """Shard an (operator, starting-vector) pair for a row mesh."""
    op_s = shard_operator(op, mesh)
    v0_s = _put(jax.numpy.asarray(v0), NamedSharding(mesh, P("rows")))
    return op_s, v0_s


def partition_report(csr, n_parts: int) -> dict:
    """Communication-volume analysis for an equal row partition of a
    scipy CSR matrix (uses the native C++ halo planner).

    Returns per-partition halo sizes (distinct remote x entries each
    shard reads per SpMV), total halo bytes per SpMV at fp64, the
    all-gather bytes GSPMD would move instead, and whether the
    halo-exchange stencil path applies (banded matrix).
    """
    from spectra_tpu import native
    from spectra_tpu.sparse.formats import dia_suitability

    csr = csr.tocsr()
    n = csr.shape[0]
    halos = native.rowpart_halo(
        n, csr.indptr.astype("int64"), csr.indices.astype("int64"), n_parts
    )
    item = 8  # fp64 bytes
    return {
        "n_parts": n_parts,
        "rows_per_part": -(-n // n_parts),
        "halo_per_part": [int(h) for h in halos],
        "halo_bytes_per_spmv": int(halos.sum()) * item,
        "allgather_bytes_per_spmv": int(n) * item * n_parts,
        "stencil_path_applicable": bool(dia_suitability(csr)),
    }
