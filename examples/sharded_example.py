"""Row-sharded solve over a device mesh.

On a multi-chip TPU slice this partitions the matrix and all Krylov
vectors across chips (collectives over ICI); on CPU run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to simulate.
"""

import numpy as np
import scipy.sparse as sps

import jax

import os
import sys

# Runnable straight from a checkout: put the repo root on the path.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import spectra_tpu as st
from spectra_tpu.parallel import row_mesh, shard_problem
from spectra_tpu.util.rng import SimpleRandom


def laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def main():
    n_dev = jax.device_count()
    print(f"{n_dev} devices: {jax.devices()}")

    g = 64
    A = laplacian_2d(g)
    op = st.SparseSymMatProd.from_full(A)  # auto-selects DIA storage
    v0 = SimpleRandom(0).random_vec(g * g)

    mesh = row_mesh(n_dev)
    op_s, v0_s = shard_problem(op, v0, mesh)

    eigs = st.SymEigsSolver(op_s, nev=5, ncv=20)
    eigs.init(v0_s)  # deterministic start, row-sharded
    eigs.compute(st.SortRule.LargestMagn)
    print("info:", eigs.info())
    print("eigenvalues:", eigs.eigenvalues())

    # --- explicit halo-exchange stencil operator -------------------
    # For banded matrices, sharded_stencil_op moves only O(halo)
    # boundary rows per SpMV (two ppermutes) instead of GSPMD's
    # all-gather, and at HBM-resident f64 scale on TPU it auto-routes
    # each shard's multiply through the fused double-single Pallas
    # kernel (ops/dia_ds.py). hilo=True forces the kernel path (it
    # runs in interpret mode on CPU meshes).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectra_tpu.parallel import sharded_stencil_op
    from spectra_tpu.sparse import dia_from_scipy

    halo_op = sharded_stencil_op(dia_from_scipy(A), mesh, hilo=True)
    v0_h = jax.device_put(
        jax.numpy.asarray(v0), NamedSharding(mesh, P("rows"))
    )
    eigs2 = st.SymEigsSolver(halo_op, nev=5, ncv=20)
    eigs2.init(v0_h)
    eigs2.compute(st.SortRule.LargestMagn)
    print("halo/hi-lo kernel eigenvalues:", eigs2.eigenvalues())


if __name__ == "__main__":
    main()
