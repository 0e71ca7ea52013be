"""Distributed execution over TPU device meshes.

The reference is single-process (SURVEY.md section 2.6); this package is
the TPU-native scaling story: the sparse matrix and all n-dimensional
Krylov vectors are **row-partitioned** over a 1-D device mesh, the
replicated ncv-sized small problem stays identical on every device, and
the only cross-device communication is

* the reductions inside the Arnoldi inner products (one psum each), and
* the remote x-entries each SpMV shard references (XLA inserts the
  gather/all-gather over ICI; the DIA format needs only nearest-
  neighbor halos).

Everything flows through GSPMD: we annotate input shardings with
``jax.sharding.NamedSharding`` and let XLA place the collectives — no
hand-written communication (the scaling-book recipe).
"""

from spectra_tpu.parallel.mesh import (
    partition_report,
    row_mesh,
    row_sharded,
    replicated,
    shard_operator,
    shard_problem,
)
from spectra_tpu.parallel.stencil_spmv import (
    ShardedStencilHiLoMatProd,
    ShardedStencilMatProd,
    sharded_stencil_op,
    sharded_stencil_shift_solve,
)
from spectra_tpu.parallel.halo_spmv import (
    HaloPlan,
    ShardedEllMatProd,
    plan_halo_partition,
)

__all__ = [
    "partition_report",
    "row_mesh",
    "row_sharded",
    "replicated",
    "shard_operator",
    "shard_problem",
    "ShardedStencilHiLoMatProd",
    "ShardedStencilMatProd",
    "sharded_stencil_op",
    "sharded_stencil_shift_solve",
    "ShardedEllMatProd",
    "HaloPlan",
    "plan_halo_partition",
]
