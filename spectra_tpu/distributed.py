"""Multi-process (multi-host) execution.

The reference is strictly single-process (SURVEY.md section 2.6); this
module is the TPU-native scaling entry point it has no counterpart
for: one JAX process per host of a pod slice, a global device mesh
spanning all of them, row-partitioned operators placed shard-by-shard
(no host ever materializes more than its rows), and the same jitted
solver programs running SPMD — GSPMD routes the Arnoldi psums and the
halo ppermutes over ICI within a host's chips and DCN across hosts.

Usage (one process per host):

    import spectra_tpu.distributed as dist
    dist.initialize(coordinator_address="host0:8476",
                    num_processes=N, process_id=i)
    mesh = dist.global_row_mesh()
    op   = ShardedEllMatProd.create(A_csr, mesh)   # halo-planned SpMV
    ...solvers as usual; see docs/SCALING.md for the full runbook.

CPU simulation (the 2-process integration test in
tests/test_multihost.py): pass ``cpu_devices_per_process=k`` and the
module configures the gloo cross-process collective backend — the same
code path then runs N*k-way sharded across OS processes on one box.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
    cpu_devices_per_process=None,
):
    """Connect this process to the distributed runtime.

    On Cloud TPU pods the three arguments are auto-detected from the
    TPU metadata and may be omitted. ``cpu_devices_per_process``
    switches to the CPU backend with gloo collectives (simulation /
    integration testing on ordinary hosts).
    """
    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_row_mesh(axis: str = "rows") -> Mesh:
    """1-D mesh over every device of every connected process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def global_put(array, sharding):
    """Place a (host) array onto a process-spanning sharding.

    Each process materializes only the index-slices its own devices
    hold (``array`` may be anything sliceable — a numpy array, memmap,
    or h5py dataset — so a 100M-row operator never has to fit on one
    host). Single-process callers fall back to ``device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(jax.numpy.asarray(array), sharding)
    shape = array.shape
    return jax.make_array_from_callback(
        shape, sharding, lambda idx: np.asarray(array[idx])
    )


def replicated_to_numpy(arr):
    """Fetch a fully-replicated global array to host numpy."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return np.asarray(arr.addressable_data(0))
    return np.asarray(arr)
