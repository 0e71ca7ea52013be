"""Worker for the 2-process multi-host integration test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<process_id> <num_processes> <port>``. Each OS process plays one host:
4 virtual CPU devices, gloo cross-process collectives, a global
8-device ("rows",) mesh. Runs the halo-exchange ELL solve end-to-end
and checks the eigenvalues against the dense ground truth.
"""

import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import spectra_tpu.distributed as dist

dist.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
    cpu_devices_per_process=4,
)

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

import spectra_tpu as st
from spectra_tpu.parallel import ShardedEllMatProd
from spectra_tpu.util.rng import SimpleRandom

assert jax.process_count() == nproc, jax.process_count()
n_dev = jax.device_count()
assert n_dev == 4 * nproc, n_dev

mesh = dist.global_row_mesh()

g = 8
lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
n = g * g

# psum sanity over the full process-spanning mesh
from jax.sharding import NamedSharding, PartitionSpec as P

ones = dist.global_put(np.ones(n_dev), NamedSharding(mesh, P("rows")))
total = float(jax.jit(jnp.sum)(ones))
assert total == n_dev, total

op = ShardedEllMatProd.create(A, mesh)
assert op.dists == (-1, 1), op.dists
v0 = dist.global_put(
    SimpleRandom(0).random_vec(n), NamedSharding(mesh, P("rows"))
)

eigs = st.SymEigsSolver(op, nev=2, ncv=8)
eigs.init(v0)
eigs.compute(st.SortRule.SmallestAlge, maxit=300)
assert eigs.info() == st.CompInfo.Successful, eigs.info()

want = np.sort(np.linalg.eigvalsh(A.toarray()))[:2]
got = np.sort(np.asarray(eigs.eigenvalues()))
assert np.allclose(got, want, atol=1e-8), (got, want)

# Distributed shift-invert across the two processes: the inner Krylov
# solve runs over the halo-exchange stencil SpMV, so every inner
# iteration's vectors stay row-sharded across hosts.
from spectra_tpu.parallel import sharded_stencil_shift_solve

si_op = sharded_stencil_shift_solve(A, 0.0, mesh)
si = st.SymEigsShiftSolver.from_factored(si_op, 2, 8, 0.0)
si.init(v0)
nconv = si.compute(st.SortRule.LargestMagn, maxit=100, tol=1e-8)
assert nconv == 2, nconv
got_si = np.sort(np.asarray(si.eigenvalues()))
assert np.allclose(got_si, want, atol=1e-6), (got_si, want)

print(f"MULTIHOST_OK process={pid} devices={n_dev}", flush=True)
