"""AOT HBM probe: check the north-star-scale step programs fit a v5e
WITHOUT burning TPU hours.

Compiles the stepped split programs (step finish, operator apply,
restart compress) for an abstract v5e device via
``jax.experimental.topologies`` at the requested problem size and
prints each program's memory analysis — or its compile-time OOM. This
is how the round-4 locked-round OOMs were diagnosed preemptively
(widened-basis reorth: 16.04 GB of 15.75 at q=20; the operator-level
deflation that replaced it fits).

The gemv backend gate is patched to the TPU branch (trace-time
``jax.default_backend()`` would report cpu in this process and route
reductions to the MXU dot the real run never takes).

Usage: python scripts/hbm_probe.py [g [ncv [q...]]]   (default 243 40 0 20 40)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import spectra_tpu  # noqa: E402,F401
import jax.numpy as jnp  # noqa: E402
from spectra_tpu.ops import gemv  # noqa: E402

gemv._lane_friendly = lambda *arrays: any(
    jnp.dtype(a.dtype).itemsize >= 8 for a in arrays
)

from jax.experimental import topologies  # noqa: E402
from spectra_tpu.linalg import krylov  # noqa: E402
from spectra_tpu.matop.arnoldi_op import (  # noqa: E402
    ArnoldiOp,
    LockedArnoldiOp,
)
from spectra_tpu.matop.sparse import SparseSymMatProd  # noqa: E402
from spectra_tpu.solvers import _herm_core as core  # noqa: E402
from spectra_tpu.sparse.formats import DiaMatrix  # noqa: E402
from spectra_tpu.util.selection import SortRule  # noqa: E402


def report(name, lowered):
    try:
        ma = lowered.compile().memory_analysis()
        print(
            f"{name:28s} arg {ma.argument_size_in_bytes / 2**30:6.2f}G  "
            f"out {ma.output_size_in_bytes / 2**30:6.2f}G  "
            f"alias {ma.alias_size_in_bytes / 2**30:6.2f}G  "
            f"temp {ma.temp_size_in_bytes / 2**30:6.2f}G  "
            f"peak~ {(ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 2**30:6.2f}G"
        )
    except Exception as err:
        msg = repr(err).replace("\\n", " ")[:160]
        print(f"{name:28s} FAIL {msg}")


def main(g=243, ncv=40, qs=(0, 20, 40)):
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2"
    )
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])
    n = g**3

    def sds(*shape, dt=np.float64):
        return jax.ShapeDtypeStruct(shape, dt, sharding=sh)

    # The DIA 7-point stencil stands in for the MG-op level-0 matrix;
    # the op-free step programs never call perform_op, and for apply it
    # bounds the SpMV part (V-cycle adds the coarser levels, ~30%).
    dia = DiaMatrix(
        data=sds(7, n),
        offsets=(-g * g, -g, -1, 0, 1, g, g * g),
        n_rows=n,
        n_cols=n,
    )
    op = SparseSymMatProd(ell=dia)
    state = krylov.KrylovState(
        V=sds(ncv, n), H=sds(ncv, ncv), f=sds(n), beta=sds(),
        k=sds(dt=np.int32), nops=sds(dt=np.int64),
        key=jax.ShapeDtypeStruct((2,), np.uint32, sharding=sh),
    )
    fin = jax.jit(
        krylov.split_step_finish,
        static_argnames=("mode", "defer_deflate"),
        donate_argnums=(1, 2),
    )
    app = jax.jit(lambda a, x: a.perform_op(x))
    print(f"g={g} n={n} ncv={ncv}  (v5e HBM ~15.75G usable)")
    for q in qs:
        arnop = (
            ArnoldiOp.create(op)
            if q == 0
            else LockedArnoldiOp(inner=ArnoldiOp.create(op), locked=sds(q, n))
        )
        # The real stepped driver defers deflation to its own program.
        report(
            f"step_finish q={q}",
            fin.lower(
                arnop, state, sds(n), sds(dt=np.int32),
                jax.ShapeDtypeStruct((), np.bool_, sharding=sh),
                sds(dt=np.int64), mode="lanczos", defer_deflate=True,
            ),
        )
        report(f"apply q={q}", app.lower(arnop, sds(n)))
        if q:
            report(
                f"deflate_f q={q}",
                core._deflate_f.lower(arnop, sds(n)),
            )
        # The stepped driver's restart: replicated plan + chunked
        # rotation + finish (stepped_restart_split pieces).
        report(
            f"rotate_chunk q={q}",
            core._rotate_chunk.lower(
                sds(ncv, n), sds(ncv, n), sds(ncv, ncv), j0=0, nc=8
            ),
        )
        report(
            f"compress_finish q={q}",
            core._compress_finish.lower(
                arnop, state, sds(ncv, n), sds(ncv, ncv), sds(ncv, ncv),
                sds(dt=np.int32),
            ),
        )


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(
        g=a[0] if a else 243,
        ncv=a[1] if len(a) > 1 else 40,
        qs=tuple(a[2:]) if len(a) > 2 else (0, 20, 40),
    )
