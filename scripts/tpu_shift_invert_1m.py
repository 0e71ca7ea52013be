"""Config-#3 on the callback-free TPU: fully on-device shift-invert.

k=10 eigenvalues nearest sigma=0 of the g x g grid 2-D Laplacian via
SymEigsShiftSolver with the compiled MINRES inner solve over the DIA
stencil (inner rtol coupled to the outer tol). Stages through g to
bound worker risk; writes one JSON line per stage.

Usage: python scripts/tpu_shift_invert_1m.py [g ...]   (default 500 1000)
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

# Honor the parent benchmark's CPU fallback: a wedged remote worker
# HANGS on first device touch, which must fail fast here instead of
# eating this subprocess's whole timeout.
import os as _os

if _os.environ.get("SPECTRA_TPU_BENCH_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import spectra_tpu as st  # noqa: E402
from spectra_tpu.util.rng import SimpleRandom  # noqa: E402


def run(g: int):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    n = A.shape[0]
    v0 = SimpleRandom(0).random_vec(n)

    t0 = time.perf_counter()
    # Geometric-multigrid inner solve (linalg/multigrid.py): ~11
    # V(2,2) cycles / ~0.1 s per stepped operator application at n=1e6
    # on the v5e (launch + solve + step algebra) — vs ~7.4 s/solve for
    # the round-2 Chebyshev semi-iteration (O(sqrt(kappa)) iterations),
    # which remains the validated fallback when the matrix is not a
    # grid stencil. With the split-program stepped path (ONE
    # op-containing program per process, shared by the set_shift trial)
    # the measured warm end-to-end wall is ~55 s; cold adds one
    # ~1-minute emulated-f64 compile.
    op = st.SparseSymShiftSolve.create(A, method="mg").set_shift(0.0)
    eigs = st.SymEigsShiftSolver.from_factored(op, 10, 30, 0.0)
    # One inner solve per device execution: bounds each execution well
    # under the remote worker's watchdog (a whole restart in one
    # execution crashed the round-2 driver bench with the iterative
    # inner solves; with MG it would fit, but the granularity costs
    # only ~25 ms/launch and keeps the safety margin).
    eigs.set_matvec_granularity(True)
    eigs.init(v0)
    nconv = eigs.compute(st.SortRule.LargestMagn, maxit=50, tol=1e-10)
    dt = time.perf_counter() - t0

    vals = np.sort(np.asarray(eigs.eigenvalues()))
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    lam = np.sort((mu[:, None] + mu[None, :]).ravel())[: len(vals)]
    out = {
        "g": g,
        "n": n,
        "wall_s": round(dt, 2),
        "nconv": int(nconv),
        "info": str(eigs.info()),
        "niter": eigs.num_iterations(),
        "nops": eigs.num_operations(),
    }
    if len(vals):
        out["eval_abs_err"] = float(np.abs(vals - lam).max())
        out["eval_rel_err"] = float((np.abs(vals - lam) / lam).max())
    else:
        res = getattr(eigs, "_result", None)
        if res is not None:
            rv = np.asarray(res.values)
            out["raw_ritz_finite"] = int(np.isfinite(rv).sum())
            out["raw_ritz"] = [float(x) for x in rv[:6]]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["500", "1000"]:
        run(int(arg))
