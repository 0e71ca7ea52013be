"""Config-#5 flavor on the callback-free TPU: generalized shift-invert
``A x = lambda B x`` at n = g*g, fully on-device.

A = 2-D grid Laplacian (5-point stencil), B = FEM-style mass matrix
(kron(I, tridiag(1/6, 2/3, 1/6))) — both SPD, both banded (DIA). The
operator is ``(A - sigma B)^{-1} B`` with the B-inner-product Lanczos
(reference: SymGEigsShiftSolver.h:147-205 + SymShiftInvert.h); the
inner solve is geometric multigrid on the (A - sigma B) grid stencil
(sigma=0 keeps it SPD; linalg/multigrid.py — round 2 used the
Chebyshev semi-iteration at ~140x the per-solve cost), one inner
solve per device execution (matvec granularity). Reference
eigenvalues from scipy/ARPACK generalized ``eigsh(A, M=B, sigma=0)``
on the host (SuperLU).

Usage: python scripts/tpu_generalized_1m.py [g ...]   (default 300 1000)
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


def pair(g: int):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()
    m1 = sps.diags([1.0 / 6, 2.0 / 3, 1.0 / 6], [-1, 0, 1], shape=(g, g))
    B = sps.kron(sps.eye(g), m1).tocsr()
    return A, B


def run(g: int):
    A, B = pair(g)
    n = A.shape[0]
    v0 = SimpleRandom(0).random_vec(n)

    t0 = time.perf_counter()
    from scipy.sparse.linalg import eigsh

    w_ref = np.sort(
        eigsh(
            A, k=10, M=B, sigma=0.0, which="LM", tol=1e-10,
            v0=v0, return_eigenvectors=False,
        )
    )
    t_ref = time.perf_counter() - t0

    t0 = time.perf_counter()
    op = st.SymShiftInvert.create(A, B, method="mg").set_shift(0.0)
    bop = st.SparseSymMatProd.from_full(B)
    eigs = st.SymGEigsShiftSolver.from_factored(op, bop, 10, 30, 0.0)
    eigs.set_matvec_granularity(True)
    eigs.init(v0)
    nconv = eigs.compute(st.SortRule.LargestMagn, maxit=50, tol=1e-10)
    dt = time.perf_counter() - t0

    vals = np.sort(np.asarray(eigs.eigenvalues()))
    out = {
        "g": g,
        "n": n,
        "wall_s": round(dt, 2),
        "arpack_host_s": round(t_ref, 2),
        "nconv": int(nconv),
        "info": str(eigs.info()),
        "niter": eigs.num_iterations(),
        "nops": eigs.num_operations(),
    }
    if len(vals) == len(w_ref):
        out["eval_abs_err_vs_arpack"] = float(np.abs(vals - w_ref).max())
        out["eval_rel_err_vs_arpack"] = float(
            (np.abs(vals - w_ref) / np.abs(w_ref)).max()
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["300", "1000"]:
        run(int(arg))
