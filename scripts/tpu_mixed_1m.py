"""Mixed-precision bench (subprocess-contained): n=1M banded matrix,
k=10 largest, set_precision('mixed') vs the same solve all-f64.
Prints one JSON line. Run by bench.py in a child process with a
timeout — a worker crash must not poison the parent's entries."""

import functools
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


def main(n=1_000_000, k=10):
    # Validity envelope of the mode: the f32 iteration resolves
    # relative gaps down to ~eps_f32; give the wanted top-k ~5%
    # separations (the engineering-workload regime the mode is for —
    # a spectrum with sub-1e-6 relative gaps needs the f64 path).
    d = np.linspace(1.0, 100.0, n)
    d[-k:] = 100.0 * 1.05 ** np.arange(1, k + 1)
    A = sps.diags(
        [np.full(n, 0.25), np.full(n, 0.5), d, np.full(n, 0.5),
         np.full(n, 0.25)],
        [-1000, -1, 0, 1, 1000], shape=(n, n), format="csr",
    )
    v0 = SimpleRandom(0).random_vec(n)

    def run(precision, tol):
        op = st.SparseSymMatProd.from_full(A)
        s = st.SymEigsSolver(op, nev=k, ncv=30)
        s.set_precision(precision)
        # Warm once (compile), then time a fresh solve: both modes pay
        # one-time executable builds that are NOT the per-solve cost.
        s.init(v0)
        s.compute(st.SortRule.LargestAlge, maxit=500, tol=tol)
        s.init(v0)
        t0 = time.perf_counter()
        nconv = s.compute(st.SortRule.LargestAlge, maxit=500, tol=tol)
        wall = time.perf_counter() - t0
        return nconv, wall, np.sort(np.asarray(s.eigenvalues()))[::-1], s

    nc_m, wall_m, vals_m, s_m = run("mixed", 1e-6)
    nc_d, wall_d, vals_d, _ = run("double", 1e-10)
    kk = min(nc_m, nc_d)
    err = float(np.abs(vals_m[:kk] - vals_d[:kk]).max()) if kk else None
    rep = s_m.mixed_report()
    print(
        json.dumps(
            {
                "n": n,
                "nnz": int(A.nnz),
                "nconv_mixed": int(nc_m),
                "wall_mixed_s": wall_m,
                "wall_double_s": wall_d,
                "speedup_vs_double": wall_d / wall_m if wall_m else None,
                "eval_err_vs_double": err,
                "max_resid_f64": float(np.max(rep["resid_f64"]))
                if len(rep["resid_f64"])
                else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    # Default 250k: the 1M f32 twin solve crashed the remote worker
    # once ("kernel fault"; recovery took hours) — the same measured
    # worker ceiling the Davidson entry documents. Pass n explicitly
    # to probe larger sizes on robust runtimes.
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 250_000)
