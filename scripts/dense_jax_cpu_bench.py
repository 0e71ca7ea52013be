"""Config #1's pure-XLA driver timed on the HOST CPU backend — the
apples-to-apples row against host ARPACK (both on the same cores).
Run as a subprocess by bench.py (the parent process owns the
accelerator platform and cannot switch). Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

os.environ["SPECTRA_TPU_DENSE_DRIVER"] = "jax"

import spectra_tpu as st  # noqa: E402
from spectra_tpu.util.rng import SimpleRandom  # noqa: E402


def main():
    n, k, m = 1000, 3, 6
    rng = np.random.default_rng(123)
    A = rng.uniform(size=(n, n)) - 0.5
    A = A + A.T
    v0 = SimpleRandom(0).random_vec(n)
    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.init(v0)
    eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
    times = []
    for _ in range(3):
        eigs.init(v0)
        t0 = time.perf_counter()
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times.append(time.perf_counter() - t0)
    print(json.dumps({"jax_cpu_s": min(times), "nconv": int(nconv)}))


if __name__ == "__main__":
    main()
