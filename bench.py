"""Flagship benchmark. Prints ONE JSON line with the headline metric.

Current headline (BASELINE.md config #1 + #2): wall-time of
SymEigsSolver on the README example (largest 3 eigenvalues of a
1000x1000 dense random symmetric matrix, fp64, tol 1e-10), compared to
scipy.sparse.linalg.eigsh — i.e. authentic ARPACK — solving the same
problem on the host CPU with the same (k, ncv, tol) and the same
starting vector. vs_baseline > 1 means we are faster than ARPACK.

Run on whatever platform JAX selects (the real TPU under the driver).
"""

import json
import os
import time

os.environ.setdefault("SPECTRA_TPU_X64", "1")

import numpy as np


def _build_problem(n=1000, seed=123):
    rng = np.random.default_rng(seed)
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _bench_ours(A, k, m, v0, repeats=3):
    import jax
    import spectra_tpu as st

    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)

    # Warm-up (compile)
    eigs.init(v0)
    eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)

    times = []
    for _ in range(repeats):
        eigs.init(v0)
        t0 = time.perf_counter()
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times.append(time.perf_counter() - t0)
    vals = np.asarray(eigs.eigenvalues())
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    return min(times), int(nconv), float(resid), vals


def _bench_arpack(A, k, m, v0, repeats=3):
    try:
        from scipy.sparse.linalg import eigsh
    except ImportError:
        return None, None
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        w, v = eigsh(A, k=k, ncv=m, which="LM", tol=1e-10, maxiter=1000, v0=v0)
        times.append(time.perf_counter() - t0)
    return min(times), w


def main():
    n, k, m = 1000, 3, 6
    A = _build_problem(n)

    from spectra_tpu.util.rng import SimpleRandom

    v0 = SimpleRandom(0).random_vec(n)

    t_ours, nconv, resid, vals = _bench_ours(A, k, m, v0)
    t_arpack, w_arpack = _bench_arpack(A, k, m, v0)

    vs_baseline = (t_arpack / t_ours) if t_arpack else float("nan")
    result = {
        "metric": "sym_eigs_dense_n1000_k3_walltime",
        "value": round(t_ours, 6),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 4),
    }
    print(json.dumps(result))
    # Diagnostics on stderr-adjacent extra lines are not allowed; keep
    # the single JSON line contract and stash details in a side file.
    details = {
        **result,
        "nconv": nconv,
        "residual_inf": resid,
        "arpack_time_s": t_arpack,
        "eigenvalues": [float(x) for x in vals],
        "arpack_eigenvalues": [float(x) for x in np.sort(w_arpack)[::-1]]
        if w_arpack is not None
        else None,
    }
    with open(os.path.join(os.path.dirname(__file__), "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
