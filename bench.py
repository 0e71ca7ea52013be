"""Flagship benchmark. Prints ONE JSON line with the headline metric.

Headline (BASELINE.md config #2): wall-time of SymEigsSolver computing
the k=10 largest eigenpairs of the 1M-node 2D grid Laplacian (5-point
stencil, ~5M nnz) at tol 1e-10, fp64, against scipy.sparse.linalg.eigsh
— authentic ARPACK — on the host CPU with identical (k, ncv, tol, v0).
``vs_baseline > 1`` means faster than ARPACK.

Side metrics stored in bench_details.json: SpMV throughput (nnz/s) on
the same operator, residuals, eigenvalue agreement, and the config #1
dense benchmark (largest 3 of a 1000x1000 dense symmetric matrix).
"""

import json
import os
import time

os.environ.setdefault("SPECTRA_TPU_X64", "1")

import numpy as np
import scipy.sparse as sps


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def _bench_spmv(op, v0, nnz, repeats=50):
    import jax

    f = jax.jit(op.perform_op)
    x = jax.block_until_ready(f(v0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / repeats
    return nnz / dt, dt


def _bench_ours_sparse(A, k, m, v0, repeats=3):
    import spectra_tpu as st

    op = st.SparseSymMatProd.from_full(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.init(v0)
    eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)  # warm-up

    times = []
    for _ in range(repeats):
        eigs.init(v0)
        t0 = time.perf_counter()
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times.append(time.perf_counter() - t0)
    vals = np.asarray(eigs.eigenvalues())
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    return min(times), int(nconv), float(resid), vals, op, eigs.num_operations()


def _bench_arpack_sparse(A, k, m, v0, repeats=3):
    try:
        from scipy.sparse.linalg import eigsh
    except ImportError:
        return None, None
    times = []
    w = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        w, _ = eigsh(A, k=k, ncv=m, which="LM", tol=1e-10, maxiter=1000, v0=v0)
        times.append(time.perf_counter() - t0)
    return min(times), w


def _bench_dense_config(details):
    import spectra_tpu as st
    from spectra_tpu.util.rng import SimpleRandom

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
        eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times.append(time.perf_counter() - t0)
    t_ours = min(times)
    t_arpack, _ = _bench_arpack_sparse(sps.csr_matrix(A), k, m, v0)
    details["dense_n1000_k3"] = {
        "ours_s": t_ours,
        "arpack_s": t_arpack,
        "speedup": (t_arpack / t_ours) if t_arpack else None,
    }


def main():
    from spectra_tpu.util.rng import SimpleRandom

    g = 1000  # 1M nodes, ~5M nnz
    k, m = 10, 30
    A = _laplacian_2d(g)
    n = A.shape[0]
    nnz = A.nnz
    v0 = SimpleRandom(0).random_vec(n)

    t_ours, nconv, resid, vals, op, nops = _bench_ours_sparse(A, k, m, v0)
    import jax

    spmv_nnz_s, spmv_t = _bench_spmv(op, jax.numpy.asarray(v0), nnz)
    t_arpack, w_arpack = _bench_arpack_sparse(A, k, m, v0)

    vs_baseline = (t_arpack / t_ours) if t_arpack else float("nan")
    result = {
        "metric": "laplacian2d_1M_k10_walltime",
        "value": round(t_ours, 6),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 4),
    }
    print(json.dumps(result))

    details = {
        **result,
        "n": n,
        "nnz": int(nnz),
        "nconv": nconv,
        "matvec_count": int(nops),
        "residual_inf": resid,
        "arpack_time_s": t_arpack,
        "spmv_nnz_per_s": spmv_nnz_s,
        "spmv_time_s": spmv_t,
        "eigenvalues": [float(x) for x in np.sort(vals)[::-1]],
        "arpack_eigenvalues": [float(x) for x in np.sort(w_arpack)[::-1]]
        if w_arpack is not None
        else None,
        "platform": jax.devices()[0].platform,
    }
    _bench_dense_config(details)
    with open(os.path.join(os.path.dirname(__file__), "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
