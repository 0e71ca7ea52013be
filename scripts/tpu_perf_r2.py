"""Round-2 TPU perf exploration (VERDICT item 1).

Phases (run each in its own process — a failed compile poisons the
tunneled PJRT client):

  spmv    - 1M-node Laplacian DIA SpMV, f64 + f32, measured two ways:
            per-call chained through the tunnel (the old methodology,
            dispatch-bound at ~0.4 ms/call) and as K SpMVs inside ONE
            compiled program (the solver's actual usage). Reports
            Gnnz/s and % of the HBM roofline.
  pallas  - same in-program measurement for the Pallas f32 kernel.
  dense1  - BASELINE config #1 (dense 1000x1000, k=3, m=6) with the
            implicit vs thick restart methods.

Usage: python scripts/tpu_perf_r2.py <phase>
"""

import functools
import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

HBM_GBPS = 819.0  # v5e HBM bandwidth


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def _inloop_time(matvec, x, K=100, reps=3):
    """Time K chained SpMVs inside one jitted program; returns s/SpMV."""
    import jax

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        # 0.125 scaling keeps the iterate bounded (lambda_max = 8).
        return jax.lax.fori_loop(
            0, k, lambda i, v: matvec(v) * 0.125, x
        )

    jax.block_until_ready(loop(x, k=K))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, k=K))
        best = min(best, time.perf_counter() - t0)
    return best / K


def _percall_time(matvec, x, K=50):
    import jax

    f = jax.jit(matvec)
    y = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(K):
        y = f(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / K


def _roofline(nnz, n, itemsize):
    """(optimistic, pessimistic) seconds per SpMV at HBM speed.
    optimistic: data + x once + y once; pessimistic: x re-read per
    diagonal (5x for the 5-point stencil)."""
    d = nnz / n
    opt = itemsize * (nnz + 2 * n) / (HBM_GBPS * 1e9)
    pes = itemsize * (2 * nnz + n) / (HBM_GBPS * 1e9)
    return opt, pes


def phase_spmv():
    import jax
    import spectra_tpu as st
    from spectra_tpu.util.rng import SimpleRandom

    g = 1000
    A = _laplacian_2d(g)
    n, nnz = A.shape[0], A.nnz
    out = {"phase": "spmv", "n": n, "nnz": int(nnz)}
    for dtype, name in ((np.float64, "f64"), (np.float32, "f32")):
        op = st.SparseSymMatProd.from_full(A.astype(dtype))
        x = jax.numpy.asarray(SimpleRandom(0).random_vec(n).astype(dtype))
        t_in = _inloop_time(op.perform_op, x)
        t_call = _percall_time(op.perform_op, x)
        opt, pes = _roofline(nnz, n, np.dtype(dtype).itemsize)
        out[name] = {
            "inloop_s": t_in,
            "inloop_gnnz_s": nnz / t_in / 1e9,
            "percall_s": t_call,
            "percall_gnnz_s": nnz / t_call / 1e9,
            "roofline_s_optimistic": opt,
            "roofline_s_pessimistic": pes,
            "pct_of_roofline_optimistic": 100 * opt / t_in,
            "pct_of_roofline_pessimistic": 100 * pes / t_in,
        }
        print(json.dumps(out[name] | {"dtype": name}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


def phase_pallas():
    import jax
    import spectra_tpu  # noqa: F401  (x64 setup)
    from spectra_tpu.ops.dia_pallas import dia_spmv_pallas
    from spectra_tpu.sparse.formats import dia_from_scipy
    from spectra_tpu.util.rng import SimpleRandom

    g = 1000
    A = _laplacian_2d(g)
    n, nnz = A.shape[0], A.nnz
    dia = dia_from_scipy(A.astype(np.float32))
    data = jax.numpy.asarray(dia.data)
    offsets = tuple(dia.offsets)
    x = jax.numpy.asarray(SimpleRandom(0).random_vec(n).astype(np.float32))

    def mv(v):
        return dia_spmv_pallas(data, offsets, v)

    t_in = _inloop_time(mv, x)
    t_call = _percall_time(mv, x)
    opt, pes = _roofline(nnz, n, 4)
    out = {
        "phase": "pallas_f32",
        "inloop_s": t_in,
        "inloop_gnnz_s": nnz / t_in / 1e9,
        "percall_s": t_call,
        "pct_of_roofline_optimistic": 100 * opt / t_in,
        "pct_of_roofline_pessimistic": 100 * pes / t_in,
    }
    print("RESULT " + json.dumps(out), flush=True)


def phase_dense1():
    import spectra_tpu as st
    from spectra_tpu.util.rng import SimpleRandom

    n, k, m = 1000, 3, 6
    rng = np.random.default_rng(123)
    A = rng.uniform(size=(n, n)) - 0.5
    A = A + A.T
    v0 = SimpleRandom(0).random_vec(n)
    out = {"phase": "dense1"}
    for method in ("implicit", "thick"):
        op = st.DenseSymMatProd.create(A)
        eigs = st.SymEigsSolver(op, nev=k, ncv=m)
        eigs.set_restart_method(method)
        eigs.init(v0)
        eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times = []
        for _ in range(3):
            eigs.init(v0)
            t0 = time.perf_counter()
            eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
            times.append(time.perf_counter() - t0)
        out[method] = {
            "best_s": min(times),
            "niter": eigs.num_iterations(),
            "nops": eigs.num_operations(),
            "nconv": int(np.sum(np.isfinite(eigs.eigenvalues()))),
        }
        print(json.dumps({method: out[method]}), flush=True)
    # larger ncv variant: fewer restarts, more MXU per restart
    for m2 in (12, 24):
        op = st.DenseSymMatProd.create(A)
        eigs = st.SymEigsSolver(op, nev=k, ncv=m2)
        eigs.init(v0)
        eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
        times = []
        for _ in range(3):
            eigs.init(v0)
            t0 = time.perf_counter()
            eigs.compute(st.SortRule.LargestMagn, maxit=1000, tol=1e-10)
            times.append(time.perf_counter() - t0)
        out[f"implicit_m{m2}"] = {
            "best_s": min(times),
            "niter": eigs.num_iterations(),
            "nops": eigs.num_operations(),
        }
        print(json.dumps({f"implicit_m{m2}": out[f"implicit_m{m2}"]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    {"spmv": phase_spmv, "pallas": phase_pallas, "dense1": phase_dense1}[
        sys.argv[1]
    ]()
