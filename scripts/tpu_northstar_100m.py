"""North-star flavor on ONE chip: 100M-nnz Laplacian, k=20 smallest.

BASELINE.json's acceptance run is "k=20 smallest eigenpairs of a
100M-nnz sparse symmetric Laplacian on a v5p-16, matching Spectra to
1e-9". Multi-host hardware is not available in this environment; this
script runs the same problem class END-TO-END on the single v5e:

  * matrix: 3-D 7-point grid Laplacian at g=243 -> n = 14.35M nodes,
    nnz = 100.0M (the 3-D analogue keeps kappa ~ (g/pi)^2 manageable
    at this size; a 2-D matrix with 100M nnz would have kappa ~ 1e7);
  * primary metric: in-loop DIA SpMV nnz/s at 100M nnz;
  * solver: SymEigsShiftSolver at sigma=0 with the geometric-multigrid
    inner solve (O(1) V-cycles per solve), k=20, ncv=40, tol=1e-10,
    **compute_locked**: converged-pair locking + deflated continuation
    rounds so the degenerate 3-D spectrum (permutation multiplicities)
    is captured WITH multiplicity — the certification a single
    restarted Lanczos sequence (ours, ARPACK's, Spectra's) cannot give;
  * validation: eigenvalues vs the analytic spectrum
    lambda_{ijk} = mu_i + mu_j + mu_k, mu_i = 4 sin^2(i pi / 2(g+1)),
    reported as multiplicity-counted prefix agreement; at g<=64 also
    an authentic-ARPACK (scipy eigsh shift-invert) run on the same
    matrix for set-vs-set parity.

HBM budget at g=243 (f64 stored as hi/lo f32 pairs on the v5e; the
row-major (ncv, n) basis pads only the n axis — see docs/SCALING.md):
V 4.59 GB + DIA A 0.80 GB + MG hierarchy ~0.95 GB + ~6 n-vector temps
0.7 GB + locked block (20, n) 2.30 GB/round => ~9.4 GB peak in the
step program, within the 15.75 GB chip. The round-3 OOM was the
(n, ncv) layout's 3.2x tile padding (two padded remat copies alone =
13.7 GB).

Stages through g to bound worker risk; one JSON line per stage.
Usage: python scripts/tpu_northstar_100m.py [g ...]   (default 64 243)
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

import spectra_tpu as st  # noqa: E402
from spectra_tpu.util.rng import SimpleRandom  # noqa: E402


def lap3d(g):
    l1 = sps.diags(
        [-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g), dtype=np.float64
    )
    e = sps.eye(g)
    return (
        sps.kron(sps.kron(l1, e), e)
        + sps.kron(sps.kron(e, l1), e)
        + sps.kron(sps.kron(e, e), l1)
    ).tocsr()


def analytic_smallest(g, k):
    i = np.arange(1, g + 1)
    mu = 4 * np.sin(np.pi * i / (2 * (g + 1))) ** 2
    # smallest k of the 3-D sum spectrum: only small mu contribute
    m = mu[: min(g, 64)]
    lam = (
        m[:, None, None] + m[None, :, None] + m[None, None, :]
    ).ravel()
    return np.sort(lam)[:k]


def spmv_throughput(op, v0, nnz, k_lo=10, k_hi=210):
    import functools

    import jax
    import numpy as np

    # op goes through jit as an ARGUMENT: a closed-over operator's
    # arrays are serialized into the remote compile request, which the
    # compile service rejects at 100M nnz (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(o, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, v: o.perform_op(v) * (1.0 / 12.0), x
        )

    for k in (k_lo, k_hi):
        _ = np.asarray(loop(op, v0, k=k)[0])

    def timed(k, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(loop(op, v0, k=k)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)
    return nnz / dt, dt


def prefix_captured(vals, lam, atol=1e-8):
    """Length of the multiplicity-counted smallest prefix captured."""
    prefix = 0
    for i, v in enumerate(np.sort(np.asarray(vals))):
        if i < len(lam) and abs(v - lam[i]) < atol:
            prefix = i + 1
        else:
            break
    return prefix


def arpack_reference(A, k, ncv, lam):
    """Authentic ARPACK (scipy eigsh shift-invert) on the same matrix:
    the parity baseline for multiplicity capture."""
    import scipy.sparse.linalg as spla

    t0 = time.perf_counter()
    w = spla.eigsh(
        A,
        k=k,
        sigma=0.0,
        which="LM",
        ncv=ncv,
        tol=1e-10,
        return_eigenvectors=False,
        v0=SimpleRandom(0).random_vec(A.shape[0]),
    )
    return {
        "arpack_wall_s": round(time.perf_counter() - t0, 2),
        "arpack_prefix_captured": prefix_captured(np.sort(w), lam),
    }


def run(g: int, k: int = 20, ncv: int | None = None, locked: bool = True):
    if ncv is None:
        # HBM model at the 100M-nnz scale: every f64 program on this
        # runtime pays an input-sized conversion temp (f32-plane
        # split), so the restart rotation peaks at ~3x the basis.
        # ncv=32 keeps V + rotation + locked block + MG resident under
        # the 15.75 GB chip (scripts/hbm_probe.py); smaller stages use
        # the reference-default 2k.
        ncv = 32 if g >= 200 else 40
    import jax.numpy as jnp

    A = lap3d(g)
    n, nnz = A.shape[0], A.nnz
    v0 = SimpleRandom(0).random_vec(n)

    op_a = st.SparseSymMatProd.from_full(A)
    nnz_s, t_spmv = spmv_throughput(op_a, jnp.asarray(v0), nnz)
    del op_a  # free the plain-A DIA (0.8 GB at g=243) before the solve

    t0 = time.perf_counter()
    op = st.SparseSymShiftSolve.create(A, method="mg").set_shift(0.0)
    t_factor = time.perf_counter() - t0

    eigs = st.SymEigsShiftSolver.from_factored(op, k, ncv, 0.0)
    eigs.set_matvec_granularity(True)
    eigs.init(v0)
    t0 = time.perf_counter()
    if locked:
        nconv = eigs.compute_locked(
            st.SortRule.LargestMagn,
            maxit=60,
            tol=1e-10,
            sorting=st.SortRule.SmallestAlge,
            want=st.SortRule.SmallestAlge,
            max_rounds=3,
            # Continuation rounds carry the locked blocks in HBM;
            # shrink their basis so round 2 (two blocks resident)
            # stays on-chip at the 100M-nnz scale (docs/SCALING.md).
            ncv_locked=24 if g >= 200 else None,
        )
    else:
        nconv = eigs.compute(st.SortRule.LargestMagn, maxit=60, tol=1e-10)
    t_solve = time.perf_counter() - t0

    vals = np.sort(np.asarray(eigs.eigenvalues()))
    out = {
        "g": g,
        "n": n,
        "nnz": int(nnz),
        "spmv_gnnz_s": round(nnz_s / 1e9, 2),
        "spmv_s": t_spmv,
        "inner_solver": "mg" if op.method == "mg" else op.method,
        "hierarchy_build_s": round(t_factor, 2),
        "solve_s": round(t_solve, 2),
        "nconv": int(nconv),
        "info": str(eigs.info()),
        "locking_certified": eigs.certified() if locked else None,
        "niter": eigs.num_iterations(),
        "nops": eigs.num_operations(),
    }
    if len(vals):
        lam = analytic_smallest(g, len(vals) + 8)
        nearest = np.abs(vals[:, None] - lam[None, :]).min(axis=1)
        out["eval_err_nearest_analytic"] = float(nearest.max())
        out["smallest_prefix_captured"] = prefix_captured(vals, lam)
        if g <= 64:
            out.update(arpack_reference(A, k, ncv, lam))
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["64", "243"]:
        run(int(arg))
