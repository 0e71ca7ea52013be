"""One-shot TPU validation batch — run on the real chip after changes.

Covers every runtime-adaptive path end-to-end on the accelerator:
capability probes, symmetric dense/sparse solves, gen solver through
the host-driven loop, on-device MINRES shift-invert, the Pallas DIA
kernel (compiled), and SpMV throughput. Prints one line per check.

Usage: python scripts/tpu_validation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SPECTRA_TPU_X64", "1")

import numpy as np
import scipy.sparse as sps


def main():
    import jax
    import jax.numpy as jnp

    import spectra_tpu as st
    from spectra_tpu.util.capabilities import (
        complex_supported,
        host_callbacks_supported,
    )

    dev = jax.devices()[0]
    print(f"platform={dev.platform} callbacks={host_callbacks_supported()} "
          f"complex={complex_supported()}", flush=True)

    # 1. symmetric dense
    rng = np.random.RandomState(123)
    A = rng.uniform(size=(300, 300)) - 0.5
    A = A + A.T
    e = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=4, ncv=16)
    e.init()
    e.compute(st.SortRule.LargestMagn)
    v, u = e.eigenvalues(), np.asarray(e.eigenvectors())
    print(f"sym dense: {e.info().name} resid={np.abs(A@u-u*v[None,:]).max():.2e}",
          flush=True)

    # 2. sparse DIA + solver
    g = 64
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    L = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
    op = st.SparseSymMatProd.from_full(L)
    e2 = st.SymEigsSolver(op, nev=4, ncv=16)
    e2.init()
    e2.compute(st.SortRule.LargestMagn)
    v2, u2 = e2.eigenvalues(), np.asarray(e2.eigenvectors())
    print(f"sparse DIA: {e2.info().name} resid={np.abs(L@u2-u2*v2[None,:]).max():.2e}",
          flush=True)

    # 3. gen solver (host-driven on complex-free accelerators)
    G = rng.uniform(size=(200, 200)) - 0.5
    e3 = st.GenEigsSolver(st.DenseGenMatProd.create(G), nev=5, ncv=20)
    e3.init()
    e3.compute(st.SortRule.LargestMagn)
    v3, u3 = e3.eigenvalues(), np.asarray(e3.eigenvectors())
    print(f"gen: {e3.info().name} resid={np.abs(G@u3-u3*v3[None,:]).max():.2e}",
          flush=True)

    # 3b. gen solver with Krylov-Schur restarting (device factorize +
    # host ordered-Schur truncation; real arithmetic only on-chip)
    e3b = st.GenEigsSolver(st.DenseGenMatProd.create(G), nev=5, ncv=20)
    e3b.init()
    e3b.set_restart_method("krylov_schur")
    e3b.compute(st.SortRule.LargestMagn)
    v3b, u3b = e3b.eigenvalues(), np.asarray(e3b.eigenvectors())
    print(
        f"gen-ks: {e3b.info().name} "
        f"resid={np.abs(G@u3b-u3b*v3b[None,:]).max():.2e} "
        f"niter={e3b.num_iterations()} (implicit: {e3.num_iterations()})",
        flush=True,
    )

    # 4. sparse shift-invert (auto -> minres without callbacks)
    S = sps.random(300, 300, density=0.05, random_state=np.random.RandomState(5))
    S = (S + S.T).tocsr()
    e4 = st.SymEigsShiftSolver(
        st.SparseSymShiftSolve.create(S), nev=4, ncv=16, sigma=0.0
    )
    e4.init()
    e4.compute(st.SortRule.LargestMagn)
    v4, u4 = e4.eigenvalues(), np.asarray(e4.eigenvectors())
    print(f"shift-invert: {e4.info().name} resid={np.abs(S@u4-u4*v4[None,:]).max():.2e}",
          flush=True)

    # 4b. thick restart (TRLan) on device
    e5 = st.SymEigsSolver(op, nev=4, ncv=16)
    e5.set_restart_method("thick")
    e5.init()
    e5.compute(st.SortRule.LargestMagn)
    v5, u5 = e5.eigenvalues(), np.asarray(e5.eigenvectors())
    lap_np = L.toarray() if hasattr(L, "toarray") else L
    print(
        f"thick restart: {e5.info().name} "
        f"resid={np.abs(lap_np@u5-u5*v5[None,:]).max():.2e}",
        flush=True,
    )

    # 5. Pallas DIA kernel (compiled) vs XLA matvec
    from spectra_tpu.ops import dia_spmv_pallas
    from spectra_tpu.sparse import dia_from_scipy

    for dt in (np.float32, np.float64):
        try:
            dia = dia_from_scipy(L, dtype=dt)
            x = jnp.asarray(rng.uniform(size=g * g).astype(dt))
            y = np.asarray(dia_spmv_pallas(dia.data, dia.offsets, x, chunk=4096))
            ref = np.asarray(dia.matvec(x))
            print(f"pallas {np.dtype(dt).name}: err={np.abs(y-ref).max():.2e}",
                  flush=True)
        except Exception as err:
            print(f"pallas {np.dtype(dt).name}: FAIL {str(err)[:90]}", flush=True)

    # 6. SpMV throughput at 1M
    g = 1000
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    L = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
    op = st.SparseSymMatProd.from_full(L)
    f = jax.jit(op.perform_op)
    x = jnp.asarray(np.random.default_rng(0).normal(size=g * g))
    x = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(50):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / 50
    print(f"spmv 1M fp64: {L.nnz/dt/1e9:.2f} Gnnz/s", flush=True)

    # f32 variant
    op32 = st.SparseSymMatProd.from_full(L, dtype=np.float32)
    f32 = jax.jit(op32.perform_op)
    x32 = jnp.asarray(np.random.default_rng(0).normal(size=g * g).astype(np.float32))
    x32 = jax.block_until_ready(f32(x32))
    t0 = time.perf_counter()
    for _ in range(50):
        x32 = f32(x32)
    jax.block_until_ready(x32)
    dt = (time.perf_counter() - t0) / 50
    print(f"spmv 1M fp32: {L.nnz/dt/1e9:.2f} Gnnz/s", flush=True)

    # Pallas f32 at 1M
    try:
        dia32 = dia_from_scipy(L, dtype=np.float32)
        fp = jax.jit(
            lambda v: dia_spmv_pallas(dia32.data, dia32.offsets, v, chunk=65536)
        )
        xp = jax.block_until_ready(fp(x32))
        t0 = time.perf_counter()
        for _ in range(50):
            xp = fp(xp)
        jax.block_until_ready(xp)
        dt = (time.perf_counter() - t0) / 50
        print(f"pallas spmv 1M fp32: {L.nnz/dt/1e9:.2f} Gnnz/s", flush=True)
    except Exception as err:
        print(f"pallas 1M: FAIL {str(err)[:90]}", flush=True)


if __name__ == "__main__":
    main()
