"""Roofline attribution probe for the DIA SpMV (VERDICT item 1).

Measures, with the same in-loop difference methodology as bench.py:
  * pure streaming bandwidth (y = x * c on f32 vectors of several sizes)
  * a 2-array saxpy (y = a*x + y)
  * the XLA DIA SpMV at g=1000 (n=1e6) and g=2000 (n=4e6)

If streaming tops out near the SpMV's effective bandwidth, the SpMV is
at the machine's achievable-bandwidth roofline (not the paper one) and
further kernel work is pointless; if streaming is much faster, the gap
is the kernel's to close.
"""

import functools
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import spectra_tpu  # noqa: F401,E402
from spectra_tpu.sparse.formats import dia_from_scipy, DiaMatrix  # noqa: E402


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def inloop_time(step, x, K=200, reps=3):
    """Per-iteration time of x -> step(x) chained k times in one jit.

    k is a *traced* argument: a dynamic-trip-count while loop cannot be
    unrolled/fused away by XLA (a static trip count lets XLA collapse
    trivial bodies into one pass, which reports infinite bandwidth).
    """

    @jax.jit
    def loop(x, k):
        out = jax.lax.fori_loop(
            0, k, lambda i, v: step(v), x, unroll=False
        )
        return out.ravel()[0]

    for k in (10, K):
        # scalar fetch: block_until_ready on this PJRT plugin
        # acknowledges enqueue, not completion
        float(loop(x, jnp.int32(k)))

    def timed(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(x, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(K) - timed(10)) / (K - 10)


def main():
    rng = np.random.default_rng(0)
    print("== pure streaming: y = x * 0.999 (read+write) ==", flush=True)
    for mb in (4, 16, 64, 256):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.normal(size=n).astype(np.float32))
        t = inloop_time(lambda v: v * 0.999, x)
        bw = 2 * n * 4 / t / 1e9
        print(f"  {mb:4d} MB  {t * 1e6:8.1f} us/iter  {bw:7.1f} GB/s", flush=True)

    print("== 2D-layout streaming: (R,128) * 0.999 ==", flush=True)
    n = 64 * 1024 * 1024 // 4
    x2 = jnp.asarray(rng.normal(size=(n // 128, 128)).astype(np.float32))
    t = inloop_time(lambda v: v * 0.999, x2)
    print(f"  64 MB 2D {t * 1e6:8.1f} us/iter  {2 * n * 4 / t / 1e9:7.1f} GB/s",
          flush=True)

    print("== DIA SpMV (XLA lowering), f32 ==", flush=True)
    for g in (1000, 2000):
        A = _laplacian_2d(g)
        dia = dia_from_scipy(A.astype(np.float32))
        dm = DiaMatrix(
            data=jnp.asarray(dia.data),
            offsets=tuple(int(o) for o in dia.offsets),
            n_rows=A.shape[0],
            n_cols=A.shape[0],
        )
        x = jnp.asarray(rng.normal(size=A.shape[0]).astype(np.float32))
        t = inloop_time(lambda v: dm.matvec(v) * 0.125, x, K=100)
        nnz = A.nnz
        # traffic: 5 diagonals + x + y (+ scale pass fused)
        bytes_ = (5 + 2) * A.shape[0] * 4
        print(
            f"  g={g}  {t * 1e6:8.1f} us/iter  {nnz / t / 1e9:7.2f} Gnnz/s  "
            f"eff-bw {bytes_ / t / 1e9:7.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
