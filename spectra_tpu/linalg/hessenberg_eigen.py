"""Eigen-decomposition of the (small, replicated) upper Hessenberg H.

Counterpart of the reference's UpperHessenbergEigen / UpperHessenbergSchur
(reference: include/Spectra/LinAlg/UpperHessenbergEigen.h:33-454,
UpperHessenbergSchur.h:30-456), which delegate the numerics to Eigen's
RealSchur/ComplexSchur machinery.

XLA has no nonsymmetric eigensolver on TPU, and this is an ncv-by-ncv
*replicated* problem that sits on the latency path, not the throughput
path — exactly the part ARPACK also solves redundantly on every rank.
We bridge it to the host LAPACK (``numpy.linalg.eig``) through
``jax.pure_callback``: deterministic, identical on every host, and the
(ncv, ncv) payload is microscopic next to the sharded n-dimension
arrays. LAPACK's dgeev returns complex-conjugate eigenpairs *exactly*
conjugate and adjacent, the property the restart pairing logic relies
on (reference: GenEigsBase.h:55-56 uses the same exact-conjugacy
invariant from its own Schur code).
"""

import os

import numpy as np
import jax

from spectra_tpu.util import dtypes

from spectra_tpu.util.capabilities import host_callbacks_supported  # noqa: F401
# (re-exported: earlier revisions defined the probe here)


def _host_eig(H):
    w, v = np.linalg.eig(H)
    return w, v


def hessenberg_eigen_lapack(H):
    """Host LAPACK bridge via ``pure_callback`` (CPU and
    callback-capable runtimes)."""
    m = H.shape[0]
    cdtype = dtypes.complex_dtype(H.dtype)
    out = (
        jax.ShapeDtypeStruct((m,), cdtype),
        jax.ShapeDtypeStruct((m, m), cdtype),
    )

    def cb(Hh):
        w, v = _host_eig(np.asarray(Hh))
        return w.astype(cdtype), v.astype(cdtype)

    return jax.pure_callback(cb, out, H)


def hessenberg_eigen(H):
    """Eigenvalues and unit-norm eigenvectors of a Hessenberg matrix.

    Returns ``(evals (m,), evecs (m, m))``, both complex; for real H
    complex-conjugate pairs are exact and adjacent.

    Backend selection (trace-time): ``SPECTRA_TPU_EIGEN_BACKEND`` =
    ``lapack`` | ``native`` | ``auto`` (default). ``auto`` bridges to
    host LAPACK only on the CPU backend, where the callback is a plain
    function call: dgeev on an ncv-sized H costs ~0.1 ms while the
    in-jit Francis pipeline costs ~1.6 ms at m=20 on XLA-CPU
    (sequential deflation sweeps fight the compiler), and the
    extraction runs once per restart — measured end-to-end this halves
    the gen-solver wall time at n=100. On accelerators a per-restart
    ``pure_callback`` is a device->host->device round trip inside the
    compiled loop, so ``auto`` keeps the fully on-device native
    pipeline there (also the only option on callback-free runtimes);
    ``lapack`` forces the bridge for callback-capable accelerators.
    """
    backend = os.environ.get("SPECTRA_TPU_EIGEN_BACKEND", "auto")
    if backend == "lapack" or (
        backend == "auto"
        and host_callbacks_supported()
        and jax.default_backend() == "cpu"
    ):
        return hessenberg_eigen_lapack(H)
    from spectra_tpu.linalg.schur import hessenberg_eigen_native

    return hessenberg_eigen_native(H)
