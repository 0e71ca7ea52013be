"""Routing shim: dense f64 standard eigenproblems -> native C++ driver.

Small dense problems are dispatch-bound on accelerators (the ncv-sized
restart machinery is sequential) and per-op-overhead-bound on the XLA
CPU backend; the native Krylov-Schur driver
(:mod:`spectra_tpu.native.dense_eigs`) runs them at BLAS/LAPACK speed.
Routed automatically for ``DenseSymMatProd``/``DenseGenMatProd``
operators with real f64 matrices and no B-operator, transform, restart
segmentation, or checkpoint resume; ``SPECTRA_TPU_DENSE_DRIVER``
(``auto``/``native``/``jax``) overrides.

This mirrors the reference's positioning: its entire benchmark surface
(reference: benchmark/main.cpp:109-125) is native-code dense solves.
"""

import os

import numpy as np

from spectra_tpu.util import dtypes as _dt
from spectra_tpu.util.selection import SortRule, argsort_np

# Problems larger than this stay on the jitted path (MXU wins on big
# dense matvecs; the native driver targets the reference's small-dense
# benchmark regime).
_MAX_N = 8192


def _dense_mat(op):
    from spectra_tpu.matop.dense import DenseGenMatProd, DenseSymMatProd

    if isinstance(op, (DenseSymMatProd, DenseGenMatProd)):
        return np.asarray(op.mat)
    return None


_MISSING = object()


def _cached_mat(solver):
    """Host copy of the dense operator matrix, fetched once per solver
    (on remote accelerators the device->host transfer dominates a small
    solve; the matrix never changes after construction)."""
    mat = getattr(solver, "_native_mat_cache", _MISSING)
    if mat is _MISSING:
        mat = _dense_mat(solver._op)
        solver._native_mat_cache = mat
    return mat


def eligible(solver, sym: bool) -> bool:
    mode = os.environ.get("SPECTRA_TPU_DENSE_DRIVER", "auto")
    if mode == "jax":
        return False
    if solver._restart_chunk is not None:
        return False
    if getattr(solver, "_resume_carry", None) is not None:
        return False
    if type(solver)._ritz_transform is not None:
        return False
    if getattr(solver, "_has_bop", False):
        return False
    if getattr(solver, "_locking_round", False):
        # Deflated continuation rounds orthogonalize against a locked
        # block through the ArnoldiOp seam — the native driver has no
        # deflation; route to the jitted path.
        return False
    mat = _cached_mat(solver)
    if mat is None or mat.dtype != np.float64 or mat.ndim != 2:
        return False
    if mat.shape[0] > _MAX_N and mode != "native":
        return False
    from spectra_tpu.native import dense_eigs as nd

    return nd.available()


def compute(solver, sym: bool, selection: SortRule, maxit, tol, sorting):
    """Run the native driver; returns an IRLM/IRAM-shaped result or
    None (caller falls back to the jitted path)."""
    from spectra_tpu.native import dense_eigs as nd

    mat = _cached_mat(solver)
    v0 = getattr(solver, "_v0_host", None)
    if v0 is None:
        v0 = np.asarray(solver._v0)
    out = nd.dense_eigs(
        mat,
        solver._nev,
        solver._ncv,
        selection.value,
        sym,
        float(tol),
        int(maxit),
        np.asarray(v0, np.float64),
    )
    if out is None:
        return None

    nev = solver._nev
    values = out["values"]
    vectors = out["vectors"]
    est = out["ritz_est"]
    eps23 = _dt.eps23(np.float64)
    conv = est < float(tol) * np.maximum(eps23, np.abs(values))

    if sym:
        values = values.real
        vectors = vectors.real
    ind = argsort_np(sorting, values)
    values, vectors, conv = values[ind], vectors[:, ind], conv[ind]

    if sym:
        from spectra_tpu.solvers._herm_core import IRLMResult as Result
    else:
        from spectra_tpu.solvers._gen_core import IRAMResult as Result

    kw = {}
    if "f" in Result._fields:
        kw["f"] = np.zeros((mat.shape[0],), vectors.dtype)
    return Result(
        values=values,
        vectors_small=np.eye(nev, dtype=vectors.dtype),
        conv=conv,
        nconv=np.int32(out["nconv"]),
        niter=np.int32(out["niter"]),
        nops=np.int64(out["nops"]),
        V=vectors.T,
        **kw,
    )
