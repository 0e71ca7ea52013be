"""ctypes binding for the native dense-CPU Krylov-Schur driver.

BLAS/LAPACK function pointers are pulled out of scipy's
``cython_blas``/``cython_lapack`` PyCapsules at load time and handed to
the C++ library — the native code has no link-time BLAS dependency and
always uses the same (fast, threaded) BLAS as the scipy/ARPACK
baseline it is benchmarked against.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dense_eigs.cpp")
_LIB = os.path.join(_HERE, "libspectra_dense.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _capsule_ptr(module, name):
    cap = module.__pyx_capi__[name]
    get_name = ctypes.pythonapi.PyCapsule_GetName
    get_name.restype = ctypes.c_char_p
    get_name.argtypes = [ctypes.py_object]
    get_ptr = ctypes.pythonapi.PyCapsule_GetPointer
    get_ptr.restype = ctypes.c_void_p
    get_ptr.argtypes = [ctypes.py_object, ctypes.c_char_p]
    return get_ptr(cap, get_name(cap))


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            from spectra_tpu.native import build_and_load

            lib = build_and_load(_SRC, _LIB)
            from scipy.linalg import cython_blas, cython_lapack

            fns = (ctypes.c_void_p * 8)(
                _capsule_ptr(cython_blas, "dgemv"),
                _capsule_ptr(cython_blas, "dgemm"),
                _capsule_ptr(cython_blas, "ddot"),
                _capsule_ptr(cython_blas, "dnrm2"),
                _capsule_ptr(cython_lapack, "dgees"),
                _capsule_ptr(cython_lapack, "dtrsen"),
                _capsule_ptr(cython_lapack, "dsyev"),
                _capsule_ptr(cython_lapack, "dtrevc"),
            )
            lib.spectra_dense_eigs_init(fns)
            f64p = ctypes.POINTER(ctypes.c_double)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.spectra_dense_eigs.restype = ctypes.c_int
            lib.spectra_dense_eigs.argtypes = [
                f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_int, f64p,
                f64p, f64p, f64p, f64p, i64p,
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError, KeyError, ImportError):
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def dense_eigs(A, nev, ncv, rule: int, sym: bool, tol: float, maxit: int, v0):
    """Run the native Krylov-Schur solve; returns a result dict or None
    if the native library is unavailable / reported a failure."""
    lib = _load()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, np.float64)
    v0 = np.ascontiguousarray(v0, np.float64)
    n = A.shape[0]
    evals_re = np.empty(ncv, np.float64)
    evals_im = np.empty(ncv, np.float64)
    evecs = np.empty((nev, n), np.complex128)  # (re, im) interleaved
    est = np.empty(nev, np.float64)
    stats = np.zeros(3, np.int64)
    rc = lib.spectra_dense_eigs(
        _p(A), n, nev, ncv, rule, int(sym), tol, maxit, _p(v0),
        _p(evals_re), _p(evals_im), evecs.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)
        ), _p(est), stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return {
        "values": evals_re[:nev] + 1j * evals_im[:nev],
        "vectors": evecs.T.copy(),  # (n, nev) complex
        "ritz_est": est,
        "nconv": int(stats[0]),
        "niter": int(stats[1]),
        "nops": int(stats[2]),
    }
