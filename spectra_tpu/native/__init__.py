"""Native (C++) host runtime: fast sparse assembly and partitioning.

The TPU compute path is JAX/XLA; this package is the native layer
around it — the counterpart of the reference being C++ throughout
(SURVEY.md section 2 preamble). It compiles
:mod:`spectra_tpu/native/sparse_kernels.cpp` into a shared library on
first use (cached next to the source) and binds it with ctypes; every
entry point has a pure-numpy fallback, so the package works even
without a toolchain.

Provided: COO->CSR assembly with dedup, CSR->ELL / CSR->DIA conversion,
diagonal census, Matrix Market reading, row-partition halo planning,
and a direct-to-DIA 2D Laplacian generator.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sparse_kernels.cpp")
_LIB = os.path.join(_HERE, "libspectra_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def build_and_load(src: str, lib_path: str) -> ctypes.CDLL:
    """mtime-checked ``g++`` build of ``src`` into ``lib_path``, then
    CDLL. The one build recipe for every native library in this package
    (sparse_kernels, dense_eigs); raises on toolchain failure — callers
    own their fallback policy."""
    if not os.path.exists(lib_path) or os.path.getmtime(
        lib_path
    ) < os.path.getmtime(src):
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-pthread",
                "-std=c++17",
                src,
                "-o",
                lib_path,
            ],
            check=True,
            capture_output=True,
        )
    return ctypes.CDLL(lib_path)


def _load():
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            lib = build_and_load(_SRC, _LIB)
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.spectra_coo_to_csr.restype = ctypes.c_int64
        lib.spectra_coo_to_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p, i64p, i64p, f64p,
        ]
        lib.spectra_csr_to_ell.restype = ctypes.c_int64
        lib.spectra_csr_to_ell.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, ctypes.c_int64, i32p, f64p,
        ]
        lib.spectra_csr_diagonals.restype = ctypes.c_int64
        lib.spectra_csr_diagonals.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, i64p,
        ]
        lib.spectra_csr_to_dia.restype = None
        lib.spectra_csr_to_dia.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, ctypes.c_int64, i64p, f64p,
        ]
        lib.spectra_rowpart_halo.restype = ctypes.c_int64
        lib.spectra_rowpart_halo.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, i64p,
        ]
        lib.spectra_read_matrix_market.restype = ctypes.c_int64
        lib.spectra_read_matrix_market.argtypes = [
            ctypes.c_char_p, i64p, i64p, i64p, f64p,
        ]
        lib.spectra_laplacian2d_dia.restype = None
        lib.spectra_laplacian2d_dia.argtypes = [ctypes.c_int64, f64p, i64p]
        lib.spectra_spgemm_nnz.restype = None
        lib.spectra_spgemm_nnz.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p, i32p, i64p,
        ]
        lib.spectra_spgemm_fill.restype = None
        lib.spectra_spgemm_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i32p, f64p, i64p, i32p,
            f64p, i64p, i32p, f64p,
        ]
        lib.spectra_csr_matvec.restype = None
        lib.spectra_csr_matvec.argtypes = [
            ctypes.c_int64, i64p, i32p, f64p, f64p, f64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def coo_to_csr(n_rows, rows, cols, vals):
    """Assemble CSR (indptr, indices, data) from COO with dedup."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    nnz = len(rows)
    lib = _load()
    if lib is None:
        import scipy.sparse as sps

        csr = sps.coo_matrix((vals, (rows, cols)), shape=(n_rows, cols.max() + 1)).tocsr()
        csr.sum_duplicates()
        return csr.indptr.astype(np.int64), csr.indices.astype(np.int64), csr.data
    indptr = np.empty(n_rows + 1, np.int64)
    indices = np.empty(nnz, np.int64)
    data = np.empty(nnz, np.float64)
    out = lib.spectra_coo_to_csr(
        n_rows, nnz, _p(rows, ctypes.c_int64), _p(cols, ctypes.c_int64),
        _p(vals, ctypes.c_double), _p(indptr, ctypes.c_int64),
        _p(indices, ctypes.c_int64), _p(data, ctypes.c_double),
    )
    return indptr, indices[:out].copy(), data[:out].copy()


def csr_to_ell(n_rows, indptr, indices, data, pad_width=0):
    """Padded ELL (cols int32, vals float64) from CSR arrays."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    data = np.ascontiguousarray(data, np.float64)
    lib = _load()
    if lib is None:
        from spectra_tpu.sparse.formats import _ell_arrays_from_csr

        return _ell_arrays_from_csr(indptr, indices, data, n_rows, pad_width or None)
    L = lib.spectra_csr_to_ell(
        n_rows, _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int64),
        _p(data, ctypes.c_double), pad_width, None, None,
    )
    cols = np.zeros((n_rows, L), np.int32)
    vals = np.zeros((n_rows, L), np.float64)
    lib.spectra_csr_to_ell(
        n_rows, _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int64),
        _p(data, ctypes.c_double), pad_width,
        _p(cols, ctypes.c_int32), _p(vals, ctypes.c_double),
    )
    return cols, vals


def csr_to_dia(n_rows, n_cols, indptr, indices, data):
    """Row-aligned DIA (offsets tuple, data (d, n_rows)) from CSR."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    data = np.ascontiguousarray(data, np.float64)
    lib = _load()
    if lib is None:
        import scipy.sparse as sps

        from spectra_tpu.sparse.formats import dia_from_scipy

        csr = sps.csr_matrix((data, indices, indptr), shape=(n_rows, n_cols))
        dia = dia_from_scipy(csr)
        return dia.offsets, np.asarray(dia.data)
    offsets = np.empty(n_rows + n_cols - 1, np.int64)
    nd = lib.spectra_csr_diagonals(
        n_rows, _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int64),
        n_cols, _p(offsets, ctypes.c_int64),
    )
    offsets = np.ascontiguousarray(offsets[:nd])
    out = np.zeros((nd, n_rows), np.float64)
    lib.spectra_csr_to_dia(
        n_rows, _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int64),
        _p(data, ctypes.c_double), nd, _p(offsets, ctypes.c_int64),
        _p(out, ctypes.c_double),
    )
    return tuple(int(o) for o in offsets), out


def rowpart_halo(n_rows, indptr, indices, n_parts):
    """Per-partition halo sizes (distinct remote x-entries) for an
    equal row partition — the ICI communication-volume planner."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    lib = _load()
    if lib is None:
        rows_per = (n_rows + n_parts - 1) // n_parts
        counts = []
        for p in range(n_parts):
            lo, hi = p * rows_per, min(n_rows, (p + 1) * rows_per)
            seg = indices[indptr[lo] : indptr[hi]]
            remote = seg[(seg < lo) | (seg >= hi)]
            counts.append(len(np.unique(remote)))
        return np.asarray(counts, np.int64)
    counts = np.empty(n_parts, np.int64)
    lib.spectra_rowpart_halo(
        n_rows, _p(indptr, ctypes.c_int64), _p(indices, ctypes.c_int64),
        n_parts, _p(counts, ctypes.c_int64),
    )
    return counts


def read_matrix_market(path):
    """Read a real/pattern coordinate .mtx file; returns a scipy CSR."""
    import scipy.sparse as sps

    lib = _load()
    if lib is None:
        from scipy.io import mmread

        return mmread(path).tocsr()
    shape = np.empty(2, np.int64)
    n = lib.spectra_read_matrix_market(
        path.encode(), _p(shape, ctypes.c_int64), None, None, None
    )
    if n == -2:
        from scipy.io import mmread  # complex / unsupported: scipy handles

        return mmread(path).tocsr()
    if n < 0:
        raise IOError(f"failed to parse Matrix Market file {path!r}")
    rows = np.empty(n, np.int64)
    cols = np.empty(n, np.int64)
    vals = np.empty(n, np.float64)
    lib.spectra_read_matrix_market(
        path.encode(), _p(shape, ctypes.c_int64),
        _p(rows, ctypes.c_int64), _p(cols, ctypes.c_int64),
        _p(vals, ctypes.c_double),
    )
    indptr, indices, data = coo_to_csr(int(shape[0]), rows, cols, vals)
    return sps.csr_matrix(
        (data, indices.astype(np.int32), indptr.astype(np.int32)),
        shape=(int(shape[0]), int(shape[1])),
    )


def laplacian2d_dia(g: int):
    """(offsets, data) of the g x g grid Laplacian, direct to DIA."""
    lib = _load()
    n = g * g
    if lib is None:
        import scipy.sparse as sps

        from spectra_tpu.sparse.formats import dia_from_scipy

        l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
        A = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
        dia = dia_from_scipy(A)
        return dia.offsets, np.asarray(dia.data)
    data = np.empty((5, n), np.float64)
    offsets = np.empty(5, np.int64)
    lib.spectra_laplacian2d_dia(g, _p(data, ctypes.c_double), _p(offsets, ctypes.c_int64))
    return tuple(int(o) for o in offsets), data


def spgemm(A, B):
    """C = A @ B for scipy CSR matrices — threaded native Gustavson
    (all host cores) with a scipy fallback. The engine behind the
    Galerkin triple products of the multigrid hierarchy build
    (linalg/multigrid.py::build_level_chain): scipy's single-core
    spgemm made the g=243 north-star hierarchy cost 271 s."""
    import scipy.sparse as sps

    lib = _load()
    if lib is None:
        return (A @ B).tocsr()
    A = A.tocsr()
    B = B.tocsr()
    n_rows, n_mid = A.shape
    n_mid2, n_cols = B.shape
    assert n_mid == n_mid2
    Ap = np.ascontiguousarray(A.indptr, np.int64)
    Aj = np.ascontiguousarray(A.indices, np.int32)
    Ax = np.ascontiguousarray(A.data, np.float64)
    Bp = np.ascontiguousarray(B.indptr, np.int64)
    Bj = np.ascontiguousarray(B.indices, np.int32)
    Bx = np.ascontiguousarray(B.data, np.float64)
    row_nnz = np.empty(n_rows, np.int64)
    lib.spectra_spgemm_nnz(
        n_rows, n_cols, _p(Ap, ctypes.c_int64), _p(Aj, ctypes.c_int32),
        _p(Bp, ctypes.c_int64), _p(Bj, ctypes.c_int32),
        _p(row_nnz, ctypes.c_int64),
    )
    Cp = np.empty(n_rows + 1, np.int64)
    Cp[0] = 0
    np.cumsum(row_nnz, out=Cp[1:])
    nnz = int(Cp[-1])
    Cj = np.empty(nnz, np.int32)
    Cx = np.empty(nnz, np.float64)
    lib.spectra_spgemm_fill(
        n_rows, n_cols, _p(Ap, ctypes.c_int64), _p(Aj, ctypes.c_int32),
        _p(Ax, ctypes.c_double), _p(Bp, ctypes.c_int64),
        _p(Bj, ctypes.c_int32), _p(Bx, ctypes.c_double),
        _p(Cp, ctypes.c_int64), _p(Cj, ctypes.c_int32),
        _p(Cx, ctypes.c_double),
    )
    return sps.csr_matrix((Cx, Cj, Cp), shape=(n_rows, n_cols))


def galerkin_rap(A, P):
    """Galerkin coarse operator P^T A P (threaded; scipy fallback)."""
    AP = spgemm(A, P)
    Pt = P.T.tocsr()
    return spgemm(Pt, AP)


def csr_matvec_builder(A):
    """Return a threaded ``x -> A @ x`` over a scipy CSR (native; scipy
    fallback). Used by the hierarchy build's power iteration."""
    lib = _load()
    A = A.tocsr()
    if lib is None:
        return lambda x: A @ x
    n_rows = A.shape[0]
    Ap = np.ascontiguousarray(A.indptr, np.int64)
    Aj = np.ascontiguousarray(A.indices, np.int32)
    Ax = np.ascontiguousarray(A.data, np.float64)

    def mv(x):
        x = np.ascontiguousarray(x, np.float64)
        y = np.empty(n_rows, np.float64)
        lib.spectra_csr_matvec(
            n_rows, _p(Ap, ctypes.c_int64), _p(Aj, ctypes.c_int32),
            _p(Ax, ctypes.c_double), _p(x, ctypes.c_double),
            _p(y, ctypes.c_double),
        )
        return y

    return mv
