"""spectra_tpu — a TPU-native sparse eigensolver framework.

A from-scratch JAX/XLA/Pallas implementation of the capability set of
Spectra (the C++/Eigen "redesigned ARPACK"): implicitly restarted
Lanczos/Arnoldi for k extremal or interior eigenpairs of large matrices
defined only by a matvec, shift-and-invert, generalized symmetric
problems in five spectral-transform modes, Hermitian and general complex
solvers, Jacobi-Davidson with DPR correction, and partial SVD.

Unlike the single-process reference, the hot SpMV loop runs on sparse
matrices row-partitioned across a TPU device mesh, while the small dense
ncv-by-ncv subproblems run replicated and fully jit-compiled.

Double precision (the reference's native precision) is enabled by
default; set the environment variable SPECTRA_TPU_X64=0 before import to
keep JAX's default float32.
"""

import os as _os

if _os.environ.get("SPECTRA_TPU_X64", "1") == "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

if _os.environ.get("SPECTRA_TPU_COMPILATION_CACHE", "1") != "0":
    # Persistent XLA compilation cache. Programs at n ~ 1e6 take 1-4
    # minutes EACH to compile through the emulated-f64 TPU pipeline
    # (measured: the multigrid inner solve 42 s, a Lanczos step 123 s);
    # the cache cuts repeat-process cost to seconds (measured 42.5 s ->
    # 10.4 s). Never overrides a user/JAX-env-configured cache dir; set
    # SPECTRA_TPU_COMPILATION_CACHE=0 to opt out entirely.
    import jax as _jax

    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(
                    _os.path.expanduser("~"), ".cache", "spectra_tpu", "xla"
                ),
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
    except Exception:  # pragma: no cover - config names are versioned
        pass

from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule
from spectra_tpu.util.geigsmode import GEigsMode
from spectra_tpu.util.version import (
    __version__,
    SPECTRA_TPU_MAJOR_VERSION,
    SPECTRA_TPU_MINOR_VERSION,
    SPECTRA_TPU_PATCH_VERSION,
)

__all__ = [
    "CompInfo",
    "SortRule",
    "GEigsMode",
    "__version__",
    "SPECTRA_TPU_MAJOR_VERSION",
    "SPECTRA_TPU_MINOR_VERSION",
    "SPECTRA_TPU_PATCH_VERSION",
]


def __getattr__(name):
    # Lazy re-exports keep `import spectra_tpu` light and avoid circular
    # imports while the package is under construction.
    _lazy = {
        # MatOp layer
        "DenseSymMatProd": "spectra_tpu.matop.dense",
        "DenseGenMatProd": "spectra_tpu.matop.dense",
        "DenseHermMatProd": "spectra_tpu.matop.dense",
        "SparseSymMatProd": "spectra_tpu.matop.sparse",
        "SparseGenMatProd": "spectra_tpu.matop.sparse",
        "SparseHermMatProd": "spectra_tpu.matop.sparse",
        "DenseSymShiftSolve": "spectra_tpu.matop.shift_solve",
        "DenseHermShiftSolve": "spectra_tpu.matop.shift_solve",
        "SparseSymShiftSolve": "spectra_tpu.matop.shift_solve",
        "DenseGenRealShiftSolve": "spectra_tpu.matop.shift_solve",
        "SparseGenRealShiftSolve": "spectra_tpu.matop.shift_solve",
        "DenseGenComplexShiftSolve": "spectra_tpu.matop.shift_solve",
        "SparseGenComplexShiftSolve": "spectra_tpu.matop.shift_solve",
        "DenseCholesky": "spectra_tpu.matop.cholesky",
        "SparseCholesky": "spectra_tpu.matop.cholesky",
        "SparseRegularInverse": "spectra_tpu.matop.regular_inverse",
        "SymShiftInvert": "spectra_tpu.matop.sym_shift_invert",
        "RealEmbeddedHermMatProd": "spectra_tpu.matop.herm_embed",
        "RealEmbeddedGenMatProd": "spectra_tpu.matop.gen_embed",
        # Solvers
        "SymEigsSolver": "spectra_tpu.solvers.sym_eigs",
        "SymEigsShiftSolver": "spectra_tpu.solvers.sym_eigs_shift",
        "ChebSymEigsSolver": "spectra_tpu.solvers.cheb_sym_eigs",
        "HermEigsSolver": "spectra_tpu.solvers.herm_eigs",
        "GenEigsSolver": "spectra_tpu.solvers.gen_eigs",
        "GenEigsRealShiftSolver": "spectra_tpu.solvers.gen_eigs_shift",
        "GenEigsComplexShiftSolver": "spectra_tpu.solvers.gen_eigs_shift",
        "SymGEigsSolver": "spectra_tpu.solvers.sym_geigs",
        "SymGEigsShiftSolver": "spectra_tpu.solvers.sym_geigs_shift",
        "JDSymEigsBase": "spectra_tpu.solvers.jd_sym_eigs",
        "DavidsonSymEigsSolver": "spectra_tpu.solvers.davidson",
        # contrib
        "PartialSVDSolver": "spectra_tpu.contrib.partial_svd",
        "LOBPCGSolver": "spectra_tpu.contrib.lobpcg",
        # scipy.sparse.linalg-compatible frontend
        "eigsh": "spectra_tpu.api",
        "eigs": "spectra_tpu.api",
        "svds": "spectra_tpu.api",
        "NoConvergence": "spectra_tpu.api",
    }
    if name in _lazy:
        import importlib

        mod = importlib.import_module(_lazy[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'spectra_tpu' has no attribute {name!r}")
