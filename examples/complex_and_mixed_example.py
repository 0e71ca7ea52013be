"""Round-5 capabilities: a complex general matrix on a complex-free
accelerator (the real 2n embedding) and the mixed-precision solve mode
(f32 iteration + f64 Rayleigh-Ritz refinement)."""

import os
import sys

import numpy as np

# Runnable straight from a checkout: put the repo root on the path.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import spectra_tpu as st


def complex_general():
    """k largest-|lambda| eigenpairs of a complex non-Hermitian matrix.

    On accelerators without complex arithmetic, wrap the host matrix in
    RealEmbeddedGenMatProd: the solve runs the REAL IRAM on the 2n
    embedding [[Re C, -Im C], [Im C, Re C]] and recovers complex
    eigenpairs. (On complex-capable runtimes DenseGenMatProd.create(C)
    with the plain GenEigsSolver also works.)
    """
    rng = np.random.default_rng(0)
    n, k = 200, 4
    C = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    op = st.RealEmbeddedGenMatProd.create(C)
    eigs = st.GenEigsSolver(op, nev=k, ncv=4 * k)
    eigs.init()
    nconv = eigs.compute(st.SortRule.LargestMagn, tol=1e-12)
    vals, vecs = eigs.eigenvalues(), eigs.eigenvectors()
    resid = np.abs(C @ vecs - vecs * vals[None, :]).max()
    print(f"complex general: {nconv} converged, residual {resid:.2e}")
    print("  |lambda|:", np.sort(np.abs(vals))[::-1])


def mixed_precision():
    """Engineering-tolerance solve in mixed precision: the whole
    restarted Lanczos runs in native f32 (the fast path on TPUs), then
    one iterated f64 Rayleigh-Ritz refinement against the original
    operator; residuals are re-measured in f64 and gated."""
    rng = np.random.default_rng(1)
    n, k = 2000, 5
    A = rng.normal(size=(n, n))
    A = A + A.T
    s = st.SymEigsSolver(st.DenseSymMatProd.create(A), nev=k, ncv=25)
    s.set_precision("mixed")
    s.init()
    nconv = s.compute(st.SortRule.LargestMagn, tol=1e-6)
    rep = s.mixed_report()
    w = np.linalg.eigvalsh(A)
    want = w[np.argsort(-np.abs(w))][:k]
    err = np.abs(np.sort(s.eigenvalues()) - np.sort(want)).max()
    print(
        f"mixed precision: {nconv} converged, refined eval err "
        f"{err:.2e}, max f64 residual {rep['resid_f64'].max():.2e}"
    )


if __name__ == "__main__":
    complex_general()
    mixed_precision()
