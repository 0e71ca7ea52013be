"""Mixed-precision solve mode: f32 restarted Lanczos + one f64
Rayleigh-Ritz refinement.

TPU f64 is emulated; f32 is the chip's native word. The measured gap
on the flagship SpMV is ~12x (617 vs 52 Gnnz/s on the 1M-node
Laplacian, BASELINE.md), and every basis GEMV halves its HBM traffic
too. For engineering-tolerance workloads (tol >= ~1e-6) the whole
IRLM iteration can run in f32; the k converged Ritz vectors are then
refined ONCE against the original f64 operator:

    U  = orth(f64(U32))          (n x k thin QR)
    T  = U^T (A_f64 U)           (k SpMVs + one k x k projection)
    T S = S Theta                (replicated accurate eigh)
    eigenpairs: (Theta, U S)

Error model (documented gate): f32 Lanczos delivers residuals down to
~c * eps_f32 * ||A|| (c ~ 10-100), i.e. the mode accepts
``tol >= MIXED_TOL_FLOOR = 1e-6`` and rejects tighter requests. The
refinement is one step of Rayleigh-Ritz in f64: refined eigenvalue
errors drop to O(r^2 / gap) where ``r`` is the f32 residual — in
practice 1e-9-grade values from 1e-6-grade subspaces on gapped
problems; the returned residuals are re-measured in f64 and reported
via ``mixed_report()``.

The reference has no reduced-precision mode (all-double Eigen); this
is TPU-native capability beyond it, surfaced as
``solver.set_precision("mixed")`` on the plain symmetric drivers.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

#: minimum accepted tol in mixed mode (see module docstring).
MIXED_TOL_FLOOR = 1e-6


def cast_op_f32(op):
    """An f32 twin of a MatProd operator, or None if unsupported."""
    from spectra_tpu.matop.dense import DenseSymMatProd
    from spectra_tpu.sparse.formats import (
        DiaHiLoMatrix,
        DiaMatrix,
        EllMatrix,
    )

    ell = getattr(op, "ell", None)
    if ell is not None:
        if isinstance(ell, DiaHiLoMatrix):
            store = ell.to_dia()
            store = dataclasses.replace(
                store, data=store.data.astype(jnp.float32)
            )
        elif isinstance(ell, DiaMatrix):
            store = dataclasses.replace(
                ell, data=ell.data.astype(jnp.float32)
            )
        elif isinstance(ell, EllMatrix):
            store = dataclasses.replace(
                ell, vals=ell.vals.astype(jnp.float32)
            )
        else:
            return None
        return dataclasses.replace(op, ell=store)
    if isinstance(op, DenseSymMatProd):
        return dataclasses.replace(op, mat=op.mat.astype(jnp.float32))
    return None


def _refine_rounds(op, U, selection, sorting, max_rounds=3,
                   rtol_stop=5e-13):
    """Iterated f64 block-Krylov Rayleigh-Ritz on span([U, A U]).

    Each round enriches the casted subspace with one operator
    application (the block-power step that repairs whatever accuracy
    the f32 iteration left on clustered spectra), projects in f64, and
    keeps the k pairs ranked by ``sorting``. Stops when the measured
    f64 residuals reach ``rtol_stop * max|theta|`` or stop improving.
    Cost: ~3k operator columns per round.
    """
    from spectra_tpu.linalg.jacobi import eigh_accurate
    from spectra_tpu.util.selection import argsort_np

    k = U.shape[1]
    prev = np.inf
    best = None  # (theta, U, resid, worst) of the best round seen
    for _ in range(max_rounds):
        W = np.asarray(op.perform_op(jnp.asarray(U)))
        Q, _ = np.linalg.qr(np.concatenate([U, W], axis=1))
        AQ = np.asarray(op.perform_op(jnp.asarray(Q)))
        T = Q.T @ AQ
        T = 0.5 * (T + T.T)
        th_all, S_all = (np.asarray(a) for a in eigh_accurate(T))
        # the WANTED k by the selection rule; output order applied last
        order = np.asarray(argsort_np(selection, th_all))[:k]
        theta = th_all[order]
        S = S_all[:, order]
        U = Q @ S
        AU = AQ @ S
        resid = np.linalg.norm(AU - U * theta[None, :], axis=0)
        worst = float(resid.max()) if len(resid) else 0.0
        scale = float(np.abs(theta).max()) if len(theta) else 1.0
        if best is None or worst < best[3]:
            best = (theta, U, resid, worst)
        if worst <= rtol_stop * scale or worst > 0.5 * prev:
            break
        prev = worst
    return best[0], best[1], best[2]


def compute_mixed(solver, selection, maxit, tol, sorting) -> int:
    """Drive ``solver`` (a plain symmetric driver) in mixed precision.

    Returns nconv; stores (values, vectors, f64 residuals) on the
    solver for the accessors.
    """
    from spectra_tpu.util.compinfo import CompInfo

    if tol < MIXED_TOL_FLOOR:
        raise ValueError(
            f"mixed precision accepts tol >= {MIXED_TOL_FLOOR:g} (f32 "
            "Lanczos residual floor ~ c*eps_f32*||A||); request "
            f"tol={tol:g} needs set_precision('double')"
        )
    op32 = cast_op_f32(solver._op)
    if op32 is None:
        raise ValueError(
            "mixed precision supports the dense/sparse MatProd "
            "operators (DenseSymMatProd, SparseSymMatProd); "
            f"got {type(solver._op).__name__}"
        )
    twin = type(solver)(op32, solver._nev, solver._ncv)
    v0 = solver._v0
    twin.init(
        np.asarray(v0, np.float32)
        if v0 is not None and not isinstance(v0, jax.Array)
        else (jnp.asarray(v0, jnp.float32) if v0 is not None else None)
    )
    # Full-f32 MXU accumulation: TPU's default f32 matmul precision is
    # the 3-pass bf16 decomposition, whose ~2^-14-grade products would
    # cap the twin's basis orthogonality far below f32.
    with jax.default_matmul_precision("float32"):
        nconv32 = twin.compute(
            selection, maxit=maxit, tol=tol, sorting=sorting
        )
    solver._niter = twin.num_iterations()
    solver._nops = twin.num_operations()
    if nconv32 == 0:
        solver._info = twin.info()
        solver._mixed = (
            np.zeros(0), np.zeros((solver._n, 0)), np.zeros(0),
        )
        return 0
    U = np.asarray(twin.eigenvectors(), np.float64)
    theta, V, resid = _refine_rounds(solver._op, U, selection, sorting)
    # Convergence gate on the RE-MEASURED f64 residuals: the f32
    # iteration cannot resolve relative gaps below ~eps_f32, and a
    # subspace it failed on must not be reported Successful (ARPACK
    # test shape: resid <= tol * max(|theta|, ||Theta||*eps^{2/3})).
    scale = np.maximum(
        np.abs(theta),
        (np.abs(theta).max() if len(theta) else 1.0)
        * np.finfo(np.float32).eps ** (2.0 / 3.0),
    )
    conv = resid <= tol * scale
    theta, V, resid = theta[conv], V[:, conv], resid[conv]
    from spectra_tpu.util.selection import argsort_np

    order = np.asarray(argsort_np(sorting, theta))
    theta, V, resid = theta[order], V[:, order], resid[order]
    solver._mixed = (theta, V, resid)
    solver._info = (
        CompInfo.Successful
        if len(theta) == solver._nev
        else CompInfo.NotConverging
    )
    solver._nops += 3 * len(theta)
    return len(theta)
