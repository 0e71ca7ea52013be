"""Krylov-Schur restarting for the general (non-symmetric) solvers.

Stewart's Krylov-Schur method replaces the implicit shifted-QR restart
(reference: include/Spectra/GenEigsBase.h:44-140) with a direct one:

    1. real Schur form of the m x m Rayleigh matrix  B = U T U^T,
    2. reorder the wanted eigenvalue blocks to the front
       (:mod:`spectra_tpu.linalg.schur_reorder`, the dtrsen capability),
    3. truncate  V <- V U[:, :k]  — the residual f is UNCHANGED — and
       resume the Arnoldi expansion from column k.

With exact shifts the two restarts are mathematically equivalent
(Stewart 2001), but Krylov-Schur needs one small host Schur + one MXU
GEMM per restart instead of O(ncv - k) sequential Hessenberg QR sweeps
with accumulated rotations. On dispatch-latency-bound runtimes (the
tunneled TPU) and on CPU this removes most of the restart overhead.

The price is that the Rayleigh matrix stops being Hessenberg: after a
restart it is quasi-triangular in the leading k x k block with a full
"spike" row  beta * (e_m^T U)[:k]  in row k — the n-dimensional device
work (factorize_from / truncate_schur) is unchanged, and the host
bookkeeping uses dense eig/schur which accept any B.

Host/device split mirrors :mod:`spectra_tpu.solvers._gen_host`: all
n-dimensional work is compiled real arithmetic (runs on accelerators
with no complex support), the m x m complex bookkeeping is host-side.
"""

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from spectra_tpu.linalg import krylov
from spectra_tpu.linalg.schur_reorder import _block_starts, schur_reorder
from spectra_tpu.solvers._gen_core import IRAMResult
from spectra_tpu.solvers._gen_host import (
    _host_nev_adjusted,
    _host_ritz,
    host_factorize,
)
from spectra_tpu.util import dtypes
from spectra_tpu.util.selection import argsort_np, sort_key_np

_init_jit = jax.jit(krylov.init, static_argnums=(2,))
_trunc_jit = jax.jit(krylov.truncate_schur)


def _schur_position_eigs(T):
    """Eigenvalue at each diagonal position of a real quasi-triangular T
    (2x2 blocks contribute their conjugate pair in place)."""
    lam = np.zeros(T.shape[0], np.complex128)
    for start, size in _block_starts(T):
        if size == 1:
            lam[start] = T[start, start]
        else:
            lam[start : start + 2] = np.linalg.eigvals(
                T[start : start + 2, start : start + 2]
            )
    return lam


def iram_compute_ks(
    arnop,
    v0,
    key,
    maxit: int,
    tol: float,
    transform_aux=None,
    *,
    nev: int,
    ncv: int,
    selection,
    sorting,
    transform=None,
    matvec_granularity: bool = False,
) -> IRAMResult:
    """Full Arnoldi iteration with Krylov-Schur restarts (real dtypes).

    Same convergence rules as the implicit-restart drivers: ARPACK
    thresholds (GenEigsBase.h:225-242) and the dnaup2 nev adjustment
    with the conjugate-pair guard (GenEigsBase.h:245-277), both reused
    from :mod:`spectra_tpu.solvers._gen_host`.

    ``matvec_granularity``: one operator application per device
    execution with a true host sync per step (watchdog contract of
    ``set_matvec_granularity``)."""
    if np.issubdtype(np.dtype(v0.dtype), np.complexfloating):
        raise ValueError(
            "krylov_schur restarting is implemented for real matrices; "
            "use the implicit restart for complex dtypes"
        )
    rdtype = np.dtype(jnp.finfo(v0.dtype).dtype)
    eps23 = dtypes.eps23(rdtype)
    near_0 = dtypes.near_zero(rdtype)

    state = _init_jit(arnop, v0, ncv, key)
    state = host_factorize(arnop, state, 1, ncv, matvec_granularity)

    niter = 0
    for it in range(maxit + 1):
        niter = it + 1
        H = np.asarray(state.H)
        beta = float(state.beta)
        ritz_val, ritz_est, ritz_vec = _host_ritz(H, selection, nev)
        thresh = tol * np.maximum(eps23, np.abs(ritz_val[:nev]))
        resid = np.abs(ritz_est[:nev]) * beta
        conv = resid < thresh
        nconv = int(conv.sum())
        if nconv >= nev or it == maxit:
            break

        k_new = _host_nev_adjusted(nconv, ritz_val, ritz_est, nev, ncv, rdtype)

        # Direct restart: ordered Schur of the (generally non-Hessenberg,
        # spiked) Rayleigh matrix, wanted blocks first. Fast path: LAPACK
        # dgees computes the ordering natively given a pointwise
        # predicate; ritz_val is sorted by the selection key, so "wanted"
        # == "key below the midpoint between ranks k_new-1 and k_new".
        T2 = U2 = None
        key_sorted = sort_key_np(selection, ritz_val)
        lo, hi = float(key_sorted[k_new - 1]), float(key_sorted[k_new])
        if np.isfinite(lo) and np.isfinite(hi) and lo < hi:
            cutoff = 0.5 * (lo + hi)
            try:
                T2, U2, sdim = scipy.linalg.schur(
                    H,
                    output="real",
                    sort=lambda wr, wi: bool(
                        sort_key_np(selection, wr + 1j * wi) < cutoff
                    ),
                )
                k = int(sdim)
                if k < 1 or k > ncv - 1:
                    T2 = U2 = None
            except scipy.linalg.LinAlgError:
                T2 = U2 = None
        if T2 is None:
            # Degenerate cutoff (tied keys) or LAPACK reordering failure:
            # bubble the wanted blocks up with our own Bai-Demmel swaps.
            T, U = scipy.linalg.schur(H, output="real")
            lam_schur = _schur_position_eigs(T)
            ind = argsort_np(selection, lam_schur)
            select = np.zeros(ncv, bool)
            select[ind[:k_new]] = True
            T2, U2, k = schur_reorder(T, U, select)
            if k < 1:
                # All leading swaps rejected (near-identical spectra):
                # keep the leading block as-is rather than stall.
                k = _block_starts(T2)[0][1]
            k = min(k, ncv - 1)
        b = U2[ncv - 1, :k].copy()

        # Locking (Stewart, Krylov-Schur with deflation): zero the
        # spike coupling of the longest leading prefix of WHOLE Schur
        # blocks whose residual ``beta * |b[block]|`` already satisfies
        # the ARPACK test — those columns then form an exact invariant
        # subspace that later expansions cannot perturb (the zeroing is
        # a backward error below the convergence threshold by
        # construction). Cuts wasted re-mixing of converged directions
        # on hard spectra; the reference has no locking (its implicit
        # restart re-rotates everything every cycle).
        lam_lead = _schur_position_eigs(T2[:k, :k])
        eps23_arr = np.maximum(eps23, np.abs(lam_lead))
        nlock = 0
        for start, size in _block_starts(T2[:k, :k]):
            if start + size > k:
                break
            blk_resid = beta * np.abs(b[start : start + size]).max()
            if blk_resid < tol * eps23_arr[start : start + size].min():
                nlock = start + size
            else:
                break
        if nlock:
            b[:nlock] = 0.0

        state = _trunc_jit(arnop, state, jnp.asarray(U2), jnp.asarray(T2), k)
        state = host_factorize(arnop, state, k, ncv, matvec_granularity)

        if beta >= near_0:
            # Residual coupling of the truncated basis: row k of the
            # expanded Rayleigh matrix is beta * e_m^T U_k (the spike).
            # factorize_from wrote beta at (k, k-1); replace the row.
            Hx = np.array(state.H, copy=True)
            Hx[k, :k] = beta * b
            state = state._replace(H=jnp.asarray(Hx))

    vals = ritz_val[:nev]
    if transform is not None:
        vals = np.asarray(transform(vals, transform_aux, ritz_vec, state))
    ind = argsort_np(sorting, vals)
    return IRAMResult(
        values=vals[ind],
        vectors_small=ritz_vec[:, ind],
        conv=conv[ind],
        nconv=np.asarray(nconv),
        niter=np.asarray(niter),
        nops=np.asarray(state.nops),
        V=np.asarray(state.V),
        f=np.asarray(state.f),
    )
