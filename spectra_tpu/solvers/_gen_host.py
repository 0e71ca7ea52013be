"""Host-driven IRAM for runtimes without device complex support.

Some TPU runtimes execute no complex arithmetic at all (no complex
ALU; C64/C128 rejected at compile time) and no host callbacks. For
*real* matrices the IRAM still maps cleanly onto such hardware because
everything n-dimensional is real: the Arnoldi factorization, the basis
compression ``V <- V Q`` and the residual updates. Only the ncv-sized
Ritz eigenproblem and bookkeeping are complex — exactly the replicated
small problem — so this driver runs them on the host:

    device (real, jitted):  factorize_from, compress   <- the hot loop
    host (complex, tiny):   eig(H), selection/convergence/nev rules,
                            shift-sweep H' and Q (30x30, via the same
                            jax kernels pinned to the host CPU device)

Numerical rules are the same code paths as the compiled core
(:mod:`spectra_tpu.solvers._gen_core`) — the small-matrix kernels are
literally the same functions, compiled for CPU — so results agree with
the compiled driver to roundoff-free equality on the shared pieces.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spectra_tpu.linalg import krylov
from spectra_tpu.linalg.hessenberg import double_shift_qr, hessenberg_qr
from spectra_tpu.solvers._gen_core import IRAMResult
from spectra_tpu.util import dtypes
from spectra_tpu.util.capabilities import cpu_device
from spectra_tpu.util.selection import SortRule, argsort_np

_init_jit = jax.jit(krylov.init, static_argnums=(2,))
_fact_jit = jax.jit(krylov.factorize_from, static_argnames=("mode",))
_step_jit = jax.jit(krylov.step_once, static_argnames=("mode",))
_compress_jit = jax.jit(krylov.compress)
_dsq_jit = jax.jit(double_shift_qr)
_hqr_jit = jax.jit(hessenberg_qr)


def host_factorize(arnop, state, from_k: int, ncv: int,
                   matvec_granularity: bool):
    """Re-expand the factorization from ``from_k`` to ``ncv`` columns.

    Default: one jitted ``factorize_from`` (one device execution for
    the whole sweep). ``matvec_granularity``: one operator application
    per execution with a true host sync per step — the watchdog
    contract of ``set_matvec_granularity`` (shared by the host-driven
    IRAM and the Krylov-Schur driver). The stepped path uses the
    split-program step (one op-containing program total, see
    ``_herm_core.stepped_step_split``) so expensive inner-solve
    operators compile/load exactly one large program per process."""
    if not matvec_granularity:
        return _fact_jit(arnop, state, from_k, "arnoldi")
    from spectra_tpu.solvers._herm_core import stepped_step_split

    for i in range(max(int(from_k), 1), ncv):
        state = stepped_step_split(
            arnop, state, jnp.asarray(i, jnp.int32), mode="arnoldi"
        )
        jax.device_get(state.beta)  # true sync: bound the worker queue
    return state._replace(k=jnp.asarray(ncv, jnp.int32))


def _host_ritz(H, selection: SortRule, nev: int):
    evals, evecs = np.linalg.eig(H)
    ind = argsort_np(selection, evals)
    return evals[ind], evecs[-1, :][ind], evecs[:, ind[:nev]]


def _host_nev_adjusted(nconv, ritz_val, ritz_est, nev, ncv, rdtype):
    near_0 = dtypes.near_zero(rdtype)
    nev_new = nev + int(np.sum(np.abs(ritz_est[nev:ncv]) < near_0))
    nev_new += min(nconv, (ncv - nev_new) // 2)
    if nev_new == 1 and ncv >= 6:
        nev_new = ncv // 2
    elif nev_new == 1 and ncv > 3:
        nev_new = 2
    nev_new = min(nev_new, ncv - 2)
    if (
        ritz_val[nev_new - 1].imag != 0
        and ritz_val[nev_new - 1] == np.conj(ritz_val[nev_new])
    ):
        nev_new += 1
    return nev_new


def iram_compute_host(
    arnop,
    v0,
    key,
    maxit: int,
    tol: float,
    transform_aux=None,
    *,
    nev: int,
    ncv: int,
    selection: SortRule,
    sorting: SortRule,
    transform=None,
    matvec_granularity: bool = False,
) -> IRAMResult:
    """Full IRAM with host-side complex bookkeeping (real matrices).

    ``matvec_granularity`` replays factorize_from one step per device
    execution with a true host sync per step (same watchdog contract
    as ``HermEigsBase.set_matvec_granularity`` — for operators whose
    perform_op is itself a long compiled inner solve)."""
    rdtype = np.dtype(jnp.finfo(v0.dtype).dtype)
    eps23 = dtypes.eps23(rdtype)
    cpu = cpu_device()

    if matvec_granularity:
        from spectra_tpu.solvers._herm_core import stepped_init_split

        state = stepped_init_split(arnop, v0, key, m=ncv)
    else:
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
        # Shift sweeps on the host CPU device — the same compiled
        # kernels as the all-device core (GenEigsBase.h:60-107 rules).
        with jax.default_device(cpu):
            Hd = jnp.asarray(H)
            Q = jnp.eye(ncv, dtype=H.dtype)
            i = k_new
            while i < ncv:
                mu = ritz_val[i]
                if (
                    mu.imag != 0
                    and i + 1 < ncv
                    and mu == np.conj(ritz_val[i + 1])
                ):
                    Hd, Qi = _dsq_jit(Hd, 2.0 * mu.real, abs(mu) ** 2)
                    i += 2
                else:
                    Hd, Qi = _hqr_jit(Hd, mu.real)
                    i += 1
                Q = Q @ Qi
            H_new = np.asarray(Hd)
            Q = np.asarray(Q)

        state = _compress_jit(
            arnop, state, jnp.asarray(Q), jnp.asarray(H_new), k_new
        )
        state = host_factorize(arnop, state, k_new, ncv, matvec_granularity)

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
