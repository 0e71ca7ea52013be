"""Functional core of the implicitly restarted Arnoldi method (IRAM).

The non-symmetric sibling of :mod:`spectra_tpu.solvers._herm_core`:
one compiled program runs factorize -> Ritz extraction -> convergence
-> implicit restarts under ``lax.while_loop``, for real matrices (H
real Hessenberg, complex Ritz values in conjugate pairs) and complex
matrices (H complex Hessenberg).

Numerical rules mirror the reference exactly:
  * convergence ``|ritz_est| * ||f|| < tol * max(eps^{2/3}, |theta|)``
    (reference: include/Spectra/GenEigsBase.h:225-242);
  * nev adjustment replicates dnaup2.f 660-674 plus the
    keep-conjugate-pair rule (GenEigsBase.h:245-277);
  * restarts apply the unwanted Ritz values as implicit shifts in
    selection order: an exact conjugate pair becomes one Francis
    double shift, a real shift one Hessenberg QR sweep; for complex
    matrices every shift is a complex QR sweep
    (reference: GenEigsBase.h:44-140, RestartArnoldi).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.linalg import krylov
from spectra_tpu.linalg.hessenberg import double_shift_qr, hessenberg_qr
from spectra_tpu.linalg.hessenberg_eigen import hessenberg_eigen
from spectra_tpu.util import dtypes
from spectra_tpu.util.selection import SortRule, argsort


class IRAMResult(NamedTuple):
    values: jax.Array  # (nev,) complex, back-transformed & sorted
    vectors_small: jax.Array  # (ncv, nev) complex Ritz vectors in V basis
    conv: jax.Array  # (nev,) bool, sorted order
    nconv: jax.Array
    niter: jax.Array
    nops: jax.Array
    V: jax.Array  # (ncv, n) row-major
    f: jax.Array  # (n,)


def _retrieve_ritzpair(H, selection: SortRule, nev: int):
    evals, evecs = hessenberg_eigen(H)
    ind = argsort(selection, evals)
    ritz_val = evals[ind]
    ritz_est = evecs[-1, :][ind]
    ritz_vec = evecs[:, ind[:nev]]
    return ritz_val, ritz_est, ritz_vec


def _num_converged(ritz_val, ritz_est, beta, tol, nev: int):
    rdtype = jnp.finfo(ritz_val.dtype).dtype
    eps23 = jnp.asarray(dtypes.eps23(rdtype), rdtype)
    thresh = tol * jnp.maximum(eps23, jnp.abs(ritz_val[:nev]))
    resid = jnp.abs(ritz_est[:nev]) * beta
    conv = resid < thresh
    return conv, jnp.sum(conv).astype(jnp.int32)


def _is_conj_pair(a, b):
    """Exact-conjugacy test (LAPACK pairs are exactly conjugate,
    reference: GenEigsBase.h:55-56)."""
    return (a.imag != 0) & (a == jnp.conj(b))


def _nev_adjusted(nconv, ritz_val, ritz_est, nev: int, ncv: int):
    rdtype = jnp.finfo(ritz_est.dtype).dtype
    near_0 = jnp.asarray(dtypes.near_zero(rdtype), rdtype)
    nev_new = nev + jnp.sum(jnp.abs(ritz_est[nev:ncv]) < near_0).astype(jnp.int32)
    # dnaup2.f 660-674
    nev_new = nev_new + jnp.minimum(nconv, (ncv - nev_new) // 2)
    if ncv >= 6:
        nev_new = jnp.where(nev_new == 1, ncv // 2, nev_new)
    elif ncv > 3:
        nev_new = jnp.where(nev_new == 1, 2, nev_new)
    nev_new = jnp.minimum(nev_new, ncv - 2)
    # Keep conjugate pairs together (GenEigsBase.h:268-274).
    pair = _is_conj_pair(ritz_val[nev_new - 1], ritz_val[jnp.minimum(nev_new, ncv - 1)])
    return nev_new + pair.astype(jnp.int32)


def _restart_real(arnop, state, ritz_val, k_new, ncv: int):
    """Apply shifts ritz_val[k_new:] to a real-H factorization."""
    H = state.H
    rdtype = H.dtype
    Q0 = jnp.eye(ncv, dtype=rdtype)

    class Carry(NamedTuple):
        i: jax.Array
        H: jax.Array
        Q: jax.Array

    def cond(c):
        return c.i < ncv

    def body(c):
        mu = ritz_val[c.i]
        nxt = ritz_val[jnp.minimum(c.i + 1, ncv - 1)]
        pair = _is_conj_pair(mu, nxt) & (c.i + 1 < ncv)

        def do_double(HQ):
            H, Q = HQ
            s = 2.0 * mu.real
            t = (mu * jnp.conj(mu)).real
            H2, Qi = double_shift_qr(H, s, t)
            return H2, Q @ Qi

        def do_single(HQ):
            H, Q = HQ
            H2, Qi = hessenberg_qr(H, mu.real)
            return H2, Q @ Qi

        H2, Q2 = jax.lax.cond(pair, do_double, do_single, (c.H, c.Q))
        return Carry(c.i + jnp.where(pair, 2, 1), H2, Q2)

    out = jax.lax.while_loop(
        cond, body, Carry(jnp.asarray(k_new, jnp.int32), H, Q0)
    )
    state = krylov.compress(arnop, state, out.Q, out.H, k_new)
    return krylov.factorize_from(arnop, state, k_new, "arnoldi")


def _restart_complex(arnop, state, ritz_val, k_new, ncv: int):
    """Apply every shift via complex Hessenberg QR (complex matrices,
    reference: GenEigsBase.h:112-140)."""
    H = state.H
    Q0 = jnp.eye(ncv, dtype=H.dtype)

    def body(i, HQ):
        def apply(HQ):
            H, Q = HQ
            H2, Qi = hessenberg_qr(H, ritz_val[i])
            return H2, Q @ Qi

        return jax.lax.cond(i >= k_new, apply, lambda x: x, HQ)

    H2, Q = jax.lax.fori_loop(0, ncv, body, (H, Q0))
    state = krylov.compress(arnop, state, Q, H2, k_new)
    return krylov.factorize_from(arnop, state, k_new, "arnoldi")


class _LoopCarry(NamedTuple):
    """Resumable iteration state (checkpointable pytree)."""

    state: krylov.KrylovState
    ritz_val: jax.Array
    ritz_est: jax.Array
    ritz_vec: jax.Array
    conv: jax.Array
    nconv: jax.Array
    restarts: jax.Array


@functools.partial(jax.jit, static_argnames=("nev", "ncv", "selection"))
def iram_start(
    arnop, v0, key, tol, *, nev: int, ncv: int, selection: SortRule
) -> _LoopCarry:
    """Initial ncv-step Arnoldi factorization + first Ritz extraction."""
    state = krylov.init(arnop, v0, ncv, key)
    state = krylov.factorize_from(arnop, state, 1, "arnoldi")
    ritz_val, ritz_est, ritz_vec = _retrieve_ritzpair(state.H, selection, nev)
    conv, nconv = _num_converged(ritz_val, ritz_est, state.beta, tol, nev)
    return _LoopCarry(
        state, ritz_val, ritz_est, ritz_vec, conv, nconv, jnp.asarray(0, jnp.int32)
    )


@functools.partial(jax.jit, static_argnames=("nev", "ncv", "selection"))
def iram_restarts(
    arnop,
    carry: _LoopCarry,
    tol,
    restart_budget,
    *,
    nev: int,
    ncv: int,
    selection: SortRule,
) -> _LoopCarry:
    """Implicit restarts until convergence or the total restart count
    reaches ``restart_budget`` (segmentable, like the IRLM core)."""
    complex_mat = dtypes.is_complex(carry.state.V.dtype)

    def cond(c: _LoopCarry):
        return (c.nconv < nev) & (c.restarts < restart_budget)

    def body(c: _LoopCarry):
        k_new = _nev_adjusted(c.nconv, c.ritz_val, c.ritz_est, nev, ncv)
        if complex_mat:
            state = _restart_complex(arnop, c.state, c.ritz_val, k_new, ncv)
        else:
            state = _restart_real(arnop, c.state, c.ritz_val, k_new, ncv)
        ritz_val, ritz_est, ritz_vec = _retrieve_ritzpair(state.H, selection, nev)
        conv, nconv = _num_converged(ritz_val, ritz_est, state.beta, tol, nev)
        return _LoopCarry(
            state, ritz_val, ritz_est, ritz_vec, conv, nconv, c.restarts + 1
        )

    return jax.lax.while_loop(cond, body, carry)


@functools.partial(jax.jit, static_argnames=("nev", "sorting", "transform"))
def iram_finalize(
    carry: _LoopCarry,
    transform_aux=None,
    *,
    nev: int,
    sorting: SortRule,
    transform=None,
) -> IRAMResult:
    vals = carry.ritz_val[:nev]
    if transform is not None:
        vals = transform(vals, transform_aux, carry.ritz_vec, carry.state)
    ind = argsort(sorting, vals)
    return IRAMResult(
        values=vals[ind],
        vectors_small=carry.ritz_vec[:, ind],
        conv=carry.conv[ind],
        nconv=carry.nconv,
        niter=carry.restarts + 1,
        nops=carry.state.nops,
        V=carry.state.V,
        f=carry.state.f,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nev", "ncv", "selection", "sorting", "transform"),
)
def iram_compute(
    arnop,
    v0,
    key,
    maxit,
    tol,
    transform_aux=None,
    *,
    nev: int,
    ncv: int,
    selection: SortRule,
    sorting: SortRule,
    transform=None,
) -> IRAMResult:
    """Single-program IRAM: start + restarts + finalize in one jit.

    ``transform`` (static) maps operator Ritz values nu to original
    eigenvalues lambda before the final sort; it receives
    ``(nu, transform_aux, ritz_vec, state)`` so shift solvers can run
    the extra disambiguation products they need.
    """
    carry = iram_start(arnop, v0, key, tol, nev=nev, ncv=ncv, selection=selection)
    carry = iram_restarts(
        arnop, carry, tol, maxit, nev=nev, ncv=ncv, selection=selection
    )
    return iram_finalize(
        carry, transform_aux, nev=nev, sorting=sorting, transform=transform
    )
