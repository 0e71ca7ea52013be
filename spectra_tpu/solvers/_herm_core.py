"""Functional core of the implicitly restarted Lanczos method (IRLM).

One ``jax.jit``-compiled program runs the whole restarted iteration for
symmetric / Hermitian problems: factorize to ncv steps, extract Ritz
pairs from the (replicated, real tridiagonal) projection H, count
converged pairs with the ARPACK test, adjust nev, apply implicit
shifted-QR restarts, and loop under ``lax.while_loop`` until
convergence or maxit — no host round-trips inside the iteration.

Numerical rules mirror the reference exactly:
  * convergence: ``|ritz_est| * ||f|| < tol * max(eps^{2/3}, |theta|)``
    (reference: include/Spectra/HermEigsBase.h:158-175);
  * nev adjustment replicates dsaup2.f lines 677-684
    (HermEigsBase.h:178-202);
  * restart applies the unwanted Ritz values as implicit shifts,
    largest magnitude first, via shifted tridiagonal QR
    (HermEigsBase.h:105-155).

One documented deviation: when maxit is exhausted, the reference skips
the convergence test of the final restart (its loop checks at the top);
we do test it, which can only turn a NotConverging into a Successful.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.linalg import krylov
from spectra_tpu.linalg.jacobi import eigh_accurate
from spectra_tpu.ops.gemv import basis_apply_block
from spectra_tpu.linalg.tridiag import (
    tridiag_qr,
    tridiag_qtq,
    tridiag_to_dense,
    tridiag_eigen,
    apply_yq,
)
from spectra_tpu.util import dtypes
from spectra_tpu.util.selection import SortRule, argsort


class IRLMResult(NamedTuple):
    values: jax.Array  # (nev,) transformed & sorted Ritz values (real)
    vectors_small: jax.Array  # (ncv, nev) Ritz vectors in the V basis (real)
    conv: jax.Array  # (nev,) bool convergence flags, sorted order
    nconv: jax.Array  # int32
    niter: jax.Array  # int32
    nops: jax.Array  # int64
    V: jax.Array  # (ncv, n) final Krylov basis (row-major)
    f: jax.Array  # (n,) final residual


def _retrieve_ritzpair(H, selection: SortRule, nev: int, full_h: bool = False):
    """Ritz values/vectors of the projected problem, wanted-first order.

    With implicit restarts H is numerically a real symmetric
    tridiagonal (possibly stored complex for Hermitian solvers) and the
    eigen-decomposition runs on its real tridiagonal part
    (reference: HermEigsBase.h:205-224). With thick restarts H carries
    the arrowhead coupling, so ``full_h`` decomposes the full real
    symmetric matrix instead.
    """
    if full_h:
        Hr = jnp.real(H)
        evals, evecs = eigh_accurate(0.5 * (Hr + Hr.T))
    else:
        d = jnp.real(jnp.diagonal(H))
        e = jnp.real(jnp.diagonal(H, offset=-1))
        evals, evecs = tridiag_eigen(d, e)
    ind = argsort(selection, evals)
    ritz_val = evals[ind]
    ritz_est = evecs[-1, :][ind]
    ritz_vec = evecs[:, ind[:nev]]
    return ritz_val, ritz_est, ritz_vec


def _num_converged(ritz_val, ritz_est, beta, tol, nev: int):
    rdtype = ritz_val.dtype
    eps23 = jnp.asarray(dtypes.eps23(rdtype), rdtype)
    thresh = tol * jnp.maximum(eps23, jnp.abs(ritz_val[:nev]))
    resid = jnp.abs(ritz_est[:nev]) * beta
    conv = resid < thresh
    return conv, jnp.sum(conv).astype(jnp.int32)


def _nev_adjusted(nconv, ritz_est, nev: int, ncv: int):
    rdtype = ritz_est.dtype
    near_0 = jnp.asarray(dtypes.near_zero(rdtype), rdtype)
    nev_new = nev + jnp.sum(jnp.abs(ritz_est[nev:ncv]) < near_0).astype(jnp.int32)
    # dsaup2.f 677-684
    nev_new = nev_new + jnp.minimum(nconv, (ncv - nev_new) // 2)
    if ncv >= 6:
        nev_new = jnp.where(nev_new == 1, ncv // 2, nev_new)
    elif ncv > 2:
        nev_new = jnp.where(nev_new == 1, 2, nev_new)
    return jnp.minimum(nev_new, ncv - 1)


def _restart_thick(arnop, state, k_new, ncv: int, mode: str, selection: SortRule):
    """Thick restart (TRLan, Wu & Simon 2000 / Krylov-Schur): collapse
    the factorization to the k_new wanted Ritz vectors directly.

    A TPU-first alternative to the reference's implicit shifted-QR
    restart: one replicated eigh of H plus one MXU matmul ``V <- V Y``
    replace O(ncv) sequential Givens sweeps. The restarted projection
    matrix is the symmetric arrowhead ``[[diag(theta), s], [s^T, a]]``
    with coupling ``s = beta * Y[m-1, kept]``; the first step after the
    restart runs in full-projection (Arnoldi) mode to build the arrow
    column, after which the three-term Lanczos recurrence resumes
    (A v_j for j < k has no component along the new basis vectors).
    Converges in the same restart class as implicit QR; spectra match
    to solver tolerance, iteration counts may differ slightly.
    """
    state = _restart_thick_compress(arnop, state, k_new, ncv, selection)
    return krylov.factorize_from(arnop, state, state.k, mode)


def _restart_thick_compress(arnop, state, k_new, ncv: int, selection: SortRule):
    """Collapse-and-arrow half of the thick restart: one replicated eigh
    of H, one MXU matmul ``V <- V Y`` (kept columns masked, static
    shapes), plus the full-projection step that rebuilds the arrow
    column numerically (h_j = v_j^H A v_k = s_j analytically, with DGKS
    correction) — one operator application total. Re-expansion of
    columns k_new+1..ncv-1 is the caller's job: inline in the compiled
    driver, one device execution per step in the stepped driver."""
    H = state.H
    Hreal = jnp.real(H)
    Hfull = jnp.triu(Hreal) + jnp.triu(Hreal, 1).T
    evals, Y = eigh_accurate(Hfull)
    ind = argsort(selection, evals)
    # Keep the wanted k_new (mask the rest; keep static shapes).
    col = jnp.arange(ncv)
    keep_idx = ind[col]  # full permutation; first k_new are kept
    Yp = Y[:, keep_idx]
    theta = evals[keep_idx]

    # Masked rotation (see krylov.compress): zeroing the dropped
    # columns of Yp before the rotation keeps the peak at two (ncv, n)
    # buffers instead of three — the difference between fitting and
    # OOMing the 100M-nnz restart on a single v5e.
    Ypm = jnp.where((col < k_new)[None, :], Yp, 0.0)
    V_new = basis_apply_block(state.V, Ypm.astype(state.V.dtype))
    # The arrow coupling s = beta * Y[m-1, kept] is not written here:
    # the full-projection step below rebuilds the column numerically.
    H_new = jnp.zeros_like(H)
    H_new = H_new.at[col, col].set(
        jnp.where(col < k_new, theta, 0.0).astype(H.dtype)
    )
    k_idx = jnp.asarray(k_new, jnp.int32)
    state = krylov.KrylovState(
        V=V_new,
        H=H_new,
        f=state.f,
        beta=state.beta,
        k=k_idx,
        nops=state.nops,
        key=state.key,
    )
    state = krylov.step_once(arnop, state, k_idx, "arnoldi")
    Hc = state.H
    Hc = Hc.at[k_idx, :].set(jnp.conj(Hc[:, k_idx]))
    return state._replace(H=Hc, k=k_idx + 1)


def _restart_compress(arnop, state, ritz_val, k_new, nev: int, ncv: int):
    """Shift-and-compress half of the implicit restart: apply the
    ncv - k unwanted Ritz values as shifts (largest |shift| first) and
    compress to k steps. Re-expansion is the caller's job — the
    compiled driver runs it inline (:func:`_restart`); the stepped
    driver replays it one operator application per device execution."""
    H_new, Q = _shift_sweep(state.H, ritz_val, k_new, nev, ncv)
    return krylov.compress(arnop, state, Q, H_new, k_new)


def _shift_sweep(H, ritz_val, k_new, nev: int, ncv: int):
    """The replicated small half of the implicit restart: apply the
    ncv - k_new unwanted Ritz values as shifts (largest magnitude
    first) to the tridiagonal H, accumulating the rotation Q."""
    rdtype = ritz_val.dtype

    # Unwanted = positions >= k_new in the selection order; sort them by
    # magnitude descending. Masked positions sort last and are skipped
    # by the per-slot predicate.
    pos = jnp.arange(ncv)
    key = jnp.where(pos >= k_new, jnp.abs(ritz_val), -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    shifts = ritz_val[order]
    nshift = ncv - k_new

    Q0 = jnp.eye(ncv, dtype=rdtype)

    def shift_body(j, carry):
        def apply(HQ):
            H, Q = HQ
            mu = shifts[j]
            d = jnp.real(jnp.diagonal(H))
            e = jnp.real(jnp.diagonal(H, offset=-1))
            c, s, e_defl = tridiag_qr(d, e, mu)
            Q = apply_yq(Q, c, s)
            d2, e2 = tridiag_qtq(d, e_defl, c, s)
            return tridiag_to_dense(d2, e2).astype(H.dtype), Q

        return jax.lax.cond(j < nshift, apply, lambda HQ: HQ, carry)

    return jax.lax.fori_loop(0, ncv - nev, shift_body, (H, Q0))


def _restart(arnop, state, ritz_val, k_new, nev: int, ncv: int, mode: str):
    """Implicitly restart: apply the ncv - k unwanted Ritz values as
    shifts (largest |shift| first), compress to k steps, re-expand."""
    state = _restart_compress(arnop, state, ritz_val, k_new, nev, ncv)
    state = krylov.factorize_from(arnop, state, k_new, mode)
    return state


class _LoopCarry(NamedTuple):
    """Resumable iteration state — also the checkpoint payload: a
    pytree of arrays that can be saved/restored across processes
    (SURVEY.md section 5, checkpoint/resume)."""

    state: krylov.KrylovState
    ritz_val: jax.Array
    ritz_est: jax.Array
    ritz_vec: jax.Array
    conv: jax.Array
    nconv: jax.Array
    restarts: jax.Array


@functools.partial(
    jax.jit, static_argnames=("nev", "ncv", "selection", "mode", "restart_method")
)
def irlm_start(
    arnop,
    v0,
    key,
    tol,
    *,
    nev: int,
    ncv: int,
    selection: SortRule,
    mode: str,
    restart_method: str = "implicit",
) -> _LoopCarry:
    """Initial ncv-step factorization + first Ritz extraction."""
    state = krylov.init(arnop, v0, ncv, key)
    state = krylov.factorize_from(arnop, state, 1, mode)
    ritz_val, ritz_est, ritz_vec = _retrieve_ritzpair(
        state.H, selection, nev, full_h=restart_method == "thick"
    )
    conv, nconv = _num_converged(ritz_val, ritz_est, state.beta, tol, nev)
    return _LoopCarry(
        state, ritz_val, ritz_est, ritz_vec, conv, nconv, jnp.asarray(0, jnp.int32)
    )


@functools.partial(
    jax.jit, static_argnames=("nev", "ncv", "selection", "mode", "restart_method")
)
def irlm_restarts(
    arnop,
    carry: _LoopCarry,
    tol,
    restart_budget,
    *,
    nev: int,
    ncv: int,
    selection: SortRule,
    mode: str,
    restart_method: str = "implicit",
) -> _LoopCarry:
    """Run implicit restarts until convergence or until the total
    restart count reaches ``restart_budget`` (dynamic).

    Segmenting the outer loop into bounded chunks keeps each device
    execution short (important under runtime watchdogs / preemption)
    and makes the iteration checkpointable between chunks; the carry
    crosses segments exactly, so chunked and single-shot runs are
    bitwise identical.
    """

    def cond(c: _LoopCarry):
        return (c.nconv < nev) & (c.restarts < restart_budget)

    def body(c: _LoopCarry):
        k_new = _nev_adjusted(c.nconv, c.ritz_est, nev, ncv)
        if restart_method == "thick":
            state = _restart_thick(arnop, c.state, k_new, ncv, mode, selection)
        else:
            state = _restart(arnop, c.state, c.ritz_val, k_new, nev, ncv, mode)
        ritz_val, ritz_est, ritz_vec = _retrieve_ritzpair(
            state.H, selection, nev, full_h=restart_method == "thick"
        )
        conv, nconv = _num_converged(ritz_val, ritz_est, state.beta, tol, nev)
        return _LoopCarry(
            state, ritz_val, ritz_est, ritz_vec, conv, nconv, c.restarts + 1
        )

    return jax.lax.while_loop(cond, body, carry)


@functools.partial(jax.jit, static_argnames=("nev", "sorting", "transform"))
def irlm_finalize(
    carry: _LoopCarry,
    transform_aux=None,
    *,
    nev: int,
    sorting: SortRule,
    transform=None,
) -> IRLMResult:
    """Back-transform and sort the first nev Ritz pairs."""
    vals = carry.ritz_val[:nev]
    if transform is not None:
        vals = transform(vals, transform_aux)
    ind = argsort(sorting, vals)
    return IRLMResult(
        values=vals[ind],
        vectors_small=carry.ritz_vec[:, ind],
        conv=carry.conv[ind],
        nconv=carry.nconv,
        niter=carry.restarts + 1,
        nops=carry.state.nops,
        V=carry.state.V,
        f=carry.state.f,
    )


# -- stepped (matvec-granularity) entry points ------------------------
#
# For operators whose perform_op is itself a long-running compiled
# iteration (the on-device MINRES shift-solve at n >= 1e6: thousands of
# SpMVs per application), restart-level chunking still packs ncv inner
# solves into ONE device execution — minutes-long executions that trip
# remote-runtime watchdogs and crash the worker. These entry points let
# the driver replay the exact same iteration with at most one operator
# application per execution; the replicated restart algebra (shifts,
# compress, Ritz extraction) runs as separate, milliseconds-long
# programs. Same primitive sequence as the compiled driver, host control
# flow instead of lax loops.


@functools.partial(jax.jit, static_argnames=("m",))
def stepped_init(arnop, v0, key, *, m: int):
    """The 1-step factorization (two operator applications)."""
    return krylov.init(arnop, v0, m, key)


@functools.partial(jax.jit, static_argnames=("mode",))
def stepped_step(arnop, state, i, *, mode: str):
    """One factorization step — exactly one operator application (plus
    breakdown-restart applications in the rare expand_basis branch)."""
    return krylov.step_once(arnop, state, i, mode)


# -- split-program stepped path ---------------------------------------
#
# ``stepped_step`` compiles the operator INTO every step program. When
# perform_op is a large compiled inner solve (multigrid / Chebyshev at
# n ~ 1e6 through the TPU's emulated-f64 pipeline), each op-containing
# program costs minutes of compilation and tens of seconds of
# per-process executable load — and the stepped path has THREE of them
# (init, step, and the set_shift trial). The split path makes
# ``stepped_apply`` the ONLY op-containing program; the step algebra
# (recurrence, re-orthogonalization, breakdown expansion corrections)
# runs in small op-free programs, and breakdown decisions move to the
# host, which already syncs ||f|| every step. Arithmetic is shared
# with the fused path through ``krylov._post_op``.


@jax.jit
def stepped_apply(arnop, x):
    """``y = Op x`` — the single operator-containing stepped program
    (also reused by the multigrid trial validation in
    ``matop.shift_solve``, so one compile serves both)."""
    return arnop.perform_op(x)


@jax.jit
def _deflate_vec(arnop, y):
    return arnop.deflate(y)


def stepped_apply_deflated(arnop, x):
    """Operator application for the stepped driver. For a locked
    (deflated) operator the projector sandwich P.A.P runs as THREE
    device executions — two small X-projections around the UNDEFLATED
    apply — instead of one fused program: the fused locked apply both
    recompiles the whole inner solve per locked-block shape (~2 min at
    the 100M-nnz scale) and concentrates the f64 conversion temps of
    X, the operator and the inner-solve workspace into one allocation
    burst (observed round-1 OOM); split, the plain apply reuses the
    round-0 executable untouched."""
    if getattr(arnop, "locked", None) is None:
        return stepped_apply(arnop, x)
    return _deflate_vec(
        arnop, stepped_apply(arnop.inner, _deflate_vec(arnop, x))
    )


# The per-step split programs DONATE the iteration state: without
# input-output aliasing each program holds TWO copies of the (ncv, n)
# basis (in + out), which at the 100M-nnz scale (n = 14.3M, ncv = 40,
# f64 -> 4.6 GB) pushed the step program past the 16 GB HBM and killed
# the north-star run. Every caller rebinds its state variable on the
# returned value, so the invalidated input is never read again.
_near_test = jax.jit(krylov.split_near_test)
_expand_rand = jax.jit(krylov.split_expand_rand)
_expand_correct = jax.jit(krylov.split_expand_correct)
_set_column = jax.jit(krylov.split_set_column, donate_argnums=(0,))
_step_finish = jax.jit(
    krylov.split_step_finish,
    static_argnames=("mode", "defer_deflate"),
    donate_argnums=(1, 2),
)


@functools.partial(jax.jit, donate_argnums=(1,))
def _deflate_f(arnop, f):
    """Residual deflation as its OWN program (stepped path): inside the
    locked-round step program the (q, n) projection temps pushed the
    axon compile past HBM; alone its peak is the locked block plus two
    n-vectors. Returns (P f, ||P f||)."""
    f2 = arnop.deflate(f)
    return f2, arnop.norm(f2)
_step_finish_sel = jax.jit(
    krylov.split_step_finish_selective, donate_argnums=(1, 2)
)
_omega_seed = jax.jit(
    krylov.split_omega_seed, static_argnames=("m", "dtype")
)
_init_normalize = jax.jit(krylov.split_init_normalize)
_init_finish = jax.jit(krylov.split_init_finish, static_argnames=("m",))


def stepped_init_split(arnop, v0, key, *, m: int):
    """Split-program twin of :func:`stepped_init`: two
    ``stepped_apply`` executions + op-free algebra."""
    v0 = jnp.asarray(v0)
    vraw = stepped_apply_deflated(arnop, v0)
    v = _init_normalize(arnop, v0, vraw)
    w = stepped_apply_deflated(arnop, v)
    return _init_finish(arnop, v, w, key, m=m)


def _stepped_pre(arnop, state, i: int, mode: str):
    """Shared pre-operator half of the split step: host breakdown
    decision (from the synced ||f||), expansion corrections, column
    write, and THE operator application. Same rules, same PRNG stream,
    same arithmetic as the fused ``krylov._pre_op``."""
    import numpy as np

    dtype = state.V.dtype
    eps_sqrt = float(np.sqrt(jnp.finfo(dtype).eps))
    near_0 = float(dtypes.near_zero(dtype))

    beta = float(jax.device_get(state.beta))
    restart = beta < near_0
    if mode == "lanczos" and not restart and beta < eps_sqrt:
        restart = (
            float(jax.device_get(_near_test(arnop, state, i))) > eps_sqrt
        )

    nops_inc = jnp.asarray(1, jnp.int64)
    if restart:
        f = fn = None
        for it in range(5):
            rand = _expand_rand(state.key, i, jnp.asarray(it, jnp.int32),
                                state.f)
            if it == 0:
                cand = stepped_apply_deflated(arnop, rand)
                nops_inc = nops_inc + 1
            else:
                cand = rand
            f, fn, ok = _expand_correct(arnop, state.V, cand)
            if bool(jax.device_get(ok)):
                break
        state = state._replace(f=f, beta=fn)

    state, v = _set_column(state, i)
    w = stepped_apply_deflated(arnop, v)
    return state, w, restart, nops_inc


def stepped_step_split(arnop, state, i: int, *, mode: str):
    """Split-program twin of :func:`stepped_step`: one
    ``stepped_apply`` execution in the common case; breakdown
    expansion (rare) adds at most one more."""
    state, w, restart, nops_inc = _stepped_pre(arnop, state, i, mode)
    state = _step_finish(
        arnop, state, w, i, jnp.asarray(restart), nops_inc, mode=mode,
        defer_deflate=True,
    )
    if getattr(arnop, "locked", None) is not None:
        f2, beta2 = _deflate_f(arnop, state.f)
        state = state._replace(f=f2, beta=beta2)
    return state


def stepped_step_split_selective(arnop, state, i: int, omega):
    """Selective-reorth split step: same operator/breakdown half as
    :func:`stepped_step_split`, then the conditional-DGKS finish.
    ``omega = (w_prev, w_cur, force)`` is the host-threaded carry from
    :func:`stepped_omega_seed`; returns ``(state, omega')``."""
    state, w, restart, nops_inc = _stepped_pre(arnop, state, i, "lanczos")
    w_prev, w_cur, force = omega
    state, w_prev, w_cur, force = _step_finish_sel(
        arnop, state, w, i, w_prev, w_cur, force,
        jnp.asarray(restart), nops_inc,
    )
    return state, (w_prev, w_cur, force)


def stepped_omega_seed(state, from_k: int):
    """Fresh omega carry on (re)entry at column ``from_k`` — matches
    ``krylov._factorize_selective``'s loop entry."""
    m = state.V.shape[0]
    rdtype = jnp.dtype(dtypes.real_dtype(state.V.dtype))
    return _omega_seed(
        m=m,
        from_k=jnp.asarray(max(int(from_k), 1), jnp.int32),
        dtype=str(rdtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("nev", "ncv", "selection", "restart_method"),
    donate_argnums=(0,),
)
def stepped_extract(
    state, tol, restarts, *, nev: int, ncv: int,
    selection: SortRule, restart_method: str,
) -> _LoopCarry:
    """Ritz extraction + convergence count on the replicated H — no
    operator applications, O(ncv^3) work. Donates ``state`` (the V
    buffer passes through to the carry aliased; the caller rebinds)."""
    ritz_val, ritz_est, ritz_vec = _retrieve_ritzpair(
        state.H, selection, nev, full_h=restart_method == "thick"
    )
    conv, nconv = _num_converged(ritz_val, ritz_est, state.beta, tol, nev)
    return _LoopCarry(state, ritz_val, ritz_est, ritz_vec, conv, nconv, restarts)


@functools.partial(
    jax.jit,
    static_argnames=("nev", "ncv", "selection", "restart_method"),
    donate_argnums=(1,),
)
def stepped_restart_compress(
    arnop, state, ritz_val, ritz_est, nconv, *, nev: int, ncv: int,
    selection: SortRule, restart_method: str,
):
    """nev-adjust + shift/compress (implicit) or collapse+arrow (thick).
    Zero operator applications for implicit, one for thick. Returns the
    compressed state and the host-fetchable resume column ``state.k``.
    Donates ``state``: on the target runtime the donated rotation
    aliases its output into the input allocation (live-measured
    arg+temp 11.1 GB at ncv=32, n=14.3M vs 14.4 GB un-donated; the
    local AOT toolchain inserts a defensive copy instead — trust only
    live compile probes, scripts/hbm_probe.py). The driver rebinds its
    state variable on the returned value."""
    k_new = _nev_adjusted(nconv, ritz_est, nev, ncv)
    if restart_method == "thick":
        state = _restart_thick_compress(arnop, state, k_new, ncv, selection)
    else:
        state = _restart_compress(arnop, state, ritz_val, k_new, nev, ncv)
    return state, state.k


@functools.partial(
    jax.jit,
    static_argnames=(
        "nev", "ncv", "selection", "sorting", "mode", "transform", "restart_method",
    ),
)
def irlm_compute(
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
    mode: str = "lanczos",
    transform=None,
    restart_method: str = "implicit",
) -> IRLMResult:
    """Single-program IRLM: start + restarts + finalize in one jit.

    ``transform`` (static) maps the operator's Ritz values nu back to
    the original eigenvalues lambda before the final sort; shift-invert
    solvers pass e.g. ``lambda nu, sigma: 1/nu + sigma`` with the shift
    in ``transform_aux`` (reference: SymEigsShiftSolver.h:163-169).
    """
    carry = irlm_start(
        arnop, v0, key, tol, nev=nev, ncv=ncv, selection=selection, mode=mode,
        restart_method=restart_method,
    )
    carry = irlm_restarts(
        arnop, carry, tol, maxit, nev=nev, ncv=ncv, selection=selection, mode=mode,
        restart_method=restart_method,
    )
    return irlm_finalize(
        carry, transform_aux, nev=nev, sorting=sorting, transform=transform
    )
