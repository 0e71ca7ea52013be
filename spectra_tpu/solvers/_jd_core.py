"""Compiled Jacobi-Davidson iteration: the whole solve as ONE program.

The reference drives JD from a host loop over a growing search space
(reference: include/Spectra/JDSymEigsBase.h:141-185); a literal port
re-jits every basis width and pays a dispatch per step. Here the basis
lives in a **fixed-width padded buffer** (n, M2) with a dynamic active
width ``size`` and column masks — the search-space growth schedule
(i0, i0+c, ..., restart to i0) becomes pure data flow, so the entire
iteration compiles once into a ``lax.while_loop`` and runs on
callback-free accelerators (ROADMAP item 6 / round-1 VERDICT item 7).

Semantics mirror the host loop step for step:

* restart when ``size > max_search_space`` collapses to the leading
  ``i0`` Ritz vectors of the *previous* Rayleigh-Ritz (the correction
  columns added just before the overflow are discarded — reference
  behavior, JDSymEigsBase.h:151-156 + SearchSpace.h:70-74),
* the operator touches only new columns (``c`` per iteration;
  SearchSpace.h:57-63) via static-width dynamic slices,
* Rayleigh-Ritz on the masked projected matrix, with the padding
  lifted onto large separated diagonal values so ``eigh`` keeps the
  pad spectrum disjoint (positions >= size after the ascending sort),
* convergence on residual column norms (RitzPairs.h:73-87),
* extension = correction vectors orthogonalized by the same
  twice-is-enough (project + QR, twice) rule (SearchSpace.h:80-85).

The derived-class correction (the reference's CRTP seam) is a static
function argument ``correction_fn(vals_c, residues_c, aux)``.

Robustness beyond the reference: the loop tracks the best Ritz snapshot
(values/vectors/residues at the smallest max residual norm)
and exits once ``patience`` iterations pass without a >=10% residual
improvement. The achievable residual floor can sit above a requested
tol (on the TPU runtime the floor was ~1e-5 absolute until the
round-4 accuracy work — Jacobi eigh + VPU dots, linalg/jacobi.py —
brought it to ~6e-12, measured on a dense n=1000 probe); without the
guard the iteration churns noise through the incremental ``W`` and
restart compressions until the basis degenerates.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.linalg.jacobi import eigh_accurate
from spectra_tpu.linalg.orthogonalization import qr_orthogonalisation
from spectra_tpu.util.selection import SortRule, sort_target


class JDState(NamedTuple):
    V: jax.Array  # (n, M2) padded basis
    W: jax.Array  # (n, M2) padded operator-basis product
    size: jax.Array  # active width (i32)
    rr_size: jax.Array  # width at the last Rayleigh-Ritz (i32)
    vals: jax.Array  # (M2,) selection-sorted Ritz values (padded)
    small: jax.Array  # (M2, M2) matching small-space eigenvectors
    conv: jax.Array  # (nev,) convergence flags
    status: jax.Array  # 0 running / 1 converged / 2 maxit / 3 numerical
    it: jax.Array  # iterations completed (i32)
    nops: jax.Array  # operator column applications (i32)
    # Best-iterate tracking (see module docstring): on accelerators with
    # emulated fp64 the residual floor sat at 1e-5..1e-7 before the
    # round-4 Jacobi-eigh/VPU-dot fixes (now ~6e-12); iterating
    # past stagnation compounds noise through the incremental W and the
    # restart compressions until the basis degenerates. We keep the best
    # Ritz snapshot seen so far and stop after `patience` iterations
    # without a >=10% residual improvement.
    best_vals: jax.Array  # (nev,)
    best_vecs: jax.Array  # (n, nev)
    best_res: jax.Array  # (n, nev)
    best_conv: jax.Array  # (nev,)
    best_resmax: jax.Array  # scalar
    bad_iters: jax.Array  # i32


class JDResult(NamedTuple):
    values: jax.Array  # (nev,)
    vectors: jax.Array  # (n, nev)
    residues: jax.Array  # (n, nev)
    conv: jax.Array  # (nev,) bool
    status: jax.Array
    niter: jax.Array
    nops: jax.Array


def _masked(A, size):
    m = (jnp.arange(A.shape[1]) < size).astype(A.dtype)
    return A * m[None, :]


def _rayleigh_ritz(V, W, size, selection: SortRule):
    """Masked Rayleigh-Ritz; returns selection-sorted (vals, small)."""
    M2 = V.shape[1]
    Vm = _masked(V, size)
    Wm = _masked(W, size)
    P = Vm.T @ Wm
    P = 0.5 * (P + P.T)
    # Lift the padding onto large, separated diagonal values: the pad
    # block is exactly decoupled (masked rows/cols are zero), so eigh
    # returns its eigenvalues verbatim, above every active one ->
    # ascending order puts pads at positions >= size.
    j = jnp.arange(M2)
    pad = j >= size
    cap = 2.0 * jnp.max(jnp.abs(P)) + 1.0
    B = P + jnp.diag(jnp.where(pad, cap * (1.0 + j), 0.0).astype(P.dtype))
    w, s = eigh_accurate(B)
    key = sort_target(selection, w)
    key = jnp.where(pad, jnp.inf, key)
    ind = jnp.argsort(key, stable=True)
    return w[ind], s[:, ind]


def _orth_extend(V, size, C):
    """Twice-is-enough orthogonalization of the block C against the
    active columns of V, then write it at [size, size+c)."""
    Vm = _masked(V, size)
    for _ in range(2):  # reference: Orthogonalization twice_is_enough
        C = C - Vm @ (Vm.T @ C)
        C = qr_orthogonalisation(C)
    return jax.lax.dynamic_update_slice(V, C, (jnp.int32(0), size))


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_space",
        "i0",
        "c",
        "nev",
        "selection",
        "correction_fn",
    ),
)
def jd_compute(
    op,
    V0,
    aux,
    maxit,
    tol,
    *,
    max_space: int,
    i0: int,
    c: int,
    nev: int,
    selection: SortRule,
    correction_fn,
) -> JDResult:
    """Run the full JD iteration compiled; see module docstring.

    V0: (n, i0) orthonormal initial search space. The buffer width is
    the largest size the growth schedule reaches before a restart.
    """
    n = V0.shape[0]
    sizes = [i0]
    while sizes[-1] <= max_space:
        sizes.append(sizes[-1] + c)
    M2 = sizes[-1]
    dtype = V0.dtype

    V = jnp.zeros((n, M2), dtype).at[:, :i0].set(V0)
    W0 = op.perform_op(V0)
    W = jnp.zeros((n, M2), dtype).at[:, :i0].set(W0)
    vals0, small0 = _rayleigh_ritz(V, W, jnp.int32(i0), selection)

    # Stagnation patience: one full growth schedule (a restart can
    # unlock progress) plus slack, then give up and report the best.
    patience = 2 * len(sizes) + 6

    state = JDState(
        V=V,
        W=W,
        size=jnp.int32(i0),
        rr_size=jnp.int32(i0),
        vals=vals0,
        small=small0,
        conv=jnp.zeros((nev,), bool),
        status=jnp.int32(0),
        it=jnp.int32(0),
        nops=jnp.int32(i0),
        best_vals=jnp.zeros((nev,), dtype),
        best_vecs=jnp.zeros((n, nev), dtype),
        best_res=jnp.zeros((n, nev), dtype),
        best_conv=jnp.zeros((nev,), bool),
        best_resmax=jnp.asarray(jnp.inf, dtype),
        bad_iters=jnp.int32(0),
    )

    def do_restart(st: JDState) -> JDState:
        # Collapse to the leading i0 Ritz vectors of the previous RR;
        # the newest c columns (never multiplied by A) are discarded,
        # matching the reference's loop order.
        Vm = _masked(st.V, st.rr_size)
        Wm = _masked(st.W, st.rr_size)
        s_lead = st.small[:, :i0]
        Vc = jnp.zeros_like(st.V).at[:, :i0].set(Vm @ s_lead)
        Wc = jnp.zeros_like(st.W).at[:, :i0].set(Wm @ s_lead)
        return st._replace(V=Vc, W=Wc, size=jnp.int32(i0))

    def update_W(st: JDState) -> JDState:
        start = st.size - c
        block = jax.lax.dynamic_slice(st.V, (jnp.int32(0), start), (n, c))
        Wb = op.perform_op(block)
        return st._replace(
            W=jax.lax.dynamic_update_slice(st.W, Wb, (jnp.int32(0), start)),
            nops=st.nops + c,
        )

    def extend(st: JDState, vals, small) -> JDState:
        Vm = _masked(st.V, st.size)
        Wm = _masked(st.W, st.size)
        ritz = Vm @ small[:, :c]
        resid = Wm @ small[:, :c] - ritz * vals[None, :c]
        C = correction_fn(vals[:c], resid, aux).astype(st.V.dtype)
        Vx = _orth_extend(st.V, st.size, C)
        return st._replace(V=Vx, size=st.size + c)

    def body(st: JDState) -> JDState:
        restart_now = st.size > max_space
        st = jax.lax.cond(restart_now, do_restart, lambda s: s, st)
        st = jax.lax.cond(
            ~restart_now & (st.it > 0), update_W, lambda s: s, st
        )

        vals, small = _rayleigh_ritz(st.V, st.W, st.size, selection)
        Vm = _masked(st.V, st.size)
        Wm = _masked(st.W, st.size)
        lead = small[:, :nev]
        ritz = Vm @ lead
        resid = Wm @ lead - ritz * vals[None, :nev]
        norms = jnp.linalg.norm(resid, axis=0)
        conv = norms < tol
        finite = jnp.all(
            jnp.isfinite(jnp.where(jnp.arange(M2) < st.size, vals, 0.0))
        )
        it1 = st.it + 1

        resmax = jnp.max(norms)
        all_conv = jnp.all(conv)
        take = finite & ((resmax < st.best_resmax) | all_conv)
        improved = finite & (resmax < 0.9 * st.best_resmax)
        bad = jnp.where(improved, 0, st.bad_iters + 1).astype(jnp.int32)

        status = jnp.where(
            ~finite,
            3,
            jnp.where(
                all_conv,
                1,
                jnp.where((it1 >= maxit) | (bad >= patience), 2, 0),
            ),
        ).astype(jnp.int32)
        st = st._replace(
            vals=vals,
            small=small,
            rr_size=st.size,
            conv=conv,
            status=status,
            it=it1,
            best_vals=jnp.where(take, vals[:nev], st.best_vals),
            best_vecs=jnp.where(take, ritz, st.best_vecs),
            best_res=jnp.where(take, resid, st.best_res),
            best_conv=jnp.where(take, conv, st.best_conv),
            best_resmax=jnp.where(take, resmax, st.best_resmax),
            bad_iters=bad,
        )
        return jax.lax.cond(
            status == 0, lambda s: extend(s, vals, small), lambda s: s, st
        )

    state = jax.lax.while_loop(lambda s: s.status == 0, body, state)

    # Report the best snapshot, not the last iterate (identical when
    # converged; strictly better when the loop stopped on maxit or
    # stagnation past the arithmetic's residual floor).
    return JDResult(
        values=state.best_vals,
        vectors=state.best_vecs,
        residues=state.best_res,
        conv=state.best_conv,
        status=state.status,
        niter=state.it,
        nops=state.nops,
    )
