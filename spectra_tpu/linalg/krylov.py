"""Krylov (Lanczos / Arnoldi) factorization — the sharded hot loop.

Maintains the m-step factorization  A V = V H + f e_m^T  with V held
ROW-MAJOR as an (m, n) array (basis vector i in row V[i]),
B-orthonormal, H m-by-m (symmetric tridiagonal for Lanczos, upper
Hessenberg for Arnoldi) and residual f.

Design (TPU-first, functional — not a translation of the reference's
in-place pointer loops, reference: include/Spectra/LinAlg/Arnoldi.h:
32-341 and Lanczos.h:28-218):

  * All buffers are statically shaped at ncv = m. The growing basis is
    encoded by the invariant that **rows >= k of V are exactly zero**,
    so every projection is a full-width (m, n) GEMV/GEMM — a fixed
    TPU-friendly shape — and needs no masking or dynamic slicing on
    the big axis. Rows (not columns): the minor dimension is n, so the
    (8, 128) tile padding is O(1/n) instead of the 3.2x lane padding an
    (n, ncv) layout pays at ncv = 40 (see ops/gemv.py).
  * The factorization step index and the restart point k are traced
    values; the step loop is a static ``fori_loop`` over m whose body is
    predicated on ``i >= from_k``, which is how data-dependent restart
    sizes live inside one compiled program.
  * The n-dimensional arrays (V, f, matvec operands) are the only
    sharded objects; H, scalars and rotation state are replicated.

Numerical rules are carried over from the reference verbatim (they are
load-bearing for ARPACK-equivalent behavior):
  * init forces v1 into range(A) and falls back to v0 when A v0 ~= 0
    (Arnoldi.h:136-195);
  * Lanczos uses the Cullum-Willoughby three-term recurrence plus an
    always-on DGKS re-orthogonalization loop (<= 5 corrections) with
    threshold ``ortho_err > eps * ||f||`` and a force-zero edge case at
    ``||f|| < eps * sqrt(n)`` (Lanczos.h:62-187);
  * Lanczos additionally tests ``|<V_i, f/||f||>| > sqrt(eps)`` when
    ``||f|| < sqrt(eps)`` — the near-breakdown heuristic (Lanczos.h:
    99-114);
  * Arnoldi (full Gram-Schmidt) skips re-orthogonalization when
    ``||f|| > 0.717 ||h||`` (Arnoldi.h:257);
  * breakdown triggers a random-restart ``expand_basis`` (<= 5 random
    vectors, <= 3 corrections each, first try forced into range(A),
    Arnoldi.h:66-115). Randomness comes from a counter-based JAX PRNG
    folded with the step index — deterministic and identical across
    hosts, replacing the reference's sequential LCG reseeding.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.ops.gemv import basis_apply, basis_apply_block
from spectra_tpu.util import dtypes
from spectra_tpu.util.rng import uniform_m05_05


class KrylovState(NamedTuple):
    """The factorization state: a pytree, shardable along n."""

    V: jax.Array  # (m, n) row-major; rows >= k are zero
    H: jax.Array  # (m, m)
    f: jax.Array  # (n,)
    beta: jax.Array  # scalar real: ||f||_B
    k: jax.Array  # int32: current subspace dimension
    nops: jax.Array  # int64: matvec counter
    key: jax.Array  # PRNG key for breakdown restarts


def _maxabs(x):
    return jnp.max(jnp.abs(x))


def _structure_clean(arnop, v):
    """Project the STARTING vector v into the operator's admissible
    subspace and renormalize. For J-structured ops this is a rounding-
    level no-op (v is J-orthogonal to itself analytically). Locked
    (deflated) operators need no cleaning here: their ``perform_op``
    is the projected P.A.P, so ``v = normalize(Op v0)`` lands in the
    admissible complement by construction, and every residual is
    re-deflated at birth (``_deflate_residual``).
    """
    if not arnop.has_structure:
        return v
    near_0 = jnp.asarray(
        dtypes.near_zero(v.dtype), dtypes.real_dtype(v.dtype)
    )
    sb = arnop.ortho_basis(v[None, :])[1:]
    v = v - basis_apply(sb, arnop.adjoint_product(sb, v))
    return v / jnp.maximum(arnop.norm(v), near_0)


def _normalize_mode(mode: str):
    """Split a mode string into (base mode, selective flag).

    ``"lanczos_selective"`` requests Simon's omega-recurrence partial
    re-orthogonalization (handled by :func:`factorize_from`); every
    other consumer of the mode string sees the plain base mode.
    """
    if mode == "lanczos_selective":
        return "lanczos", True
    return mode, False


def init(arnop, v0, m: int, key) -> KrylovState:
    """Build the 1-step factorization from the starting vector ``v0``.

    The caller must ensure ``||v0|| > 0`` (checked host-side in the
    solver driver, mirroring the reference's invalid_argument).
    """
    v0 = jnp.asarray(v0)
    n = v0.shape[0]
    dtype = v0.dtype
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    near_0 = jnp.asarray(dtypes.near_zero(dtype), rdtype)

    v0norm = arnop.norm(v0)
    # Force v into the range of A; if A v0 ~= 0, v0 itself is an
    # eigenvector for eigenvalue 0 and is used directly.
    v = arnop.perform_op(v0)
    vnorm = arnop.norm(v)
    v = jnp.where(vnorm < near_0, v0 / v0norm, v / jnp.maximum(vnorm, near_0))
    v = _structure_clean(arnop, v)

    w = arnop.perform_op(v)
    h00 = arnop.inner_product(v, w)
    f = w - h00 * v
    if arnop.has_structure:
        # Remove structural (e.g. J-orbit) rounding components so the
        # next basis vector v1 = f/||f|| is structure-clean.
        jv = arnop.ortho_basis(v[None, :])[1:]
        f = f - basis_apply(jv, arnop.adjoint_product(jv, f))

    # If v is already an eigenvector, f is pure rounding noise: force it
    # to zero so the next factorization step restarts cleanly.
    force_zero = _maxabs(f) < eps * jnp.abs(h00)
    f = jnp.where(force_zero, jnp.zeros_like(f), f)
    beta = jnp.where(force_zero, jnp.asarray(0.0, rdtype), arnop.norm(f))

    V = jnp.zeros((m, n), dtype).at[0].set(v)
    H = jnp.zeros((m, m), dtype).at[0, 0].set(h00)
    return KrylovState(
        V=V,
        H=H,
        f=f,
        beta=beta,
        k=jnp.asarray(1, jnp.int32),
        nops=jnp.asarray(2, jnp.int64),
        key=key,
    )


def _expand_basis(arnop, V, num_cols, key, dtype):
    """Find f != 0 with (V^H) B f = 0 against the first ``num_cols``
    rows of V (all later rows are zero by invariant).

    Returns (f, fnorm, extra_ops). Up to 5 random tries; the first is
    forced into range(A); each try gets <= 3 DGKS corrections.
    """
    n = V.shape[1]
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    # Vp == V for plain ops; structured ops widen it (e.g. [V, JV]) so
    # random restarts are also structure-orthogonal.
    Vp = arnop.ortho_basis(V)

    def one_try(carry, it):
        f, fnorm, done, extra_ops = carry

        def attempt(operand):
            f, fnorm, extra_ops = operand
            sub = jax.random.fold_in(key, it)
            rand = uniform_m05_05(sub, (n,), dtype)
            f0, inc = jax.lax.cond(
                it == 0,
                lambda r: (arnop.perform_op(r), jnp.asarray(1, jnp.int64)),
                lambda r: (arnop.deflate(r), jnp.asarray(0, jnp.int64)),
                rand,
            )
            Vf = arnop.adjoint_product(Vp, f0)
            f1 = f0 - basis_apply(Vp, Vf)
            fn = arnop.norm(f1)
            Vf = arnop.adjoint_product(Vp, f1)
            oe = _maxabs(Vf)

            def c_cond(c):
                _, fn_c, _, oe_c, cnt = c
                return (cnt < 3) & (oe_c >= eps * fn_c)

            def c_body(c):
                f_c, fn_c, Vf_c, _, cnt = c
                f_c = f_c - basis_apply(Vp, Vf_c)
                fn_c = arnop.norm(f_c)
                Vf_c = arnop.adjoint_product(Vp, f_c)
                return (f_c, fn_c, Vf_c, _maxabs(Vf_c), cnt + 1)

            f2, fn2, Vf2, oe2, _ = jax.lax.while_loop(
                c_cond, c_body, (f1, fn, Vf, oe, jnp.asarray(0, jnp.int32))
            )
            ok = oe2 < eps * fn2
            return f2, fn2, ok, extra_ops + inc

        f, fnorm, ok, extra_ops = jax.lax.cond(
            done,
            lambda operand: (operand[0], operand[1], jnp.asarray(True), operand[2]),
            attempt,
            (f, fnorm, extra_ops),
        )
        return (f, fnorm, done | ok, extra_ops), None

    init_carry = (
        jnp.zeros((n,), dtype),
        jnp.asarray(0.0, rdtype),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int64),
    )
    (f, fnorm, _, extra_ops), _ = jax.lax.scan(
        one_try, init_carry, jnp.arange(5, dtype=jnp.int32)
    )
    return f, fnorm, extra_ops


def _reorth_loop(arnop, V, f, beta, H, i, mode: str, skip, dtype, n):
    """DGKS iterative re-orthogonalization (<= 5 corrections).

    Updates f, beta and the H entries of column i per the reference
    rules; ``skip`` disables the loop (Arnoldi 0.717 shortcut).
    """
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    beta_thresh = eps * jnp.sqrt(jnp.asarray(n, rdtype))

    # Vp == V for plain ops; wider for structured ops ([V, JV]). The H
    # updates below only read the leading V-coefficients — the extra
    # projections are noise removal, not recurrence coefficients.
    Vp = arnop.ortho_basis(V)
    Vf = arnop.adjoint_product(Vp, f)
    ortho_err = _maxabs(Vf)

    def cond(carry):
        _, beta_c, _, oe_c, _, cnt, broke = carry
        return (cnt < 5) & (oe_c > eps * beta_c) & (~broke) & (~skip)

    def body(carry):
        f_c, beta_c, Vf_c, oe_c, H_c, cnt, broke = carry

        def force_zero(op):
            f_c, _, Vf_c, oe_c, H_c = op
            return (
                jnp.zeros_like(f_c),
                jnp.asarray(0.0, rdtype),
                Vf_c,
                oe_c,
                H_c,
                True,
            )

        def correct(op):
            f_c, beta_c, Vf_c, _, H_c = op
            f_n = f_c - basis_apply(Vp, Vf_c)
            if mode == "lanczos":
                hsub = H_c[i - 1, i] + Vf_c[i - 1]
                H_n = (
                    H_c.at[i - 1, i].set(hsub)
                    .at[i, i - 1].set(hsub)
                    .at[i, i].add(Vf_c[i])
                )
            else:
                # Full column correction h <- h + Vf (entries past i are
                # zero by the V-column invariant).
                H_n = H_c.at[:, i].add(Vf_c[: H_c.shape[0]])
            beta_n = arnop.norm(f_n)
            Vf_n = arnop.adjoint_product(Vp, f_n)
            return (f_n, beta_n, Vf_n, _maxabs(Vf_n), H_n, False)

        f_c, beta_c, Vf_c, oe_c, H_c, broke_n = jax.lax.cond(
            beta_c < beta_thresh, force_zero, correct, (f_c, beta_c, Vf_c, oe_c, H_c)
        )
        return (f_c, beta_c, Vf_c, oe_c, H_c, cnt + 1, broke | broke_n)

    f, beta, _, _, H, _, _ = jax.lax.while_loop(
        cond,
        body,
        (f, beta, Vf, ortho_err, H, jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    return f, beta, H


def _lanczos_coeffs(arnop, V, H, v, w, h_sub, i):
    """Three-term recurrence (Cullum & Willoughby ordering): alpha/beta
    coefficients, residual, H column write. No re-orthogonalization."""
    w = w - h_sub * V[i - 1]
    alpha = arnop.inner_product(v, w)
    f = w - alpha * v
    H = (
        H.at[i, i - 1].set(h_sub)
        .at[i - 1, i].set(h_sub)
        .at[i, i].set(alpha)
    )
    beta = arnop.norm(f)
    return f, beta, H


def _post_op(arnop, V, H, v, w, h_sub, i, mode: str,
             defer_deflate: bool = False):
    """Everything after ``w = A v``: recurrence coefficients, residual,
    re-orthogonalization. Shared verbatim by the fused ``_step`` and
    the split-program stepped path (:mod:`solvers._herm_core`
    ``stepped_*_split``) so the two execute identical arithmetic."""
    mode, _ = _normalize_mode(mode)
    m, n = V.shape
    dtype = V.dtype
    rdtype = dtypes.real_dtype(dtype)

    if mode == "lanczos":
        f, beta, H = _lanczos_coeffs(arnop, V, H, v, w, h_sub, i)
        skip = jnp.asarray(False)
    else:
        # Full Gram-Schmidt: h = V^H B w over all i+1 current rows
        # (tail rows are zero so the full-width GEMV is exact).
        # Structured ops project against the widened basis; only the
        # leading V-coefficients are recurrence entries.
        Vp = arnop.ortho_basis(V)
        h = arnop.adjoint_product(Vp, w)
        f = w - basis_apply(Vp, h)
        h = h[:m]
        H = H.at[:, i].set(h).at[i, i - 1].set(h_sub)
        beta = arnop.norm(f)
        skip = beta > jnp.asarray(0.717, rdtype) * jnp.linalg.norm(h)

    f, beta, H = _reorth_loop(arnop, V, f, beta, H, i, mode, skip, dtype, n)
    if defer_deflate:
        return f, beta, H
    return _deflate_residual(arnop, f, beta, H)


def _deflate_residual(arnop, f, beta, H):
    """Deflated operators (LockedArnoldiOp): re-project the residual at
    birth so no basis vector carries locked-subspace components. One
    fused projection against the (q, n) locked block — the memory-light
    replacement for widening the DGKS basis with the block (whose
    [V; X] concat cost a third basis-sized buffer at the 100M-nnz
    scale). Identity (no-op graph) for undeflated operators. Without
    it, selections that prefer the deflated-to-zero end of the
    spectrum (e.g. SmallestAlge on a PSD operator) amplify rounding
    drift into span(locked) through the restart filter and converge to
    the deflation artifacts (observed: six ~1e-16 Ritz values on the
    cycle-Laplacian multiplicity test)."""
    f2 = arnop.deflate(f)
    if f2 is f:  # identity hook: keep the graph unchanged
        return f, beta, H
    return f2, arnop.norm(f2), H


def _pre_op(arnop, state: KrylovState, i, mode: str):
    """Everything before ``w = A v``: breakdown detection (+ random
    expansion on breakdown) and basis extension. Returns
    ``(V, v, h_sub, nops, restart)``; shared by the full-reorth and
    selective-reorth steps."""
    V, _, f, beta, _, nops, key = state
    dtype = V.dtype
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    eps_sqrt = jnp.sqrt(eps)
    near_0 = jnp.asarray(dtypes.near_zero(dtype), rdtype)

    # --- breakdown detection ---------------------------------------
    restart = beta < near_0
    if mode == "lanczos":
        # Near-breakdown heuristic: when ||f|| is small, also test the
        # component of f/||f|| along the latest basis vector.
        def near_test(_):
            v_cand = f / jnp.maximum(beta, near_0)
            Viv = arnop.inner_product(V[i - 1], v_cand)
            return jnp.abs(Viv) > eps_sqrt

        restart = restart | jax.lax.cond(
            (~restart) & (beta < eps_sqrt),
            near_test,
            lambda _: jnp.asarray(False),
            None,
        )

    step_key = jax.random.fold_in(key, i)

    def do_restart(op):
        f_, _beta, nops_ = op
        f_n, beta_n, extra = _expand_basis(arnop, V, i, step_key, dtype)
        return f_n, beta_n, nops_ + extra

    f, beta, nops = jax.lax.cond(
        restart, do_restart, lambda op: op, (f, beta, nops)
    )

    # --- extend the basis -------------------------------------------
    v = f / jnp.maximum(beta, near_0)
    V = V.at[i].set(v)
    # H[i, i-1] is the unrestarted beta (0 after a restart).
    h_sub = jnp.where(restart, jnp.asarray(0.0, rdtype), beta).astype(dtype)
    return V, v, h_sub, nops, restart


def _step(arnop, state: KrylovState, i, mode: str) -> KrylovState:
    """One factorization step: extend from i columns to i+1."""
    mode, _ = _normalize_mode(mode)
    V, v, h_sub, nops, _ = _pre_op(arnop, state, i, mode)
    w = arnop.perform_op(v)
    nops = nops + 1

    f, beta, H = _post_op(arnop, V, state.H, v, w, h_sub, i, mode)

    return KrylovState(
        V=V, H=H, f=f, beta=beta, k=jnp.asarray(i + 1, jnp.int32),
        nops=nops, key=state.key,
    )


def _step_selective(arnop, state: KrylovState, i, w_prev, w_cur, force):
    """One Lanczos step with selective re-orthogonalization (Simon 1984
    / Parlett-Scott; the PROPACK recipe). The (n, m) DGKS projection is
    paid only when the omega recurrence — an O(m) estimate of the
    orthogonality loss <v_{i+1}, v_j> driven by the computed alpha/beta
    coefficients — predicts loss above sqrt(eps), preserving
    SEMIorthogonality (sufficient for Ritz values accurate to machine
    precision; Simon, Math. Comp. 42 (1984) 115-142). ARPACK-equivalent
    full DGKS remains the default mode; this is the opt-in fast path
    for operators whose per-step cost is dominated by the projections
    (e.g. a cheap sparse matvec, or a host-factored shift-solve at
    n ~ 1e6).

    Carries ``w_prev[j] ~ <v_{i-1}, v_j>`` and ``w_cur[j] ~ <v_i, v_j>``
    (real, length m); ``force`` re-orthogonalizes unconditionally (set
    on the first step after a restart, and on the step after any
    triggered re-orthogonalization — the Parlett-Scott pairwise rule).
    """
    V, v, h_sub, nops, restarted = _pre_op(arnop, state, i, "lanczos")
    w = arnop.perform_op(v)
    nops = nops + 1

    f, beta, H, w_cur, w_new, force_next = _post_op_selective(
        arnop, V, state.H, v, w, h_sub, i, w_prev, w_cur, force, restarted
    )
    new_state = KrylovState(
        V=V, H=H, f=f, beta=beta, k=jnp.asarray(i + 1, jnp.int32),
        nops=nops, key=state.key,
    )
    return new_state, w_cur, w_new, force_next


def _post_op_selective(arnop, V, H0, v, w, h_sub, i, w_prev, w_cur, force,
                       restarted):
    """Everything after ``w = A v`` on the selective path: three-term
    recurrence, omega-recurrence estimate, conditional DGKS. Shared
    verbatim by the fused :func:`_step_selective` and the split-program
    stepped path (:func:`split_step_finish_selective`)."""
    m, n = V.shape
    dtype = V.dtype
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    near_0 = jnp.asarray(dtypes.near_zero(dtype), rdtype)

    f, beta, H = _lanczos_coeffs(arnop, V, H0, v, w, h_sub, i)

    # Trigger at sqrt(eps/m) (PROPACK's delta), not sqrt(eps): the m
    # accumulated omega-level components perturb Ritz values jointly,
    # so the per-column budget shrinks with the basis size.
    delta = jnp.sqrt(eps / m)

    # --- omega recurrence --------------------------------------------
    # beta_i <v_{i+1}, v_j> = <v_i, A v_j> - alpha_i <v_i, v_j>
    #                         - beta_{i-1} <v_{i-1}, v_j>
    # with A v_j expanded by the three-term recurrence of column j.
    alpha_vec = jnp.real(jnp.diagonal(H))
    beta_vec = jnp.concatenate(
        [jnp.real(jnp.diagonal(H, offset=-1)), jnp.zeros((1,), rdtype)]
    )  # beta_vec[j] couples v_j and v_{j+1}
    w_cur = w_cur.at[i].set(1.0)
    alpha_i = jnp.real(H[i, i])
    beta_prev = jnp.real(h_sub).astype(rdtype)
    beta_new = jnp.maximum(beta, near_0)

    up = jnp.concatenate([w_cur[1:], jnp.zeros((1,), rdtype)])  # w_cur[j+1]
    dn = jnp.concatenate([jnp.zeros((1,), rdtype), w_cur[:-1]])  # w_cur[j-1]
    b_dn = jnp.concatenate([jnp.zeros((1,), rdtype), beta_vec[:-1]])
    w_new = (
        beta_vec * up
        + (alpha_vec - alpha_i) * w_cur
        + b_dn * dn
        - beta_prev * w_prev
    ) / beta_new
    # Rounding-noise floor of the recurrence itself (PROPACK's theta).
    w_new = w_new + jnp.sign(w_new) * (
        0.3 * eps * (beta_vec + beta_new) / beta_new
    )
    col = jnp.arange(m)
    local = eps * jnp.sqrt(jnp.asarray(n, rdtype))
    w_new = jnp.where(col < i, w_new, 0.0).at[i].set(local)

    need = force | restarted | (jnp.max(jnp.abs(w_new)) > delta)

    def do_reorth(args):
        f_, beta_, H_, w_ = args
        f2, beta2, H2 = _reorth_loop(
            arnop, V, f_, beta_, H_, i, "lanczos", jnp.asarray(False), dtype, n
        )
        w2 = jnp.where(col <= i, local, 0.0)
        return f2, beta2, H2, w2

    f, beta, H, w_new = jax.lax.cond(
        need, do_reorth, lambda a: a, (f, beta, H, w_new)
    )
    f, beta, H = _deflate_residual(arnop, f, beta, H)
    # Parlett-Scott: a triggered re-orthogonalization also forces one on
    # the following step (but a forced one does not cascade).
    force_next = need & (~force)
    return f, beta, H, w_cur, w_new, force_next


def _factorize_selective(arnop, state: KrylovState, from_k) -> KrylovState:
    """`factorize_from` with selective re-orthogonalization. The omega
    estimates live only inside this loop: the first step after every
    entry (init or restart compression, both of which invalidate the
    estimates) re-orthogonalizes unconditionally, and the entering
    basis is assumed semiorthogonal — the invariant this mode
    maintains."""
    m = state.V.shape[0]
    rdtype = dtypes.real_dtype(state.V.dtype)
    from_k = jnp.maximum(jnp.asarray(from_k, jnp.int32), 1)
    seed = 0.25 * jnp.sqrt(jnp.asarray(dtypes.eps(state.V.dtype), rdtype))
    col = jnp.arange(m)
    w0 = jnp.where(col < from_k, seed, 0.0)

    def body(i, carry):
        st, wp, wc, force = carry
        return _step_selective(arnop, st, i, wp, wc, force)

    state, _, _, _ = jax.lax.fori_loop(
        from_k, m, body, (state, w0, w0, jnp.asarray(True))
    )
    return state._replace(k=jnp.asarray(m, jnp.int32))


def step_once(arnop, state: KrylovState, i, mode: str) -> KrylovState:
    """Public single factorization step (used by thick restart to build
    the arrowhead column in full-projection mode)."""
    return _step(arnop, state, jnp.asarray(i, jnp.int32), mode)


def factorize_from(arnop, state: KrylovState, from_k, mode: str) -> KrylovState:
    """Extend the factorization from ``from_k`` steps to the full m.

    ``from_k`` may be a traced value: the loop is a ``fori_loop`` with a
    dynamic lower bound (lowered to a while loop). The body is always
    ``_step`` — no identity branch — so XLA aliases the loop-carried
    buffers and the (n, m) basis V updates in place. (An earlier
    predicated variant ``cond(i >= from_k, step, identity)`` forced a
    copy of V on every step to keep both branch outputs live: ~2 x 240MB
    of HBM traffic per step at n = 1e6, which dominated the entire
    solve.)
    """
    mode, selective = _normalize_mode(mode)
    if selective and mode == "lanczos" and not arnop.has_structure:
        return _factorize_selective(arnop, state, from_k)
    m = state.V.shape[0]
    from_k = jnp.maximum(jnp.asarray(from_k, jnp.int32), 1)

    def body(i, st):
        return _step(arnop, st, i, mode)

    state = jax.lax.fori_loop(from_k, m, body, state)
    return state._replace(k=jnp.asarray(m, jnp.int32))


def truncate_schur(arnop, state: KrylovState, U, T_new, k_new) -> KrylovState:
    """Krylov-Schur truncation: V <- V U (first ``k_new`` columns kept),
    H <- leading k x k block of the ordered (quasi-triangular) T, with
    the residual f left UNCHANGED.

    Unlike :func:`compress` (implicit restart), rotating into an ordered
    Schur basis leaves the residual vector invariant:
    ``A (V U_k) = (V U_k) T_k + f (e_m^T U_k)`` — the general spike row
    ``e_m^T U_k`` replaces the Arnoldi ``beta e_k^T`` coupling and is
    written into H's row ``k_new`` by the caller after re-expansion
    (factorize_from's first step overwrites ``H[k, k-1]``, so the row
    must be set afterwards). Stewart's Krylov-Schur restart; no
    reference counterpart (Spectra restarts only via shifted-QR sweeps,
    include/Spectra/GenEigsBase.h:44-140).
    """
    V, _, f, beta, _, nops, key = state
    m = V.shape[0]
    col = jnp.arange(m)
    # Masked rotation (see compress): avoids a third (m, n) buffer.
    Um = jnp.where(col[None, :] < k_new, U, 0.0).astype(V.dtype)
    V_new = basis_apply_block(V, Um)
    keep = (col[:, None] < k_new) & (col[None, :] < k_new)
    H_masked = jnp.where(keep, T_new.astype(V.dtype), 0.0)
    return KrylovState(
        V=V_new,
        H=H_masked,
        f=f,
        beta=beta,
        k=jnp.asarray(k_new, jnp.int32),
        nops=nops,
        key=key,
    )


def compress(arnop, state: KrylovState, Q, H_new, k_new) -> KrylovState:
    """Apply the restart rotation: V <- V Q (truncated to k columns),
    H <- H_new, f <- f * Q[m-1, k-1] + (VQ)[:, k] * H_new[k, k-1].

    ``k_new`` is traced; truncation is a column mask preserving the
    zero-tail invariant. The V update is a single (n, m, m) MXU matmul
    instead of the reference's per-column structured products
    (reference: Arnoldi.h:321-340).
    """
    V, _, f, _, _, nops, key = state
    m, n = V.shape
    col = jnp.arange(m)
    # Fold the keep-mask into the rotation (zero the dropped COLUMNS of
    # Q) instead of masking the (m, n) product afterwards: the masked
    # where() forced a third ncv-by-n buffer next to V and VQ, which at
    # the 100M-nnz scale (4.6 GB each) pushed the restart-compress
    # program past the v5e HBM. The masked rotation writes exact zero
    # rows directly; the single row VQ[k_new] that f_new needs is one
    # extra n-vector.
    Qm = jnp.where(col[None, :] < k_new, Q, 0.0).astype(V.dtype)
    V_new = basis_apply_block(V, Qm)

    sigma = Q[m - 1, k_new - 1].astype(V.dtype)
    vq_k = basis_apply(V, jnp.take(Q, k_new, axis=1).astype(V.dtype))
    f_new = f * sigma + vq_k * H_new[k_new, k_new - 1]
    beta_new = arnop.norm(f_new)

    keep = (col[:, None] < k_new) & (col[None, :] < k_new)
    H_masked = jnp.where(keep, H_new, 0.0)

    return KrylovState(
        V=V_new,
        H=H_masked,
        f=f_new,
        beta=beta_new,
        k=jnp.asarray(k_new, jnp.int32),
        nops=nops,
        key=key,
    )


# -- split-program stepped pieces --------------------------------------
#
# The matvec-granularity driver (HermEigsBase.set_matvec_granularity)
# originally replayed `_step` as ONE program per step — but when
# perform_op is itself a large compiled inner solve (multigrid/Chebyshev
# at n ~ 1e6), every op-containing program pays minutes of emulated-f64
# compilation and tens of seconds of per-process executable load. These
# pieces split the step so the operator appears in exactly ONE tiny
# program (`solvers._herm_core.stepped_apply`); everything else is
# op-free algebra. Breakdown decisions move to the host, which already
# holds ||f|| (the stepped driver syncs it every step). Arithmetic is
# shared with `_step` via `_post_op`, so fused and split paths compute
# identical sequences.


def split_near_test(arnop, state: KrylovState, i):
    """|<V_{i-1}, f/||f||>| — the Lanczos near-breakdown probe
    (op-free; reference: Lanczos.h:99-114)."""
    V, _, f, beta, *_ = state
    near_0 = jnp.asarray(dtypes.near_zero(V.dtype), dtypes.real_dtype(V.dtype))
    v_cand = f / jnp.maximum(beta, near_0)
    return jnp.abs(arnop.inner_product(V[i - 1], v_cand))


def split_expand_rand(key, i, it, like):
    """The deterministic random restart vector of expansion try ``it``
    at step ``i`` — bit-identical to `_expand_basis`'s stream."""
    sub = jax.random.fold_in(jax.random.fold_in(key, i), it)
    return uniform_m05_05(sub, like.shape, like.dtype)


def split_expand_correct(arnop, V, f0):
    """DGKS-correct an expansion candidate against V (op-free): the
    inner <=3-correction loop of `_expand_basis`'s attempt. Returns
    ``(f, fnorm, ok)``."""
    dtype = V.dtype
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)
    Vp = arnop.ortho_basis(V)

    f0 = arnop.deflate(f0)  # no-op unless the operator is deflated
    Vf = arnop.adjoint_product(Vp, f0)
    f1 = f0 - basis_apply(Vp, Vf)
    fn = arnop.norm(f1)
    Vf = arnop.adjoint_product(Vp, f1)
    oe = _maxabs(Vf)

    def c_cond(c):
        _, fn_c, _, oe_c, cnt = c
        return (cnt < 3) & (oe_c >= eps * fn_c)

    def c_body(c):
        f_c, fn_c, Vf_c, _, cnt = c
        f_c = f_c - basis_apply(Vp, Vf_c)
        fn_c = arnop.norm(f_c)
        Vf_c = arnop.adjoint_product(Vp, f_c)
        return (f_c, fn_c, Vf_c, _maxabs(Vf_c), cnt + 1)

    f2, fn2, _, oe2, _ = jax.lax.while_loop(
        c_cond, c_body, (f1, fn, Vf, oe, jnp.asarray(0, jnp.int32))
    )
    return f2, fn2, oe2 < eps * fn2


def split_set_column(state: KrylovState, i):
    """``v = f/||f||`` written into column i (op-free). Returns
    ``(state, v)``; the caller applies the operator to v."""
    V = state.V
    near_0 = jnp.asarray(dtypes.near_zero(V.dtype), dtypes.real_dtype(V.dtype))
    v = state.f / jnp.maximum(state.beta, near_0)
    return state._replace(V=V.at[i].set(v)), v


def split_step_finish(
    arnop, state: KrylovState, w, i, restarted, nops_inc, mode: str,
    defer_deflate: bool = False,
) -> KrylovState:
    """Post-operator half of the step (op-free): recurrence, residual,
    re-orthogonalization — shared arithmetic with `_step` via
    `_post_op`. ``restarted`` zeroes the subdiagonal coupling after a
    breakdown expansion; ``nops_inc`` carries the host-counted operator
    applications of this step."""
    V, H, _, beta, _, nops, key = state
    rdtype = dtypes.real_dtype(V.dtype)
    h_sub = jnp.where(restarted, jnp.asarray(0.0, rdtype), beta).astype(V.dtype)
    v = V[i]
    f, beta, H = _post_op(
        arnop, V, H, v, w, h_sub, i, mode, defer_deflate=defer_deflate
    )
    return KrylovState(
        V=V,
        H=H,
        f=f,
        beta=beta,
        k=jnp.asarray(i + 1, jnp.int32),
        nops=nops + nops_inc,
        key=key,
    )


def split_step_finish_selective(
    arnop, state: KrylovState, w, i, w_prev, w_cur, force, restarted, nops_inc
):
    """Selective-reorth twin of :func:`split_step_finish` (op-free):
    the post-operator half of :func:`_step_selective` — three-term
    recurrence, omega-recurrence orthogonality estimate, and the DGKS
    projection only when the estimate crosses the PROPACK trigger.
    Returns ``(state, w_prev', w_cur', force')`` with the omega carry
    the host loop threads between steps; same arithmetic as the fused
    selective path so stepped and compiled drivers agree bit-for-bit.
    """
    V, H0, _, beta0, _, nops, key = state
    rdtype = dtypes.real_dtype(V.dtype)
    h_sub = jnp.where(
        restarted, jnp.asarray(0.0, rdtype), beta0
    ).astype(V.dtype)
    v = V[i]
    f, beta, H, w_cur, w_new, force_next = _post_op_selective(
        arnop, V, H0, v, w, h_sub, i, w_prev, w_cur, force, restarted
    )
    new_state = KrylovState(
        V=V, H=H, f=f, beta=beta, k=jnp.asarray(i + 1, jnp.int32),
        nops=nops + nops_inc, key=key,
    )
    return new_state, w_cur, w_new, force_next


def split_omega_seed(m: int, from_k, dtype):
    """The omega carry that re-enters the selective loop after init or
    restart compression — matches `_factorize_selective`'s entry state
    (assumed-semiorthogonal basis, unconditional first reorth)."""
    rdtype = dtypes.real_dtype(jnp.dtype(dtype))
    seed = 0.25 * jnp.sqrt(jnp.asarray(dtypes.eps(dtype), rdtype))
    col = jnp.arange(m)
    w0 = jnp.where(col < from_k, seed, jnp.asarray(0.0, rdtype))
    return w0, w0, jnp.asarray(True)


def split_init_normalize(arnop, v0, vraw):
    """``v = (A v0)/||A v0||`` with the null-space fallback of `init`
    (op-free; ``vraw = A v0`` supplied by the caller)."""
    rdtype = dtypes.real_dtype(v0.dtype)
    near_0 = jnp.asarray(dtypes.near_zero(v0.dtype), rdtype)
    v0norm = arnop.norm(v0)
    vnorm = arnop.norm(vraw)
    v = jnp.where(
        vnorm < near_0, v0 / v0norm, vraw / jnp.maximum(vnorm, near_0)
    )
    return _structure_clean(arnop, v)


def split_init_finish(arnop, v, w, key, m: int) -> KrylovState:
    """Tail of `init` given ``w = A v`` (op-free): h00, residual,
    structure cleanup, force-zero edge case, state assembly."""
    n = v.shape[0]
    dtype = v.dtype
    rdtype = dtypes.real_dtype(dtype)
    eps = jnp.asarray(dtypes.eps(dtype), rdtype)

    h00 = arnop.inner_product(v, w)
    f = w - h00 * v
    if arnop.has_structure:
        jv = arnop.ortho_basis(v[None, :])[1:]
        f = f - basis_apply(jv, arnop.adjoint_product(jv, f))

    force_zero = _maxabs(f) < eps * jnp.abs(h00)
    f = jnp.where(force_zero, jnp.zeros_like(f), f)
    beta = jnp.where(force_zero, jnp.asarray(0.0, rdtype), arnop.norm(f))

    V = jnp.zeros((m, n), dtype).at[0].set(v)
    H = jnp.zeros((m, m), dtype).at[0, 0].set(h00)
    return KrylovState(
        V=V,
        H=H,
        f=f,
        beta=beta,
        k=jnp.asarray(1, jnp.int32),
        nops=jnp.asarray(2, jnp.int64),
        key=key,
    )
