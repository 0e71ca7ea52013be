"""MINRES for symmetric (indefinite) systems.

The on-device inner solver for sparse shift-invert on runtimes without
host callbacks: ``(A - sigma I)`` is symmetric *indefinite* whenever
sigma sits inside the spectrum, where CG is invalid and BiCGStab is
erratic; MINRES (Paige & Saunders 1975) is the method of choice —
a three-term Lanczos recurrence with on-the-fly Givens QR of the
tridiagonal, monotonically decreasing residual, one matvec per step.

Pure jnp under ``lax.while_loop``: compiles into the outer IRLM
program like any other operator.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.ops.gemv import vec_dot


class _State(NamedTuple):
    x: jax.Array
    v: jax.Array  # current Lanczos vector
    v_old: jax.Array
    w1: jax.Array  # previous two update directions
    w0: jax.Array
    beta: jax.Array  # current subdiagonal
    eta: jax.Array  # residual-norm recurrence
    c1: jax.Array  # previous two Givens cosines/sines
    s1: jax.Array
    c0: jax.Array
    s0: jax.Array
    it: jax.Array


def minres(matvec, b, rtol=1e-12, maxiter=None):
    """Solve ``A x = b`` (A symmetric, possibly indefinite).

    Returns ``(x, relative_residual_estimate)``.
    """
    n = b.shape[0]
    if maxiter is None:
        # Practical cap: an inner solve that needs more than this is a
        # failure to surface (NaN-poisoning upstream), not to grind out.
        maxiter = min(10 * n, 20000)
    dtype = b.dtype

    beta1 = jnp.linalg.norm(b)
    safe_beta1 = jnp.where(beta1 > 0, beta1, 1.0)
    v1 = b / safe_beta1

    init = _State(
        x=jnp.zeros_like(b),
        v=v1,
        v_old=jnp.zeros_like(b),
        w1=jnp.zeros_like(b),
        w0=jnp.zeros_like(b),
        beta=jnp.asarray(0.0, dtype),
        eta=beta1,
        c1=jnp.asarray(1.0, dtype),
        s1=jnp.asarray(0.0, dtype),
        c0=jnp.asarray(1.0, dtype),
        s0=jnp.asarray(0.0, dtype),
        it=jnp.asarray(0, jnp.int32),
    )

    tol_abs = rtol * safe_beta1

    def cond(s: _State):
        return (jnp.abs(s.eta) > tol_abs) & (s.it < maxiter)

    def body(s: _State):
        # Lanczos step
        z = matvec(s.v) - s.beta * s.v_old
        alpha = vec_dot(s.v, z)
        z = z - alpha * s.v
        beta_new = jnp.linalg.norm(z)
        v_new = z / jnp.where(beta_new > 0, beta_new, 1.0)

        # Apply the two previous rotations to the new tridiag column
        delta = s.c1 * alpha - s.c0 * s.s1 * s.beta
        rho2 = s.s1 * alpha + s.c0 * s.c1 * s.beta
        rho3 = s.s0 * s.beta
        rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        rho1_safe = jnp.where(rho1 > 0, rho1, 1.0)
        c_new = delta / rho1_safe
        s_new = beta_new / rho1_safe

        w_new = (s.v - rho3 * s.w0 - rho2 * s.w1) / rho1_safe
        x = s.x + (c_new * s.eta) * w_new
        eta = -s_new * s.eta

        return _State(
            x=x,
            v=v_new,
            v_old=s.v,
            w1=w_new,
            w0=s.w1,
            beta=beta_new,
            eta=eta,
            c1=c_new,
            s1=s_new,
            c0=s.c1,
            s0=s.s1,
            it=s.it + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out.x, jnp.abs(out.eta) / safe_beta1
