"""Shifted QR sweeps on upper Hessenberg matrices.

Replicated ncv-by-ncv micro-kernels of the implicitly restarted Arnoldi
method — TPU-native counterparts of the reference's UpperHessenbergQR
(reference: include/Spectra/LinAlg/UpperHessenbergQR.h:47-447, real and
complex scalars) and DoubleShiftQR (DoubleShiftQR.h:21-438, the Francis
sweep of ``H^2 - s H + t I`` used for conjugate shift pairs on real
matrices).

Design: each sweep is a ``lax.scan`` over the O(ncv) sequential
rotation/reflector chain (latency-bound, replicated — the right shape
per SURVEY.md section 7 hard-part #3), but the outputs are a **dense
accumulated Q** plus the transformed H, so the expensive consumers
(``V <- V Q`` over the sharded n dimension) are single MXU matmuls.

Conventions (matching :mod:`spectra_tpu.linalg.givens`):
  left-apply   row_i' = c row_i - s row_{i+1};
               row_{i+1}' = conj(s) row_i + c row_{i+1}
  right-apply  col_i' = c col_i - conj(s) col_{i+1};
               col_{i+1}' = s col_i + c col_{i+1}
with c real and s complex for complex scalars (LAPACK LAWN-150, as in
the reference's Givens.h:218-335).
"""

import jax
import jax.numpy as jnp

from spectra_tpu.linalg.givens import givens_rotation, givens_rotation_complex
from spectra_tpu.util import dtypes


def _left_apply(M, i, c, s):
    """Apply the i-th rotation to rows (i, i+1) of M."""
    rows = jax.lax.dynamic_slice(M, (i, jnp.zeros_like(i)), (2, M.shape[1]))
    top = c * rows[0] - s * rows[1]
    bot = jnp.conj(s) * rows[0] + c * rows[1]
    return jax.lax.dynamic_update_slice(
        M, jnp.stack([top, bot]), (i, jnp.zeros_like(i))
    )


def _right_apply(M, i, c, s):
    """Apply the i-th rotation to columns (i, i+1) of M."""
    cols = jax.lax.dynamic_slice(M, (jnp.zeros_like(i), i), (M.shape[0], 2))
    left = c * cols[:, 0] - jnp.conj(s) * cols[:, 1]
    right = s * cols[:, 0] + c * cols[:, 1]
    return jax.lax.dynamic_update_slice(
        M, jnp.stack([left, right], axis=1), (jnp.zeros_like(i), i)
    )


def hessenberg_qr(H, shift):
    """One implicit shifted-QR sweep: ``H - shift I = Q R``, returning
    ``(H_new, Q)`` with ``H_new = R Q + shift I = Q^H H Q`` and Q dense.

    Works for real H with real shift, and complex H with complex shift
    (the reference's real/complex UpperHessenbergQR duality).
    """
    m = H.shape[0]
    dtype = H.dtype
    complex_ = dtypes.is_complex(dtype)
    giv = givens_rotation_complex if complex_ else givens_rotation
    rdtype = dtypes.real_dtype(dtype)

    R0 = H - jnp.asarray(shift, dtype) * jnp.eye(m, dtype=dtype)
    idx = jnp.arange(m - 1, dtype=jnp.int32)

    def qr_step(R, i):
        c, s, _ = giv(R[i, i], R[i + 1, i])
        c = c.astype(rdtype)
        s = s.astype(dtype)
        return _left_apply(R, i, c, s), (c, s)

    R, (cs, ss) = jax.lax.scan(qr_step, R0, idx)

    # T = R Q + shift I and dense Q, by right-applying the chain.
    def rq_step(carry, inp):
        T, Q = carry
        i, c, s = inp
        return (_right_apply(T, i, c, s), _right_apply(Q, i, c, s)), None

    (T, Q), _ = jax.lax.scan(
        rq_step, (R, jnp.eye(m, dtype=dtype)), (idx, cs, ss)
    )
    T = T + jnp.asarray(shift, dtype) * jnp.eye(m, dtype=dtype)
    # Rounding fill strictly below the subdiagonal is structurally zero.
    T = clip_to_hessenberg(T)
    return T, Q


def clip_to_hessenberg(M):
    """Zero all entries below the first subdiagonal."""
    m = M.shape[0]
    r = jnp.arange(m)
    keep = r[:, None] <= r[None, :] + 1
    return jnp.where(keep, M, 0.0)


def _householder3(x, eps_scale):
    """3-element Householder vector v (unit or zero) with
    ``(I - 2 v v^H) x = alpha e1``; returns v = 0 when x[1:] is
    negligible (no reflection needed), using the reference's
    stable-norm idea (DoubleShiftQR.h:51-104)."""
    xnorm = jnp.linalg.norm(x)
    tail = jnp.sqrt(jnp.abs(x[1]) ** 2 + jnp.abs(x[2]) ** 2)
    negligible = tail <= eps_scale * jnp.maximum(xnorm, eps_scale)
    alpha = jnp.where(x[0] >= 0, -xnorm, xnorm)
    v = x - jnp.array([1.0, 0.0, 0.0], x.dtype) * alpha
    vnorm = jnp.linalg.norm(v)
    v = jnp.where(
        negligible | (vnorm == 0), jnp.zeros_like(v), v / jnp.maximum(vnorm, 1e-300)
    )
    return v


def double_shift_qr(H, s, t):
    """Francis double-shift sweep: implicit QR of ``H^2 - s H + t I``
    for real upper Hessenberg H, returning ``(H_new, Q)`` with
    ``H_new = Q^T H Q``.

    The bulge chase re-seeds at internal deflation points — the
    reference's block-partition strategy (DoubleShiftQR.h:334-398)
    expressed as a per-step predicate: a step whose left neighbor
    subdiagonal is negligible starts a fresh shifted first column
    instead of chasing the (vanished) bulge.
    """
    m = H.shape[0]
    dtype = H.dtype
    eps = jnp.asarray(dtypes.eps(dtype), dtype)

    # Pad by two rows/cols of zeros: every step uniformly reads a
    # 3-window; windows that cross the true boundary see zeros and the
    # Householder degenerates to 2- or 0-element automatically.
    Hp = jnp.zeros((m + 2, m + 2), dtype).at[:m, :m].set(H)
    Qp = jnp.zeros((m, m + 2), dtype).at[:, :m].set(jnp.eye(m, dtype=dtype))

    def step(carry, i):
        Hp, Qp = carry

        hsub = Hp[i, i - 1]  # left-neighbor subdiagonal (i == 0 wraps
        # to Hp[0, -1] which is structurally 0 -> new block, correct)
        near0 = eps * (jnp.abs(Hp[i - 1, i - 1]) + jnp.abs(Hp[i, i]))
        new_block = jnp.abs(hsub) <= near0

        h00 = Hp[i, i]
        h10 = Hp[i + 1, i]
        x_new = jnp.stack(
            [
                h00 * h00 + Hp[i, i + 1] * h10 - s * h00 + t,
                h10 * (h00 + Hp[i + 1, i + 1] - s),
                h10 * Hp[i + 2, i + 1],
            ]
        )
        x_bulge = jnp.stack([hsub, Hp[i + 1, i - 1], Hp[i + 2, i - 1]])
        x = jnp.where(new_block, x_new, x_bulge)

        scale = jnp.max(jnp.abs(x))
        xs = x / jnp.where(scale > 0, scale, 1.0)
        v = _householder3(xs, eps)

        # P = I - 2 v v^T on rows i..i+2 (all columns) ...
        rows = jax.lax.dynamic_slice(Hp, (i, jnp.int32(0)), (3, m + 2))
        rows = rows - 2.0 * jnp.outer(v, v @ rows)
        Hp2 = jax.lax.dynamic_update_slice(Hp, rows, (i, jnp.int32(0)))
        # ... and columns i..i+2 (all rows), same for Q.
        cols = jax.lax.dynamic_slice(Hp2, (jnp.int32(0), i), (m + 2, 3))
        cols = cols - 2.0 * jnp.outer(cols @ v, v)
        Hp2 = jax.lax.dynamic_update_slice(Hp2, cols, (jnp.int32(0), i))
        qcols = jax.lax.dynamic_slice(Qp, (jnp.int32(0), i), (m, 3))
        qcols = qcols - 2.0 * jnp.outer(qcols @ v, v)
        Qp2 = jax.lax.dynamic_update_slice(Qp, qcols, (jnp.int32(0), i))

        # Restore the known zeros of the chased column (kills rounding
        # noise where the bulge was annihilated).
        def clear_bulge(Hc):
            col = jax.lax.dynamic_slice(Hc, (i + 1, i - 1), (2, 1))
            return jax.lax.dynamic_update_slice(
                Hc, jnp.zeros_like(col), (i + 1, i - 1)
            )

        Hp2 = jax.lax.cond(new_block | (i == 0), lambda h: h, clear_bulge, Hp2)
        return (Hp2, Qp2), None

    (Hp, Qp), _ = jax.lax.scan(
        step, (Hp, Qp), jnp.arange(m - 1, dtype=jnp.int32)
    )
    H_new = clip_to_hessenberg(Hp[:m, :m])
    Q = Qp[:, :m]
    return H_new, Q
