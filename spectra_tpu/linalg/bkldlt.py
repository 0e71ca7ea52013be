"""Bunch-Kaufman LDL^H factorization of symmetric/Hermitian matrices.

TPU-native counterpart of the reference's BKLDLT
(reference: include/Spectra/LinAlg/BKLDLT.h:69-710): factorizes
``P (A - sigma I) P^T = L D L^H`` with L unit lower triangular and D
block diagonal with 1x1/2x2 pivots chosen by Bunch-Kaufman partial
pivoting, then solves ``(A - sigma I) x = b`` by permute -> triangular
solve -> block-diagonal solve -> adjoint triangular solve -> unpermute.

Design (functional, one compiled program — not a translation of the
reference's packed-pointer storage):

* the factorization is a ``lax.while_loop`` over the (data-dependent
  1-or-2 step) pivot index; each body does full-matrix masked updates,
  so all shapes are static and XLA fuses the rank-1/rank-2 trailing
  updates into single VPU sweeps;
* pivot interchanges are row+column gathers of the working matrix;
* the solve phase is XLA-native: two ``solve_triangular`` calls (the
  blocked MXU path) plus a vectorized closed-form 2x2 block-diagonal
  solve — nothing sequential at solve time, which matters because the
  solve runs once per IRLM iteration while the factorization runs once
  per shift.

Supports real symmetric and complex Hermitian matrices (reference
gained Hermitian support in v1.1.0, CHANGELOG.md:36).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.util import dtypes


_ALPHA = 0.6403882032022076  # (1 + sqrt(17)) / 8, the B-K constant


class BKFactors(NamedTuple):
    """The factorization ``P A P^T = L D L^H``."""

    L: jax.Array  # (n, n) unit lower triangular
    d: jax.Array  # (n,) diagonal of D
    e: jax.Array  # (n,) subdiagonal of D: e[k] = D[k+1, k] for 2x2 pivots
    is2x2: jax.Array  # (n,) bool: True at the first index of a 2x2 pivot
    perm: jax.Array  # (n,) int32: row k of the pivoted matrix is A[perm[k]]
    ok: jax.Array  # bool: False if a pivot block was singular


class _FactorCarry(NamedTuple):
    M: jax.Array
    L: jax.Array
    d: jax.Array
    e: jax.Array
    is2x2: jax.Array
    perm: jax.Array
    ok: jax.Array
    k: jax.Array


def _swap_sym(M, p, q):
    """Exchange rows and columns p, q of the full symmetric matrix."""
    n = M.shape[0]
    idx = jnp.arange(n)
    idx = idx.at[p].set(q).at[q].set(p)
    return M[idx][:, idx], idx


def factorize(A, shift=0.0) -> BKFactors:
    """Factorize ``A - shift I`` (A full symmetric/Hermitian)."""
    A = jnp.asarray(A)
    n = A.shape[0]
    dtype = A.dtype
    rdtype = dtypes.real_dtype(dtype)
    alpha = jnp.asarray(_ALPHA, rdtype)
    i_idx = jnp.arange(n)

    diag_mask = jnp.eye(n, dtype=bool)

    def realify_diag(M):
        """Keep the Hermitian diagonal exactly real: LAPACK does the
        same (zhetf2 reads DBLE(A(k,k))); letting rounding-noise
        imaginary parts survive compounds exponentially across the
        trailing updates."""
        if not dtypes.is_complex(dtype):
            return M
        return jnp.where(diag_mask, jnp.real(M).astype(dtype), M)

    M0 = realify_diag(A - jnp.asarray(shift, dtype) * jnp.eye(n, dtype=dtype))

    def cond(c: _FactorCarry):
        return c.k < n

    def body(c: _FactorCarry):
        M, L, d, e, is2, perm, ok, k = c

        # --- Bunch-Kaufman pivot selection (BKLDLT.h:246-295) --------
        absakk = jnp.abs(M[k, k])
        colabs = jnp.where(i_idx > k, jnp.abs(M[:, k]), -1.0)
        r = jnp.argmax(colabs).astype(jnp.int32)
        colmax = jnp.maximum(colabs[r], 0.0)

        # rowmax = max |M[r, j]| over j >= k, j != r (M is kept full
        # symmetric, so row r of the trailing block is M[r, :]).
        rowabs = jnp.where((i_idx >= k) & (i_idx != r), jnp.abs(M[r, :]), -1.0)
        rowmax = jnp.maximum(jnp.max(rowabs), 0.0)

        take_k_direct = absakk >= alpha * colmax
        take_k_rowtest = absakk * rowmax >= alpha * colmax * colmax
        take_r_1x1 = jnp.abs(M[r, r]) >= alpha * rowmax
        use_1x1 = take_k_direct | take_k_rowtest | take_r_1x1
        # swap target: k (no-op) for the first two branches, r otherwise
        swap_with_r = (~take_k_direct) & (~take_k_rowtest) & take_r_1x1
        # 2x2 pivot swaps row k+1 with r (BKLDLT.h:299-367)
        p = jnp.where(use_1x1, k, k + 1)
        q = jnp.where(use_1x1, jnp.where(swap_with_r, r, p), r)

        M, idx = _swap_sym(M, p, q)
        perm = perm[idx]
        # Previously-written L columns (j < k) must see the same row
        # interchange (LAPACK convention: interchanges apply to L too).
        Lrows = L[idx]
        col_j = i_idx[None, :]
        L = jnp.where(col_j < k, Lrows, L)

        row_gt = i_idx > k
        row_gt1 = i_idx > k + 1

        def pivot_1x1(args):
            M, L, d, e, is2, ok = args
            akk = M[k, k]
            sing = jnp.abs(akk) == 0.0
            inv = jnp.where(sing, jnp.asarray(0.0, dtype), 1.0 / akk)
            lcol = jnp.where(row_gt, M[:, k] * inv, 0.0)
            # trailing update: M[i, j] -= lcol[i] * conj(M[j, k]) for i,j > k
            upd = jnp.outer(lcol, jnp.conj(M[:, k]))
            mask = row_gt[:, None] & row_gt[None, :]
            M = realify_diag(jnp.where(mask, M - upd, M))
            L = jnp.where((i_idx[:, None] > k) & (col_j == k), lcol[:, None], L)
            L = jnp.where((i_idx[:, None] == k) & (col_j == k), 1.0, L)
            d = jnp.where(i_idx == k, akk, d)
            ok = ok & ~sing
            return M, L, d, e, is2, ok, jnp.asarray(1, jnp.int32)

        def pivot_2x2(args):
            M, L, d, e, is2, ok = args
            a = M[k, k]
            b = M[k + 1, k]
            cdiag = M[k + 1, k + 1]
            det = a * cdiag - b * jnp.conj(b)
            sing = jnp.abs(det) == 0.0
            invdet = jnp.where(sing, jnp.asarray(0.0, dtype), 1.0 / det)
            # inv(D2) = invdet * [[c, -conj(b)], [-b, a]]
            w1 = M[:, k]
            w2 = M[:, k + 1]
            # L2 = W inv(D2), inv(D2) = [[c, -conj(b)], [-b, a]] / det
            l1 = (w1 * cdiag - w2 * b) * invdet
            l2 = (w2 * a - w1 * jnp.conj(b)) * invdet
            l1 = jnp.where(row_gt1, l1, 0.0)
            l2 = jnp.where(row_gt1, l2, 0.0)
            upd = jnp.outer(l1, jnp.conj(w1)) + jnp.outer(l2, jnp.conj(w2))
            mask = row_gt1[:, None] & row_gt1[None, :]
            M = realify_diag(jnp.where(mask, M - upd, M))
            rows = i_idx[:, None]
            L = jnp.where((rows > k + 1) & (col_j == k), l1[:, None], L)
            L = jnp.where((rows > k + 1) & (col_j == k + 1), l2[:, None], L)
            L = jnp.where((rows == k) & (col_j == k), 1.0, L)
            L = jnp.where((rows == k + 1) & (col_j == k + 1), 1.0, L)
            d = jnp.where(i_idx == k, a, d)
            d = jnp.where(i_idx == k + 1, cdiag, d)
            e = jnp.where(i_idx == k, b, e)
            is2 = is2 | (i_idx == k)
            ok = ok & ~sing
            return M, L, d, e, is2, ok, jnp.asarray(2, jnp.int32)

        M, L, d, e, is2, ok, step = jax.lax.cond(
            use_1x1, pivot_1x1, pivot_2x2, (M, L, d, e, is2, ok)
        )
        return _FactorCarry(M, L, d, e, is2, perm, ok, k + step)

    init = _FactorCarry(
        M=M0,
        L=jnp.eye(n, dtype=dtype),
        d=jnp.zeros((n,), dtype),
        e=jnp.zeros((n,), dtype),
        is2x2=jnp.zeros((n,), bool),
        perm=jnp.arange(n, dtype=jnp.int32),
        ok=jnp.asarray(True),
        k=jnp.asarray(0, jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return BKFactors(
        L=out.L, d=out.d, e=out.e, is2x2=out.is2x2, perm=out.perm, ok=out.ok
    )


def _block_diag_solve(fac: BKFactors, z):
    """Solve D w = z for the 1x1/2x2 block-diagonal D, vectorized.

    For a 2x2 block at (k, k+1) with D = [[a, conj(b)], [b, c]]:
      w[k]   = ( c z[k] - conj(b) z[k+1]) / det
      w[k+1] = (-b z[k] + a z[k+1]) / det
    (reference: BKLDLT.h:388-423 solves these with partial pivoting;
    the closed form is algebraically identical and branch-free).
    """
    d, e, is2 = fac.d, fac.e, fac.is2x2
    n = d.shape[0]
    # second slot of each 2x2 block
    is2b = jnp.concatenate([jnp.zeros((1,), bool), is2[:-1]])
    only1 = ~(is2 | is2b)

    z_next = jnp.concatenate([z[1:], jnp.zeros((1,), z.dtype)])
    z_prev = jnp.concatenate([jnp.zeros((1,), z.dtype), z[:-1]])
    d_next = jnp.concatenate([d[1:], jnp.ones((1,), d.dtype)])
    d_prev = jnp.concatenate([jnp.ones((1,), d.dtype), d[:-1]])
    e_prev = jnp.concatenate([jnp.zeros((1,), e.dtype), e[:-1]])

    det = jnp.where(is2, d * d_next - e * jnp.conj(e), 1.0)
    det_prev = jnp.concatenate([jnp.ones((1,), det.dtype), det[:-1]])

    w_1x1 = z / jnp.where(only1, d, 1.0)
    w_2a = (d_next * z - jnp.conj(e) * z_next) / det
    w_2b = (-e_prev * z_prev + d_prev * z) / det_prev
    w = jnp.where(only1, w_1x1, jnp.where(is2, w_2a, w_2b))
    return w


def solve(fac: BKFactors, b):
    """Solve ``(A - sigma I) x = b`` given the factorization.

    Supports 1-D vectors and blocks of column vectors.
    """
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    B = B.astype(fac.L.dtype)

    PB = B[fac.perm, :]
    Z = jax.scipy.linalg.solve_triangular(fac.L, PB, lower=True, unit_diagonal=True)
    W = jax.vmap(lambda col: _block_diag_solve(fac, col), in_axes=1, out_axes=1)(Z)
    Y = jax.scipy.linalg.solve_triangular(
        jnp.conj(fac.L).T, W, lower=False, unit_diagonal=True
    )
    n = fac.L.shape[0]
    X = jnp.zeros_like(Y).at[fac.perm, :].set(Y)
    return X[:, 0] if vec else X
