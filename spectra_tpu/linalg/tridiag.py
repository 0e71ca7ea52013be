"""Shifted QR sweep and eigendecomposition of symmetric tridiagonal matrices.

These are the replicated ncv-by-ncv micro-kernels of the implicitly
restarted Lanczos method. The reference implements them as sequential
in-place loops (reference: include/Spectra/LinAlg/UpperHessenbergQR.h:
459-709, TridiagQR); here each sweep is a ``lax.scan`` over scalar
carries — O(ncv) tiny sequential steps, which is the right shape for a
replicated problem whose cost is latency, not throughput — and the
basis rotation is accumulated into a dense Q so the expensive part
(V <- V @ Q over the sharded n dimension) is a single MXU matmul.

Semantics are rule-for-rule those of the reference:
  * small subdiagonal entries are deflated to zero before the sweep
    when |e_i| <= eps * (|d_i| + |d_{i+1}|) (UpperHessenbergQR.h:533-539);
  * Q^T T Q is applied analytically to (diag, subdiag) so exact symmetry
    and tridiagonal form are preserved (UpperHessenbergQR.h:627-693);
  * the result is re-deflated with the same criterion.

The tridiagonal eigendecomposition delegates to ``jnp.linalg.eigh`` on
the (tiny, replicated) dense embedding — XLA's eigh is the native TPU
path, replacing the reference's hand-written QL/QR sweeps
(reference: include/Spectra/LinAlg/TridiagEigen.h:25-228).
"""

import jax
import jax.numpy as jnp

from spectra_tpu.linalg.givens import givens_rotation


def deflate_subdiag(diag, subdiag):
    """Zero out negligibly small subdiagonal entries."""
    eps = jnp.finfo(diag.dtype).eps
    thresh = eps * (jnp.abs(diag[:-1]) + jnp.abs(diag[1:]))
    return jnp.where(jnp.abs(subdiag) <= thresh, 0.0, subdiag)


def tridiag_qr(diag, subdiag, shift):
    """Givens rotations of the QR decomposition ``T - shift*I = QR``.

    Args:
      diag: (m,) diagonal of symmetric tridiagonal T.
      subdiag: (m-1,) subdiagonal of T.
      shift: scalar shift.

    Returns:
      (c, s, subdiag_deflated): rotation cosines/sines, each (m-1,), and
      the deflated subdiagonal actually used (needed by ``tridiag_qtq``).
    """
    e = deflate_subdiag(diag, subdiag)
    d = diag - shift

    # Scan carry: (rd, rs) = current values of R[i, i] and R[i, i+1]
    # entering step i. R[i+1, i] is always the untouched (deflated)
    # subdiagonal e[i], since earlier rotations only touch rows < i+1.
    def step(carry, inp):
        rd, rs = carry
        e_i, d_next, e_next = inp
        c, s, _r = givens_rotation(rd, e_i)
        rd_next = s * rs + c * d_next
        rs_next = c * e_next
        return (rd_next, rs_next), (c, s)

    e_pad = jnp.concatenate([e[1:], jnp.zeros((1,), e.dtype)])
    (_, _), (c, s) = jax.lax.scan(step, (d[0], e[0]), (e, d[1:], e_pad))
    return c, s, e


def tridiag_qtq(diag, subdiag_deflated, c, s):
    """Apply ``T -> Q^T T Q`` analytically on (diag, subdiag).

    ``subdiag_deflated`` must be the deflated subdiagonal returned by
    ``tridiag_qr``. Returns the new (diag, subdiag), re-deflated.
    """
    d, e = diag, subdiag_deflated
    m = d.shape[0]

    # Each step rotates rows/cols (i, i+1) of the evolving matrix:
    #   x' = c^2 x - 2csy + s^2 z        (new diag[i])
    #   y' = cs(x - z) + (c^2 - s^2) y   (new subdiag[i], pre-correction)
    #   z' = s^2 x + 2csy + c^2 z        (carried as next x)
    # and the next rotation folds the fill-in o = -s*e[i+1] back into
    # y'' = c_{i+1} y' - s_{i+1} o; w' = c*e[i+1] is carried as next y.
    c_next = jnp.concatenate([c[1:], jnp.ones((1,), c.dtype)])
    s_next = jnp.concatenate([s[1:], jnp.zeros((1,), s.dtype)])
    e_next = jnp.concatenate([e[1:], jnp.zeros((1,), e.dtype)])

    def step(carry, inp):
        x, y = carry
        c_i, s_i, z, cn, sn, en = inp
        cs = c_i * s_i
        c2 = c_i * c_i
        s2 = s_i * s_i
        xp = c2 * x - 2.0 * cs * y + s2 * z
        yp = cs * (x - z) + (c2 - s2) * y
        zp = s2 * x + 2.0 * cs * y + c2 * z
        o = -s_i * en
        ypp = cn * yp - sn * o
        wp = c_i * en
        return (zp, wp), (xp, ypp)

    (z_last, _), (new_d, new_e) = jax.lax.scan(
        step, (d[0], e[0]), (c, s, d[1:], c_next, s_next, e_next)
    )
    new_diag = jnp.concatenate([new_d, z_last[None]])
    new_subdiag = deflate_subdiag(new_diag, new_e)
    return new_diag, new_subdiag


def apply_yq(Y, c, s):
    """Right-multiply ``Y`` by ``Q = G_0 G_1 ... G_{m-2}`` in place order.

    Each rotation combines columns (i, i+1):
      new_col_i   = c*Y_i - s*Y_{i+1}
      new_col_i+1 = s*Y_i + c*Y_{i+1}
    (reference: UpperHessenbergQR.h:383-417, apply_YQ).
    """
    rows = Y.shape[0]

    def step(Ycur, inp):
        i, c_i, s_i = inp
        zero = jnp.zeros((), i.dtype)
        cols = jax.lax.dynamic_slice(Ycur, (zero, i), (rows, 2))
        g = jnp.stack(
            [jnp.stack([c_i, s_i]), jnp.stack([-s_i, c_i])]
        ).astype(Y.dtype)
        newcols = cols @ g
        return jax.lax.dynamic_update_slice(Ycur, newcols, (zero, i)), None

    idx = jnp.arange(c.shape[0], dtype=jnp.int32)
    Yout, _ = jax.lax.scan(step, Y, (idx, c, s))
    return Yout


def accumulate_q(c, s, m=None, dtype=None):
    """Materialize ``Q = G_0 ... G_{m-2}`` as a dense (m, m) matrix."""
    if m is None:
        m = c.shape[0] + 1
    if dtype is None:
        dtype = c.dtype
    return apply_yq(jnp.eye(m, dtype=dtype), c, s)


def tridiag_to_dense(diag, subdiag):
    m = diag.shape[0]
    T = jnp.zeros((m, m), diag.dtype)
    i = jnp.arange(m - 1)
    T = T.at[jnp.diag_indices(m)].set(diag)
    T = T.at[i + 1, i].set(subdiag)
    T = T.at[i, i + 1].set(subdiag)
    return T


def tridiag_eigen(diag, subdiag):
    """Full eigendecomposition of a symmetric tridiagonal matrix.

    Returns (eigenvalues ascending, eigenvectors as columns), via XLA's
    native eigh on the dense embedding — the TPU-idiomatic replacement
    for the reference's sequential implicit QL/QR sweeps
    (reference: LinAlg/TridiagEigen.h).
    """
    from spectra_tpu.linalg.jacobi import eigh_accurate

    return eigh_accurate(tridiag_to_dense(diag, subdiag))
