"""Real Schur decomposition of an upper Hessenberg matrix.

TPU-native counterpart of the reference's UpperHessenbergSchur
(reference: include/Spectra/LinAlg/UpperHessenbergSchur.h:30-456, an
Eigen-RealSchur adaptation): iterate Francis double-shift sweeps with
Wilkinson shifts from the trailing unconverged 2x2 block until the
matrix is quasi-triangular (1x1 blocks for real eigenvalues, 2x2 blocks
with complex discriminant for conjugate pairs), accumulating the
orthogonal similarity U with ``A = U T U^T``.

One ``lax.while_loop`` drives the iteration; each sweep is the
deflation-aware :func:`~spectra_tpu.linalg.hessenberg.double_shift_qr`
(which re-seeds the bulge at every deflated boundary, so applying it to
the full matrix advances every active block at once). Exceptional
shifts kick in every 10 stalled iterations (the reference alternates
Wilkinson ad-hoc at 10 and MATLAB ad-hoc at 30,
UpperHessenbergSchur.h:113-137); the iteration cap is 30 n as in the
reference's underlying Eigen code.

Used for inventory/testing parity and as a fallback eigenvalue path;
the IRAM Ritz extraction uses the host LAPACK bridge
(:mod:`spectra_tpu.linalg.hessenberg_eigen`) which also returns
eigenvectors.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectra_tpu.linalg.hessenberg import clip_to_hessenberg, double_shift_qr
from spectra_tpu.util import dtypes


class SchurResult(NamedTuple):
    T: jax.Array  # (m, m) real quasi-triangular
    U: jax.Array  # (m, m) orthogonal, A = U T U^T
    converged: jax.Array  # bool
    n_iter: jax.Array  # int32


def _deflate(T):
    """Zero negligible subdiagonals (Eigen/LAPACK criterion)."""
    m = T.shape[0]
    eps = jnp.finfo(T.dtype).eps
    d = jnp.diagonal(T)
    sub = jnp.diagonal(T, offset=-1)
    small = jnp.abs(sub) <= eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:]))
    i = jnp.arange(m - 1)
    return T.at[i + 1, i].set(jnp.where(small, 0.0, sub))


def _unconverged_mask(T):
    """Per-subdiagonal flag: True where more iteration is needed.

    A nonzero subdiagonal e_i is converged iff it is an isolated 2x2
    block (neighbors zero) whose eigenvalues are complex
    (discriminant < 0)."""
    m = T.shape[0]
    sub = jnp.diagonal(T, offset=-1)
    nz = sub != 0
    nz_prev = jnp.concatenate([jnp.zeros((1,), bool), nz[:-1]])
    nz_next = jnp.concatenate([nz[1:], jnp.zeros((1,), bool)])
    a = jnp.diagonal(T)[:-1]
    dd = jnp.diagonal(T)[1:]
    b = jnp.diagonal(T, offset=1)
    disc = (a - dd) ** 2 + 4.0 * b * sub
    ok_pair = (~nz_prev) & (~nz_next) & (disc < 0)
    return nz & ~ok_pair


def _split_real_blocks(T, U):
    """Split isolated 2x2 blocks with real eigenvalues by a direct
    rotation (the role of LAPACK's dlanv2 standardization): Francis
    cannot move them — by Cayley-Hamilton the block's own shifted first
    column is exactly zero, so the sweep degenerates to identity."""
    m = T.shape[0]

    def body(j, TU):
        T, U = TU
        sub = T[j + 1, j]
        prev_zero = jnp.where(j > 0, T[j, jnp.maximum(j - 1, 0)] == 0, True)
        next_zero = jnp.where(
            j + 2 < m, T[jnp.minimum(j + 2, m - 1), j + 1] == 0, True
        )
        a, b = T[j, j], T[j, j + 1]
        c_, d = sub, T[j + 1, j + 1]
        disc = (a - d) ** 2 + 4.0 * b * c_
        do = (sub != 0) & prev_zero & next_zero & (disc >= 0)

        def split(TU):
            T, U = TU
            # dlanv2-style stable rotation (LAPACK real-Schur 2x2
            # standardization): annihilates the subdiagonal to machine
            # precision even for (near-)defective blocks, where an
            # eigenvector-based rotation loses sqrt(eps) accuracy.
            p = 0.5 * (a - d)
            bcmax = jnp.maximum(jnp.abs(b), jnp.abs(c_))
            bcmis = (
                jnp.minimum(jnp.abs(b), jnp.abs(c_))
                * jnp.sign(b)
                * jnp.sign(c_)
            )
            scale = jnp.maximum(jnp.abs(p), bcmax)
            rad = jnp.maximum(p * p / scale + bcmax * bcmis / scale, 0.0)
            root = jnp.sqrt(scale) * jnp.sqrt(rad)
            z = p + jnp.where(p >= 0, root, -root)
            tau = jnp.hypot(c_, z)
            safe = tau > 0
            cr = jnp.where(safe, z / jnp.where(safe, tau, 1.0), 1.0)
            sr = jnp.where(safe, c_ / jnp.where(safe, tau, 1.0), 0.0)
            # rows j, j+1: G^T on the left
            rj = cr * T[j, :] + sr * T[j + 1, :]
            rj1 = -sr * T[j, :] + cr * T[j + 1, :]
            T = T.at[j, :].set(rj).at[j + 1, :].set(rj1)
            # columns j, j+1: G on the right (T and U)
            cj = cr * T[:, j] + sr * T[:, j + 1]
            cj1 = -sr * T[:, j] + cr * T[:, j + 1]
            T = T.at[:, j].set(cj).at[:, j + 1].set(cj1)
            uj = cr * U[:, j] + sr * U[:, j + 1]
            uj1 = -sr * U[:, j] + cr * U[:, j + 1]
            U = U.at[:, j].set(uj).at[:, j + 1].set(uj1)
            T = T.at[j + 1, j].set(0.0)
            return T, U

        return jax.lax.cond(do, split, lambda TU: TU, (T, U))

    return jax.lax.fori_loop(0, m - 1, body, (T, U))


class _Carry(NamedTuple):
    T: jax.Array
    U: jax.Array
    it: jax.Array
    stall: jax.Array


def hessenberg_schur(H, max_iter=None) -> SchurResult:
    """Real Schur form of upper Hessenberg H. Returns (T, U, converged,
    n_iter) with ``H = U T U^T``."""
    H = jnp.asarray(H)
    m = H.shape[0]
    if max_iter is None:
        max_iter = 30 * m
    eps = jnp.finfo(H.dtype).eps

    T0 = _deflate(clip_to_hessenberg(H))
    U0 = jnp.eye(m, dtype=H.dtype)

    def cond(c: _Carry):
        return jnp.any(_unconverged_mask(c.T)) & (c.it < max_iter)

    def body(c: _Carry):
        T, U = c.T, c.U
        mask = _unconverged_mask(T)
        # Trailing unconverged subdiagonal -> its 2x2 gives the shifts.
        idx = jnp.arange(m - 1)
        j = jnp.max(jnp.where(mask, idx, -1))
        j = jnp.maximum(j, 0)
        a = T[j, j]
        b = T[j, j + 1]
        cc = T[j + 1, j]
        d = T[j + 1, j + 1]
        s = a + d
        t = a * d - b * cc
        # Exceptional (ad-hoc) shifts on stall, as in the reference
        # (UpperHessenbergSchur.h:113-137).
        exc = c.stall >= 10
        s_exc = jnp.abs(cc) + jnp.abs(T[j, jnp.maximum(j - 1, 0)])
        s = jnp.where(exc, 2.0 * s_exc, s)
        t = jnp.where(exc, s_exc * s_exc, t)

        T2, Q = double_shift_qr(T, s, t)
        T2 = _deflate(T2)
        U2 = U @ Q
        T2, U2 = _split_real_blocks(T2, U2)
        # Stall counter: reset when the trailing unconverged index moves.
        mask2 = _unconverged_mask(T2)
        j2 = jnp.max(jnp.where(mask2, idx, -1))
        stall = jnp.where(j2 == j, c.stall + 1, jnp.asarray(0, jnp.int32))
        return _Carry(T2, U2, c.it + 1, stall)

    out = jax.lax.while_loop(
        cond, body, _Carry(T0, U0, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )
    return SchurResult(
        T=out.T,
        U=out.U,
        converged=~jnp.any(_unconverged_mask(out.T)),
        n_iter=out.it,
    )


def complexify_schur(T, U):
    """Convert a real Schur pair (T quasi-triangular, U orthogonal)
    into a complex Schur pair (T_c upper triangular, U_c unitary) by
    rotating each isolated 2x2 block with the unitary whose first
    column is the block's unit eigenvector — the per-block equivalent
    of Eigen's ComplexSchur used by the reference
    (UpperHessenbergEigen.h:329-454)."""
    m = T.shape[0]
    cdtype = dtypes.complex_dtype(T.dtype)
    Tc = T.astype(cdtype)
    Uc = U.astype(cdtype)

    def body(j, TU):
        Tc, Uc = TU
        sub = Tc[j + 1, j]

        def rotate(TU):
            Tc, Uc = TU
            a, b = Tc[j, j], Tc[j, j + 1]
            c_, d = Tc[j + 1, j], Tc[j + 1, j + 1]
            mean = 0.5 * (a + d)
            disc = (a - d) * (a - d) + 4.0 * b * c_
            lam = mean + 0.5 * jnp.sqrt(disc)  # complex sqrt: disc < 0
            # unit eigenvector; c != 0 so (lam - d, c) is nonzero
            v0, v1 = lam - d, c_
            nrm = jnp.sqrt(jnp.abs(v0) ** 2 + jnp.abs(v1) ** 2)
            v0, v1 = v0 / nrm, v1 / nrm
            # unitary Q2 = [[v0, -conj(v1)], [v1, conj(v0)]]
            r0 = jnp.conj(v0) * Tc[j, :] + jnp.conj(v1) * Tc[j + 1, :]
            r1 = -v1 * Tc[j, :] + v0 * Tc[j + 1, :]
            Tc = Tc.at[j, :].set(r0).at[j + 1, :].set(r1)
            c0 = Tc[:, j] * v0 + Tc[:, j + 1] * v1
            c1 = -Tc[:, j] * jnp.conj(v1) + Tc[:, j + 1] * jnp.conj(v0)
            Tc = Tc.at[:, j].set(c0).at[:, j + 1].set(c1)
            u0 = Uc[:, j] * v0 + Uc[:, j + 1] * v1
            u1 = -Uc[:, j] * jnp.conj(v1) + Uc[:, j + 1] * jnp.conj(v0)
            Uc = Uc.at[:, j].set(u0).at[:, j + 1].set(u1)
            Tc = Tc.at[j + 1, j].set(0.0)
            # The pair's eigenvalues are exactly conjugate (real trace);
            # enforce it so downstream conjugate-pair tests are exact.
            Tc = Tc.at[j, j].set(lam).at[j + 1, j + 1].set(jnp.conj(lam))
            return Tc, Uc

        return jax.lax.cond(sub != 0, rotate, lambda TU: TU, TU)

    Tc, Uc = jax.lax.fori_loop(0, m - 1, body, (Tc, Uc))
    # Enforce triangularity (rounding fill below the diagonal).
    r = jnp.arange(m)
    Tc = jnp.where(r[:, None] <= r[None, :], Tc, 0.0)
    return Tc, Uc


def triangular_eigenvectors(Tc):
    """Unit-norm eigenvectors of a complex upper triangular matrix by
    back-substitution (the reference's unit-triangular back-solve,
    UpperHessenbergEigen.h:53-208 real / :329-454 complex): column k
    solves (Tc - lambda_k I) y = 0 with y[k] = 1, columns vmapped."""
    m = Tc.shape[0]
    lam = jnp.diagonal(Tc)
    eps = jnp.finfo(dtypes.real_dtype(Tc.dtype)).eps
    tnorm = jnp.maximum(jnp.max(jnp.abs(Tc)), 1.0)

    def one_vector(k):
        y0 = jnp.zeros((m,), Tc.dtype).at[k].set(1.0)

        def body(t, y):
            i = k - 1 - t  # rows k-1 .. 0
            s = Tc[i, :] @ y  # rows > k contribute 0; y[j>i] known
            denom = Tc[i, i] - lam[k]
            small = jnp.abs(denom) < eps * tnorm
            denom = jnp.where(small, eps * tnorm, denom)
            val = jnp.where(i >= 0, -s / denom, 0.0)
            return jnp.where(
                (jnp.arange(m) == i) & (i >= 0) & (jnp.arange(m) < k), val, y
            )

        y = jax.lax.fori_loop(0, m - 1, body, y0)
        return y / jnp.linalg.norm(y)

    return jax.vmap(one_vector, out_axes=1)(jnp.arange(m))


class _CCarry(NamedTuple):
    T: jax.Array
    U: jax.Array
    it: jax.Array
    stall: jax.Array
    jprev: jax.Array


def hessenberg_schur_complex(H, max_iter=None) -> SchurResult:
    """Complex Schur form of a complex upper Hessenberg matrix via
    single-shift (Wilkinson) QR sweeps — the role Eigen's ComplexSchur
    plays for the reference's complex solvers
    (UpperHessenbergEigen.h:329-454). ``H = U T U^H``, T upper
    triangular."""
    H = jnp.asarray(H)
    m = H.shape[0]
    if max_iter is None:
        max_iter = 30 * m
    eps = jnp.finfo(dtypes.real_dtype(H.dtype)).eps

    from spectra_tpu.linalg.hessenberg import hessenberg_qr

    def deflate(T):
        d = jnp.diagonal(T)
        sub = jnp.diagonal(T, offset=-1)
        small = jnp.abs(sub) <= eps * (jnp.abs(d[:-1]) + jnp.abs(d[1:]))
        i = jnp.arange(m - 1)
        return T.at[i + 1, i].set(jnp.where(small, 0.0, sub))

    T0 = deflate(clip_to_hessenberg(H))
    U0 = jnp.eye(m, dtype=H.dtype)
    idx = jnp.arange(m - 1)

    def cond(c: _CCarry):
        return jnp.any(jnp.diagonal(c.T, offset=-1) != 0) & (c.it < max_iter)

    def body(c: _CCarry):
        T, U = c.T, c.U
        sub = jnp.diagonal(T, offset=-1)
        j = jnp.max(jnp.where(sub != 0, idx, -1))
        j = jnp.maximum(j, 0)
        a, b = T[j, j], T[j, j + 1]
        cc, d = T[j + 1, j], T[j + 1, j + 1]
        # Wilkinson shift: the 2x2 eigenvalue closer to d.
        mean = 0.5 * (a + d)
        disc = (a - d) * (a - d) + 4.0 * b * cc
        root = 0.5 * jnp.sqrt(disc)
        lam1, lam2 = mean + root, mean - root
        shift = jnp.where(jnp.abs(lam1 - d) <= jnp.abs(lam2 - d), lam1, lam2)
        exc = c.stall >= 10
        shift = jnp.where(
            exc, (jnp.abs(cc) + jnp.abs(b)).astype(T.dtype) + d, shift
        )
        T2, Q = hessenberg_qr(T, shift)
        T2 = deflate(T2)
        U2 = U @ Q
        sub2 = jnp.diagonal(T2, offset=-1)
        j2 = jnp.max(jnp.where(sub2 != 0, idx, -1)).astype(jnp.int32)
        stall = jnp.where(j2 == c.jprev, c.stall + 1, jnp.asarray(0, jnp.int32))
        return _CCarry(T2, U2, c.it + 1, stall, j2)

    out = jax.lax.while_loop(
        cond,
        body,
        _CCarry(
            T0,
            U0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(-2, jnp.int32),
        ),
    )
    r = jnp.arange(m)
    T_final = jnp.where(r[:, None] <= r[None, :], out.T, 0.0)
    return SchurResult(
        T=T_final,
        U=out.U,
        converged=~jnp.any(jnp.diagonal(out.T, offset=-1) != 0),
        n_iter=out.it,
    )


def hessenberg_eigen_native(H):
    """Eigenvalues and unit eigenvectors of a Hessenberg matrix through
    the fully on-device Schur pipeline (no host callbacks): real H ->
    real Schur -> per-block complexification; complex H -> complex
    Schur; then triangular back-substitution for eigenvectors.

    Returns ``(evals (m,), evecs (m, m))`` complex, conjugate pairs
    exact and adjacent for real H."""
    H = jnp.asarray(H)
    if dtypes.is_complex(H.dtype):
        res = hessenberg_schur_complex(H)
        Tc, Uc = res.T, res.U
    else:
        res = hessenberg_schur(H)
        Tc, Uc = complexify_schur(res.T, res.U)
    Y = triangular_eigenvectors(Tc)
    evecs = Uc @ Y
    evals = jnp.diagonal(Tc)
    return evals, evecs


def schur_eigenvalues(T):
    """Complex eigenvalues from a real quasi-triangular T: 1x1 diagonal
    blocks give real eigenvalues, 2x2 blocks conjugate pairs
    (reference: UpperHessenbergEigen.h:241-268)."""
    m = T.shape[0]
    d = jnp.diagonal(T)
    sub = jnp.concatenate([jnp.diagonal(T, offset=-1), jnp.zeros((1,), T.dtype)])
    sup = jnp.concatenate([jnp.diagonal(T, offset=1), jnp.zeros((1,), T.dtype)])
    is_start = sub != 0  # i starts a 2x2 block
    is_second = jnp.concatenate([jnp.zeros((1,), bool), is_start[:-1]])
    d_next = jnp.concatenate([d[1:], jnp.zeros((1,), T.dtype)])
    d_prev = jnp.concatenate([jnp.zeros((1,), T.dtype), d[:-1]])
    sub_prev = jnp.concatenate([jnp.zeros((1,), T.dtype), sub[:-1]])
    sup_prev = jnp.concatenate([jnp.zeros((1,), T.dtype), sup[:-1]])

    cdtype = dtypes.complex_dtype(T.dtype)
    # block at (i, i+1): lambda = (a+d)/2 +- sqrt(disc)/2
    mean = 0.5 * (d + d_next)
    disc = (d - d_next) ** 2 + 4.0 * sup * sub
    root = jnp.sqrt(jnp.abs(disc).astype(cdtype) * jnp.where(disc < 0, -1.0, 1.0) + 0j)
    lam_start = mean.astype(cdtype) + 0.5 * root
    mean_p = 0.5 * (d_prev + d)
    disc_p = (d_prev - d) ** 2 + 4.0 * sup_prev * sub_prev
    root_p = jnp.sqrt(
        jnp.abs(disc_p).astype(cdtype) * jnp.where(disc_p < 0, -1.0, 1.0) + 0j
    )
    lam_second = mean_p.astype(cdtype) - 0.5 * root_p

    lam = jnp.where(
        is_start, lam_start, jnp.where(is_second, lam_second, d.astype(cdtype))
    )
    return lam
