"""Basis GEMVs tuned for the TPU's memory layout and emulated-f64 path.

The Krylov basis is stored **row-major**: ``V`` has shape (m, n) with
basis vector i in row ``V[i]`` (m = ncv, n the problem size). This is
the TPU-native layout for a tall-skinny basis:

  * zero tile padding: the minor (lane) dimension is n, padded to a
    multiple of 128 (negligible at n >> 1); the sublane dimension is m,
    a small multiple of 8. The transposed (n, m) layout pads m -> 128
    lanes — measured 3.2x HBM expansion at ncv = 40, which alone pushed
    the 100M-nnz north-star basis (2.14 GB unpadded) past the v5e HBM
    once XLA's remat held two padded copies;
  * row updates ``V.at[i].set(v)`` and reads ``V[i]`` are contiguous
    dynamic slices on the major dimension — no strided column access;
  * every projection reads only the true 2.14 GB, not the padded 6.8.

The IRLM hot loop is dominated (after the operator application) by two
products against V: the projection ``V y`` (conj) and the
reconstruction ``h V``. XLA lowers ``@`` to ``dot_general``, which on
TPU routes through the MXU — and f64 on the MXU is software-emulated:
measured on the v5e at n = 1e6, m = 30, the dot lowering costs 52 ms
(projection) / 190 ms (reconstruction) per call and minutes of compile
time, while the SAME contraction expressed as a broadcast-multiply +
``sum`` compiles to a VPU sweep that runs the pair in ~1 ms in-loop —
at the HBM streaming roofline.

On CPU (and for f32 on TPU, where the MXU is native) the dot lowering
is the right one — BLAS-grade on CPU, systolic on TPU — so the routing
is decided at trace time from the default backend and dtype width.

Numerics: both lowerings are floating-point reductions of the same
terms in different association orders; results agree to O(eps) and all
downstream tolerances (DGKS re-orthogonalization, ARPACK convergence
tests) are insensitive to the choice.
"""

import jax
import jax.numpy as jnp


def _lane_friendly(*arrays) -> bool:
    """True when the broadcast+sum lowering should be used: TPU backend
    and a wide (emulated) element type."""
    if jax.default_backend() != "tpu":
        return False
    return any(jnp.dtype(a.dtype).itemsize >= 8 for a in arrays)


def vec_dot(x, y):
    """``<x, y> = conj(x) y`` for n-vectors. ``jnp.vdot`` lowers to an
    MXU dot, and when it fuses into a larger program the f64 emulation
    drops to ~f32 accuracy (measured: beta = ||f|| inside the jitted
    Lanczos step off by 3e-7 relative while the same reduction compiled
    standalone is exact to 3e-15 — every H entry and normalization
    inherited that noise). The elementwise-multiply + lane-reduce sweep
    is exact f64 on the VPU."""
    if _lane_friendly(x, y):
        return jnp.sum(jnp.conj(x) * y)
    return jnp.vdot(x, y)


def basis_proj(X, y):
    """``conj(X) y`` for a row-major basis block X (m, n) and y (n,):
    the projection coefficients ``<x_i, y>`` as an (m,) vector."""
    if _lane_friendly(X, y):
        return jnp.sum(jnp.conj(X) * y[None, :], axis=1)
    return jnp.conj(X) @ y


def basis_apply(X, h):
    """``sum_i h_i x_i`` for a row-major basis block X (m, n) and
    coefficients h (m,): the reconstruction as an (n,) vector."""
    if _lane_friendly(X, h):
        return jnp.sum(X * h[:, None], axis=0)
    return h @ X


def basis_apply_block(X, H):
    """Basis rotation ``H^T X`` for X (m, n) row-major and a small
    H (m, k): returns the rotated (k, n) row-major basis whose row j is
    ``sum_i H[i, j] x_i`` — restart compression and eigenvector
    assembly. The emulated-f64 dot costs ~190 ms per output row at
    n = 1e6 (and materializes an f32[8, m, n] slice tensor); the
    per-row sweep costs one read of X per row. Rows are written into
    the output with an in-place ``fori_loop`` — a stacked
    list-comprehension materializes every row separately AND the stack
    copy (one extra (m, n) buffer, AOT-measured 4.6 GB at the 100M-nnz
    north-star's restart compression)."""
    if _lane_friendly(X, H) and X.shape[1] > (1 << 16):
        k = H.shape[1]
        out = jnp.zeros((k, X.shape[1]), X.dtype)
        Ht = H.T.astype(X.dtype)  # (k, m) small

        def body(j, out):
            h_j = jax.lax.dynamic_slice_in_dim(Ht, j, 1, axis=0)  # (1, m)
            row = jnp.sum(X * h_j.reshape(-1)[:, None], axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                out, row[None, :], j, axis=0
            )

        return jax.lax.fori_loop(0, k, body, out)
    return H.T @ X
