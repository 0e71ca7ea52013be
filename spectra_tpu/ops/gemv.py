"""Basis GEMVs tuned for the TPU's emulated-f64 pipeline.

The IRLM hot loop is dominated (after the operator application) by two
tall-skinny products against the Krylov basis ``V`` (n x m, m = ncv):
the projection ``V^H y`` and the reconstruction ``V h``. XLA lowers
``@`` to ``dot_general``, which on TPU routes through the MXU — and
f64 on the MXU is software-emulated: measured on the v5e at
n = 1e6, m = 30, the dot lowering costs 52 ms (projection) / 190 ms
(reconstruction) per call and minutes of compile time, while the SAME
contraction expressed as a broadcast-multiply + ``sum`` compiles to a
VPU sweep that runs the pair in ~1 ms in-loop — at the HBM streaming
roofline (~450 GB/s of the 656 GB/s measured ceiling).

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


def basis_proj(X, y):
    """``X^H y`` for a tall-skinny basis block X (n, m) and y (n,)."""
    if _lane_friendly(X, y):
        return jnp.sum(jnp.conj(X) * y[:, None], axis=0)
    return jnp.conj(X).T @ y


def basis_apply(X, h):
    """``X h`` for a tall-skinny basis block X (n, m) and h (m,)."""
    if _lane_friendly(X, h):
        return jnp.sum(X * h[None, :], axis=1)
    return X @ h


def basis_apply_block(X, H):
    """``X H`` for X (n, m) and a small H (m, k) — restart compression
    and eigenvector assembly. The emulated-f64 dot costs ~190 ms per
    output column at n = 1e6; the per-column sweep costs one read of X
    per column (k x 240 MB = ~11 ms at the roofline for k = 30)."""
    if _lane_friendly(X, H) and X.shape[0] > (1 << 16):
        cols = [
            jnp.sum(X * H[None, :, j], axis=1) for j in range(H.shape[1])
        ]
        return jnp.stack(cols, axis=1)
    return X @ H
