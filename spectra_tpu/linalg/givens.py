"""Numerically stable Givens rotations.

TPU-native counterpart of the reference's Givens kernels
(reference: include/Spectra/LinAlg/Givens.h:150-336). The convention is
identical: for a real pair (x, y), find (c, s, r) with

    G = [ c  s ]      G^T [x]   [r]
        [-s  c ],         [y] = [0],   r = sqrt(x^2 + y^2) >= 0,

i.e. c = x / r, s = -y / r. The reference guards against over/underflow
with manual scaling plus a Taylor branch; here ``jnp.hypot`` provides
the same guarantees and maps to a single fused VPU sequence.

The complex variant follows the same LAPACK (LAWN-148/150) convention
used by the reference (Givens.h:218-335): c is real, s may be complex,
and G^H [x, y]^T = [r, 0]^T with r generally complex.
"""

import jax.numpy as jnp


def givens_rotation(x, y):
    """Real Givens rotation zeroing ``y`` against ``x``.

    Returns ``(c, s, r)`` with ``c*x - s*y = r`` and ``s*x + c*y = 0``.
    For x = y = 0 returns the identity rotation (c=1, s=0, r=0).
    """
    r = jnp.hypot(x, y)
    safe = r > 0
    rs = jnp.where(safe, r, 1.0)
    c = jnp.where(safe, x / rs, jnp.ones_like(x))
    s = jnp.where(safe, -y / rs, jnp.zeros_like(y))
    return c, s, r


def givens_rotation_complex(x, y):
    """Complex Givens rotation: c real, s complex, G^H [x, y]^T = [r, 0]^T.

    Returns ``(c, s, r)`` with ``c*x + conj(s)*... `` following the
    convention ``r = c*x - conj(s)*y``? We use the LAPACK clartg
    convention: ``[c, s; -conj(s), c]^H`` applied to ``[x; y]`` gives
    ``[r; 0]`` where ``c = |x| / n``, ``s = -(x/|x|) * conj(y) / n``,
    ``n = sqrt(|x|^2 + |y|^2)`` and ``r = (x/|x|) * n``.
    For x == 0 the rotation swaps: c = 0, s = -conj(y)/|y|, r = |y|.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    n = jnp.hypot(ax, ay)
    safe = n > 0
    ns = jnp.where(safe, n, 1.0)
    x_zero = ax == 0
    # Phase of x; for x == 0 use phase 1.
    phase = jnp.where(x_zero, jnp.ones_like(x), x / jnp.where(x_zero, 1.0, ax))
    c = jnp.where(safe, jnp.where(x_zero, 0.0, ax / ns), 1.0)
    s = jnp.where(
        safe,
        jnp.where(
            x_zero,
            -jnp.conj(y) / jnp.where(ay == 0, 1.0, ay),
            -phase * jnp.conj(y) / ns,
        ),
        jnp.zeros_like(y),
    )
    r = jnp.where(safe, jnp.where(x_zero, ay.astype(x.dtype), phase * ns), 0.0)
    return c, s, r
