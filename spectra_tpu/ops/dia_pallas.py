"""Pallas TPU kernel for the DIA (stencil) SpMV.

The XLA lowering of :meth:`DiaMatrix.matvec` re-reads the x vector once
per diagonal from HBM (d shifted windows). This kernel halves the HBM
traffic by loading one *contiguous superset window* of x per output
chunk into VMEM — covering all diagonal shifts at once — and issuing
the d shifted multiply-adds from VMEM:

    HBM traffic / chunk:  d*C (data) + (C + span) (x) + C (y)
    vs XLA's:             d*C (data) + d*C (x) + C (y)

For the 5-point Laplacian (d=5) that is a ~1.6x traffic reduction; the
kernel is bandwidth-bound so throughput scales accordingly.

The kernel is dtype-generic but intended for f32 (TPU fp64 is emulated
and the fp64 path stays on XLA); offsets must be small relative to the
chunk (|off| <= chunk, true for any banded matrix worth DIA).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "interpret"))
def dia_spmv_pallas(data, offsets, x, *, chunk: int = 32768, interpret: bool = False):
    """y = A x for row-aligned DIA storage (see DiaMatrix).

    Args:
      data: (d, n) diagonal values, row-aligned.
      offsets: static tuple of ints, ascending.
      x: (n,) input vector.
      chunk: rows per grid step (multiple of 128).
    """
    d, n = data.shape
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    assert span <= chunk, "offsets exceed chunk; raise chunk"
    assert chunk % 1024 == 0, "chunk must be a multiple of 1024 (TPU tiling)"

    n_pad = _round_up(n, chunk)
    grid = (n_pad // chunk,)

    # Superset window per chunk, aligned to the 1-D VMEM tiling (the
    # DMA slice shape must be a multiple of 8*128).
    win = _round_up(chunk + span, 1024)

    # Padded x covering every shifted (aligned) window.
    xp = jnp.pad(x, (lo, (n_pad - n) + (win - chunk)))
    dp = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    def kernel(xp_hbm, data_ref, y_ref, xwin, sem):
        i = pl.program_id(0)
        # One DMA for the whole shifted-window superset of this chunk.
        cp = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(i * chunk, win)], xwin, sem
        )
        cp.start()
        cp.wait()
        acc = jnp.zeros((chunk,), data_ref.dtype)
        for k, off in enumerate(offsets):
            # window position: x[i*chunk + off + lo + j] = xwin[off + lo + j]
            acc = acc + data_ref[k, :] * xwin[pl.ds(lo + off, chunk)]
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp stays in HBM
            pl.BlockSpec((d, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, dp)
    return y[:n]
