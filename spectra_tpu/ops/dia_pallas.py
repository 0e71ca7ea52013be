"""Pallas TPU kernel for the DIA (stencil) SpMV.

The XLA lowering of :meth:`DiaMatrix.matvec` re-reads the x vector once
per diagonal from HBM (d shifted windows). This kernel halves the HBM
traffic by reading one *contiguous superset window* of x per output
chunk — covering all diagonal shifts at once — and issuing the d
shifted multiply-adds from VMEM:

    HBM traffic / chunk:  d*C (data) + (C + span) (x) + C (y)
    vs XLA's:             d*C (data) + d*C (x) + C (y)

For the 5-point Laplacian (d=5) that is a ~1.6x traffic reduction; the
kernel is bandwidth-bound so throughput scales accordingly.

The overlapping window is expressed with an element-indexed BlockSpec
(windows of consecutive grid steps overlap by ``span`` elements — a
read-only input, so overlap is safe); all shifted reads are then
static VMEM slices. Intended for f32 (TPU fp64 is emulated and stays
on XLA; the f64 compiled path is rejected by some Mosaic versions);
offsets must satisfy ``max|offset| <= chunk``.

Validated on a v5e: bitwise agreement with the XLA lowering at 1M rows
and 8.15 vs 8.34 Gnnz/s f32 through a remote tunnel (both ends
dispatch-limited there).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # element-indexed block dims (newer pallas)
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "interpret"))
def dia_spmv_pallas(data, offsets, x, *, chunk: int = 32768, interpret: bool = False):
    """y = A x for row-aligned DIA storage (see DiaMatrix).

    Args:
      data: (d, n) diagonal values, row-aligned.
      offsets: static tuple of ints, ascending.
      x: (n,) input vector.
      chunk: rows per grid step (multiple of 1024).
    """
    d, n = data.shape
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    assert span <= chunk, "offsets exceed chunk; raise chunk"
    assert chunk % 1024 == 0, "chunk must be a multiple of 1024 (TPU tiling)"
    if _Element is None:
        raise NotImplementedError("this jax version lacks element-indexed blocks")

    n_pad = _round_up(n, chunk)
    grid = (n_pad // chunk,)
    # Window aligned to the 1-D VMEM tiling.
    win = _round_up(chunk + span, 1024)

    xp = jnp.pad(x, (lo, (n_pad - n) + (win - chunk)))
    dp = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    def kernel(xwin_ref, data_ref, y_ref):
        acc = data_ref[0, :] * xwin_ref[lo + offsets[0] : lo + offsets[0] + chunk]
        for k, off in enumerate(offsets[1:], start=1):
            acc = acc + data_ref[k, :] * xwin_ref[lo + off : lo + off + chunk]
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_Element(win),),
                # EVERY index-map output must be explicitly i32: under
                # jax_enable_x64 a bare `i` or literal 0 lowers as i64,
                # which Mosaic fails to legalize ("func.return i64").
                lambda i: (jnp.int32(i) * jnp.int32(chunk),),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, chunk),
                lambda i: (jnp.int32(0), jnp.int32(i)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk,), lambda i: (jnp.int32(i),), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad,), data.dtype),
        interpret=interpret,
    )(xp, dp)
    return y[:n]
