"""Fused double-single (hi/lo f32) DIA SpMV — the HBM-resident f64 path.

TPU v5 chips have no native f64: XLA emulates it, and its DIA lowering
emits one HBM sweep per diagonal plus input-sized conversion temps.
At HBM-resident sizes (the 100M-nnz north star, n = 14.35M) that
sustains ~6 Gnnz/s of a 590 GB/s streaming roofline (measured round 4,
docs/ROADMAP.md Open #0).

This kernel is the designed fix: the matrix diagonals are stored as
native f32 hi/lo planes (hi = f32(a), lo = f32(a - hi) — an exact
two-term decomposition), the x vector is split the same way at the
call boundary, and ONE Pallas pass per output tile reads a single
contiguous x window covering every diagonal shift, accumulating in
double-single arithmetic (Dekker two-prod + Knuth two-sum, ~2^-48
relative — comparable to f64's round-off for tol>=1e-13 workloads):

    traffic/row:  d*8 (planes) + ~2.8*8 (x window) + 8 (y)
    vs XLA f64:   d*(8 data + 8 x) per-diagonal passes + temps

Measured on the v5e at g=243 (n=14.35M, 100.1M nnz): 21.3 Gnnz/s
planes-resident, 19.6 Gnnz/s with the f64 split/combine at every call,
vs 5.97 Gnnz/s for the XLA f64 path — 3.3x — at 1.7e-14 relative
accuracy vs numpy f64 (scripts/tpu_dia_ds_probe.py).

Reference hot op this accelerates: Spectra's selfadjoint SpMV
(reference: include/Spectra/MatOp/SparseSymMatProd.h:83-89).
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

import numpy as np

_SPLIT = np.float32(4097.0)  # 2**12 + 1: f32 Dekker split constant

#: default rows per grid step; the (2 x-window + 2 data + 2 y) VMEM
#: working set must stay under the 16 MB scoped-vmem limit.
DEFAULT_CHUNK = 65536


def _round_up(x, m):
    return (x + m - 1) // m * m


def split_f64(x):
    """f64 -> (hi, lo) f32 pair with hi = f32(x), lo = f32(x - hi);
    |x - (hi + lo)| <= 2^-48 |x| (the double-single representation
    error — a backward perturbation far under solver tolerances)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def combine_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _dekker_split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "chunk", "interpret")
)
def dia_spmv_ds_padded(
    dhp, dlp, xh, xl, *, offsets, n, chunk=DEFAULT_CHUNK, interpret=False
):
    """(yh, yl) = A @ (xh + xl) with pre-padded data planes.

    Args:
      dhp, dlp: (d, n_pad) f32 hi/lo diagonal planes, row-aligned,
        zero-padded to ``n_pad = round_up(n, chunk)`` (pad once at
        construction — the pad would otherwise cost a full extra
        HBM sweep per call).
      xh, xl: (n,) f32 planes of x.
      offsets: static ascending diagonal offsets.

    Returns renormalized (yh, yl), length n.
    """
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    n_pad = dhp.shape[1]
    assert n_pad == _round_up(n, chunk)
    win = _round_up(chunk + span, 1024)
    pad_x = (lo, (n_pad - n) + (win - chunk))
    xhp = jnp.pad(xh, pad_x)
    xlp = jnp.pad(xl, pad_x)
    yh, yl = _ds_pallas(
        dhp, dlp, xhp, xlp, offsets=offsets, chunk=chunk, interpret=interpret
    )
    return yh[:n], yl[:n]


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "chunk", "interpret")
)
def dia_spmv_ds_ext(
    dhp, dlp, xh_ext, xl_ext, *, offsets, n, chunk=DEFAULT_CHUNK,
    interpret=False,
):
    """Variant of :func:`dia_spmv_ds_padded` for halo-extended x:
    ``xh_ext``/``xl_ext`` have length ``lo + n + hi``, the leading
    ``lo`` and trailing ``hi`` entries being the neighbor halos (the
    row-sharded stencil path exchanges them via ppermute before the
    kernel — see ``parallel/stencil_spmv.py``). The halo slots replace
    the zero-pad of the single-chip entry point; everything else is
    the same fused one-pass kernel."""
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    n_pad = dhp.shape[1]
    assert n_pad == _round_up(n, chunk)
    win = _round_up(chunk + span, 1024)
    # win - chunk >= span >= hi, so the trailing pad is never negative.
    trail = (n_pad - n) + (win - chunk) - hi
    xhp = jnp.pad(xh_ext, (0, trail))
    xlp = jnp.pad(xl_ext, (0, trail))
    yh, yl = _ds_pallas(
        dhp, dlp, xhp, xlp, offsets=offsets, chunk=chunk, interpret=interpret
    )
    return yh[:n], yl[:n]


def _ds_pallas(dhp, dlp, xhp, xlp, *, offsets, chunk, interpret):
    """The fused kernel on fully-padded operands: data planes
    (d, n_pad), x planes of length ``lo + n_pad + (win - chunk)``.
    Returns padded (yh, yl) of length n_pad."""
    d, n_pad = dhp.shape
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    grid = (n_pad // chunk,)
    win = _round_up(chunk + span, 1024)

    def kernel(xh_ref, xl_ref, dh_ref, dl_ref, yh_ref, yl_ref):
        xw = xh_ref[:]
        xwl = xl_ref[:]
        # Dekker-split the window once; every diagonal slices it.
        xhh, xhl = _dekker_split(xw)
        s = jnp.zeros((chunk,), jnp.float32)
        c = jnp.zeros((chunk,), jnp.float32)
        for k, off in enumerate(offsets):
            a = dh_ref[k, :]
            al = dl_ref[k, :]
            sl = lambda v: jax.lax.slice(  # noqa: E731
                v, (lo + off,), (lo + off + chunk,)
            )
            b, bl, bhh, bhl = sl(xw), sl(xwl), sl(xhh), sl(xhl)
            p = a * b
            ahh, ahl = _dekker_split(a)
            err = ((ahh * bhh - p) + ahh * bhl + ahl * bhh) + ahl * bhl
            err = err + a * bl + al * b
            s, e2 = _two_sum(s, p)
            c = c + (err + e2)
        yh, yl = _two_sum(s, c)
        yh_ref[:] = yh
        yl_ref[:] = yl

    if _Element is None:  # pragma: no cover - old pallas
        raise NotImplementedError(
            "this jax version lacks element-indexed blocks"
        )

    def win_spec():
        return pl.BlockSpec(
            (_Element(win),),
            # index-map outputs must be explicit i32: under x64 a bare
            # int lowers as i64, which Mosaic fails to legalize.
            lambda i: (jnp.int32(i) * jnp.int32(chunk),),
            memory_space=pltpu.VMEM,
        )

    def dat_spec():
        return pl.BlockSpec(
            (d, chunk),
            lambda i: (jnp.int32(0), jnp.int32(i)),
            memory_space=pltpu.VMEM,
        )

    def out_spec():
        return pl.BlockSpec(
            (chunk,), lambda i: (jnp.int32(i),), memory_space=pltpu.VMEM
        )

    yh, yl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[win_spec(), win_spec(), dat_spec(), dat_spec()],
        out_specs=(out_spec(), out_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        ),
        interpret=interpret,
    )(xhp, xlp, dhp, dlp)
    return yh, yl


#: scoped-VMEM budget for the kernel working set (the TPU compiler's
#: scoped limit is 16 MB; leave headroom for pipeline bookkeeping).
_VMEM_BUDGET = 14 * 1024 * 1024


def _vmem_estimate(d, chunk, span):
    """Scoped-VMEM bytes of one kernel invocation: double-buffered
    (x-window hi/lo + data hi/lo + y hi/lo) blocks plus the in-kernel
    Dekker-split window temps."""
    win = _round_up(chunk + span, 1024)
    x = 2 * (2 * win * 4)
    data = 2 * (2 * d * chunk * 4)
    y = 2 * (2 * chunk * 4)
    temps = 2 * win * 4
    return x + data + y + temps


def pick_hilo_chunk(offsets, d) -> int | None:
    """Largest chunk whose working set fits the scoped-VMEM budget
    with acceptable x-window re-read amplification; None when the
    kernel does not apply (huge spans / too many diagonals — e.g. the
    27-diagonal Galerkin level-1 operator needs chunk 16384, and a
    100+-diagonal operator falls back to the XLA path)."""
    if _Element is None:
        return None
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    for chunk in (65536, 49152, 32768, 16384, 8192):
        if span > 4 * chunk:  # x re-read amplification cap (~5x)
            continue
        if _vmem_estimate(d, chunk, span) <= _VMEM_BUDGET:
            return chunk
    return None


def hilo_suitable(offsets, n, chunk=None) -> bool:
    """Kernel applicability (see :func:`pick_hilo_chunk`)."""
    return pick_hilo_chunk(offsets, len(offsets)) is not None
