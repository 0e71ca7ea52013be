"""Attribute the Pallas DIA kernel's gap to roofline (VERDICT item 1).

Variants benchmarked in-loop (K chained SpMVs in one jit) on the TPU:

  xla      - current XLA DiaMatrix.matvec lowering
  cur      - current dia_spmv_pallas (element-indexed window, unaligned
             1-D shifted slices)
  noshift  - same kernel but all slices aligned at lo (WRONG results;
             isolates the cost of unaligned lane-crossing slices)
  roll2d   - 2-D (rows, 128) layout; each diagonal shift decomposed as
             sublane roll + lane roll + boundary select (VPU-friendly)

Usage: python scripts/tpu_dia_variants.py [chunk ...]
"""

import functools
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import spectra_tpu  # noqa: F401,E402  (x64 setup)
from spectra_tpu.ops.dia_pallas import dia_spmv_pallas, _Element  # noqa: E402
from spectra_tpu.sparse.formats import dia_from_scipy  # noqa: E402


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


def _inloop(matvec, x, k_lo=10, k_hi=210, reps=3):
    """Difference-method in-loop time per SpMV (bench.py methodology:
    scalar fetch = true sync; k_hi-k_lo division cancels the fixed
    launch+fetch round trip)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(0, k, lambda i, v: matvec(v) * 0.125, x)

    for k in (k_lo, k_hi):
        _ = np.asarray(loop(x, k=k).ravel()[0])  # compile+warm+sync

    def timed(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(loop(x, k=k).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("offsets", "chunk", "aligned"))
def dia_noshift(data, offsets, x, *, chunk=32768, aligned=True):
    """Current kernel shape but slices all start at lo (wrong results)."""
    d, n = data.shape
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    n_pad = _round_up(n, chunk)
    grid = (n_pad // chunk,)
    win = _round_up(chunk + span, 1024)
    xp = jnp.pad(x, (lo, (n_pad - n) + (win - chunk)))
    dp = jnp.pad(data, ((0, 0), (0, n_pad - n)))

    def kernel(xwin_ref, data_ref, y_ref):
        acc = data_ref[0, :] * xwin_ref[lo : lo + chunk]
        for k in range(1, d):
            acc = acc + data_ref[k, :] * xwin_ref[lo : lo + chunk]
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_Element(win),),
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
    )(xp, dp)
    return y[:n]


@functools.partial(jax.jit, static_argnames=("offsets", "rows"))
def dia_roll2d(data, offsets, x, *, rows=256):
    """2-D layout: x as (R, 128); shift by off = sublane roll + lane
    roll + boundary select, all on VMEM-resident blocks.

    Each grid step owns `rows` sublanes of the output; the x window is
    rows + 2*pad_rows sublanes so every shifted read is in-window.
    """
    d, n = data.shape
    L = 128
    maxoff = max(abs(o) for o in offsets)
    # Window margin in sublanes; multiple of 4 so win = rows + 2*pad_rows
    # keeps the sublane dim divisible by 8 (Mosaic block requirement).
    pad_rows = _round_up(_round_up(maxoff + L, L) // L, 4)
    R = (n + L - 1) // L
    Rp = _round_up(R, rows)
    # x laid out (Rp + 2*pad_rows, 128): pad_rows rows of zeros, x, tail
    xp = jnp.pad(x, (pad_rows * L, (Rp * L - n) + pad_rows * L)).reshape(-1, L)
    dp = jnp.pad(data, ((0, 0), (0, Rp * L - n))).reshape(d, Rp, L)
    win = rows + 2 * pad_rows
    grid = (Rp // rows,)

    def kernel(xw_ref, data_ref, y_ref):
        xw = xw_ref[:]  # (win, 128)
        acc = None
        for k, off in enumerate(offsets):
            s, r = divmod(off, L)  # off = s*128 + r, 0 <= r < 128
            # result[i, j] = xw[pad_rows + i + s + (1 if j+r>=128), (j+r)%128]
            base = xw[pad_rows + s : pad_rows + s + rows, :]
            nxt = xw[pad_rows + s + 1 : pad_rows + s + 1 + rows, :]
            if r == 0:
                shifted = base
            else:
                # left-rotate by r; shift must be i32 under x64
                rolled = pltpu.roll(base, jnp.int32(L - r), 1)
                rolled_n = pltpu.roll(nxt, jnp.int32(L - r), 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
                shifted = jnp.where(lane < L - r, rolled, rolled_n)
            term = data_ref[k, :, :] * shifted
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_Element(win), _Element(L)),
                lambda i: (jnp.int32(i) * jnp.int32(rows), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, rows, L),
                lambda i: (jnp.int32(0), jnp.int32(i), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, L),
            lambda i: (jnp.int32(i), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, L), data.dtype),
    )(xp, dp)
    return y.reshape(-1)[:n]


def main():
    g = 1000
    A = _laplacian_2d(g)
    n, nnz = A.shape[0], A.nnz
    dia = dia_from_scipy(A.astype(np.float32))
    data = jnp.asarray(dia.data)
    offsets = tuple(int(o) for o in dia.offsets)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))

    from spectra_tpu.sparse.formats import DiaMatrix

    dm = DiaMatrix(data=data, offsets=offsets, n_rows=n, n_cols=n)
    y_ref = np.asarray(dm.matvec(x))

    def report(name, fn, check=True):
        try:
            y = np.asarray(fn(x))
            err = np.abs(y - y_ref).max() if check else float("nan")
            t = _inloop(fn, x)
            print(
                f"{name:22s} {nnz / t / 1e9:8.2f} Gnnz/s  ({t * 1e6:7.1f} us)"
                f"  err={err:.2e}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)

    variants = {
        "xla": (dm.matvec, True),
        "pallas_cur": (lambda v: dia_spmv_pallas(data, offsets, v), True),
        "pallas_cur_c131072": (
            lambda v: dia_spmv_pallas(data, offsets, v, chunk=131072),
            True,
        ),
        "pallas_noshift": (lambda v: dia_noshift(data, offsets, v), False),
    }
    for rows in (256, 512, 1024, 2048):
        variants[f"pallas_roll2d_r{rows}"] = (
            lambda v, rows=rows: dia_roll2d(data, offsets, v, rows=rows),
            True,
        )
    names = sys.argv[1:] or list(variants)
    for name in names:
        fn, check = variants[name]
        report(name, fn, check=check)


if __name__ == "__main__":
    main()
