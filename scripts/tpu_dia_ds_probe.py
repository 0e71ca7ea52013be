"""Probe: Pallas fused-DIA double-single (hi/lo f32) SpMV on TPU.

Round-4 finding (docs/ROADMAP.md Open #0): at n = 14.35M (the 100M-nnz
3-D stencil) the XLA f64 DIA SpMV is pass-limited — one HBM sweep per
diagonal plus f64-emulation conversion temps — sustaining ~6 Gnnz/s of
the 590 GB/s streaming roofline. The designed fix is a single Pallas
pass per tile over ALL diagonals with the matrix stored as native f32
hi/lo planes and double-single (Dekker two-prod + Knuth two-sum)
accumulation, so no per-program f64 emulation is paid at all.

This probe measures:
  A. the current f64 DiaMatrix.matvec in-loop (baseline),
  B. the Pallas hi/lo kernel with planes threaded through the loop
     (kernel-only sustained rate),
  C. the Pallas kernel with an f64 split/combine at every iteration
     (what a drop-in perform_op pays),
and validates B/C against numpy float64 to ~1e-14.

Usage: python scripts/tpu_dia_ds_probe.py [g ...]  (default 64 243)
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

try:
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None

_SPLIT = np.float32(4097.0)  # 2**12 + 1 (f32 Dekker split constant)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _split(a):
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
def dia_spmv_ds(dh, dl, xh, xl, *, offsets, n, chunk=65536, interpret=False):
    """Double-single DIA SpMV: (yh, yl) = A @ (xh + xl).

    dh, dl: (d, n) f32 hi/lo planes of the row-aligned diagonals.
    xh, xl: (n,) f32 hi/lo planes of x.
    Returns renormalized (yh, yl) with yh = f32(y), |yl| <= ulp(yh)/2.
    """
    d = dh.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    n_pad = _round_up(n, chunk)
    grid = (n_pad // chunk,)
    win = _round_up(chunk + span, 1024)

    pad_x = (lo, (n_pad - n) + (win - chunk))
    xhp = jnp.pad(xh, pad_x)
    xlp = jnp.pad(xl, pad_x)
    dhp = jnp.pad(dh, ((0, 0), (0, n_pad - n)))
    dlp = jnp.pad(dl, ((0, 0), (0, n_pad - n)))

    def kernel(xh_ref, xl_ref, dh_ref, dl_ref, yh_ref, yl_ref):
        xw = xh_ref[:]
        xwl = xl_ref[:]
        # Dekker-split the whole window once; every diagonal reuses it.
        xhh, xhl = _split(xw)
        s = jnp.zeros((chunk,), jnp.float32)
        c = jnp.zeros((chunk,), jnp.float32)
        for k, off in enumerate(offsets):
            a = dh_ref[k, :]
            al = dl_ref[k, :]
            b = jax.lax.slice(xw, (lo + off,), (lo + off + chunk,))
            bl = jax.lax.slice(xwl, (lo + off,), (lo + off + chunk,))
            bhh = jax.lax.slice(xhh, (lo + off,), (lo + off + chunk,))
            bhl = jax.lax.slice(xhl, (lo + off,), (lo + off + chunk,))
            p = a * b
            ahh, ahl = _split(a)
            err = ((ahh * bhh - p) + ahh * bhl + ahl * bhh) + ahl * bhl
            err = err + a * bl + al * b
            s, e2 = _two_sum(s, p)
            c = c + (err + e2)
        yh, yl = _two_sum(s, c)
        yh_ref[:] = yh
        yl_ref[:] = yl

    win_spec = lambda: pl.BlockSpec(  # noqa: E731
        (_Element(win),),
        lambda i: (jnp.int32(i) * jnp.int32(chunk),),
        memory_space=pltpu.VMEM,
    )
    dat_spec = lambda: pl.BlockSpec(  # noqa: E731
        (d, chunk), lambda i: (jnp.int32(0), jnp.int32(i)),
        memory_space=pltpu.VMEM,
    )
    out_spec = lambda: pl.BlockSpec(  # noqa: E731
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
    return yh[:n], yl[:n]


def split_f64(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def lap3d_dia_planes(g):
    """Row-aligned DIA planes of the 3-D 7-point Laplacian, analytic.

    offsets (-g^2, -g, -1, 0, 1, g, g^2); value -1 with Dirichlet
    boundaries zeroed, diagonal 6.
    """
    n = g**3
    offs = (-(g * g), -g, -1, 0, 1, g, g * g)
    data = np.zeros((7, n), np.float64)
    i = np.arange(n)
    iz = i % g
    iy = (i // g) % g
    ix = i // (g * g)
    data[0] = np.where(ix > 0, -1.0, 0.0)
    data[1] = np.where(iy > 0, -1.0, 0.0)
    data[2] = np.where(iz > 0, -1.0, 0.0)
    data[3] = 6.0
    data[4] = np.where(iz < g - 1, -1.0, 0.0)
    data[5] = np.where(iy < g - 1, -1.0, 0.0)
    data[6] = np.where(ix < g - 1, -1.0, 0.0)
    return data, offs


def ref_spmv(data, offs, x):
    n = x.shape[0]
    y = np.zeros(n)
    for k, off in enumerate(offs):
        if off >= 0:
            y[: n - off] += data[k, : n - off] * x[off:]
        else:
            y[-off:] += data[k, -off:] * x[: n + off]
    return y


def _sync(res):
    """True device sync: fetch one element to the host (the tunneled
    runtime's block_until_ready can return before execution ends)."""
    leaf = jax.tree_util.tree_leaves(res)[0]
    return np.asarray(leaf[:1])


def bench_loop(fn, *args, k_lo=10, k_hi=210, reps=3):
    for k in (k_lo, k_hi):
        _sync(fn(*args, k=k))

    def timed(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn(*args, k=k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def run(g, chunk=65536):
    data, offs = lap3d_dia_planes(g)
    n = g**3
    nnz = int((np.abs(data) > 0).sum())
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)

    dh, dl = split_f64(jnp.asarray(data))
    xh, xl = split_f64(jnp.asarray(x))
    dh, dl, xh, xl = map(jax.block_until_ready, (dh, dl, xh, xl))

    # accuracy
    yh, yl = dia_spmv_ds(dh, dl, xh, xl, offsets=offs, n=n, chunk=chunk)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    y_ref = ref_spmv(data, offs, x)
    scale = np.abs(y_ref).max()
    err = np.abs(y - y_ref).max() / scale
    out = {"g": g, "n": n, "nnz": nnz, "chunk": chunk,
           "rel_err_vs_f64": float(err)}

    # B: planes threaded through the loop (kernel-only sustained)
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop_planes(dh, dl, xh, xl, k):
        def body(_, carry):
            h, l = carry
            yh, yl = dia_spmv_ds(dh, dl, h, l, offsets=offs, n=n,
                                 chunk=chunk)
            return yh * np.float32(1 / 16.0), yl * np.float32(1 / 16.0)

        return jax.lax.fori_loop(0, k, body, (xh, xl))

    dt = bench_loop(loop_planes, dh, dl, xh, xl)
    out["planes_ms"] = round(dt * 1e3, 3)
    out["planes_gnnz_s"] = round(nnz / dt / 1e9, 2)

    # C: f64 boundary each iteration (drop-in perform_op cost)
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop_f64(dh, dl, x0, k):
        def body(_, v):
            h, l = split_f64(v)
            yh, yl = dia_spmv_ds(dh, dl, h, l, offsets=offs, n=n,
                                 chunk=chunk)
            y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
            return y * (1 / 16.0)

        return jax.lax.fori_loop(0, k, body, x0)

    dt = bench_loop(loop_f64, dh, dl, jnp.asarray(x))
    out["f64boundary_ms"] = round(dt * 1e3, 3)
    out["f64boundary_gnnz_s"] = round(nnz / dt / 1e9, 2)

    # A: current f64 DiaMatrix path
    from spectra_tpu.sparse.formats import DiaMatrix

    A = DiaMatrix(data=jnp.asarray(data), offsets=offs, n_rows=n, n_cols=n)

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop_a(a, x0, k):
        return jax.lax.fori_loop(
            0, k, lambda i, v: a.matvec(v) * (1 / 16.0), x0
        )

    dt = bench_loop(loop_a, A, jnp.asarray(x))
    out["xla_f64_ms"] = round(dt * 1e3, 3)
    out["xla_f64_gnnz_s"] = round(nnz / dt / 1e9, 2)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:] or ["64", "243"]
    chunks = [int(c) for c in (sys.argv[2:] or [65536])] if len(
        sys.argv
    ) > 2 else [65536]
    g = int(args[0])
    for c in chunks:
        try:
            run(g, chunk=c)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"chunk": c, "error": str(e)[:160]}),
                  flush=True)
