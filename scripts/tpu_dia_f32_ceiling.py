"""Structural ceiling check: same fused-window DIA kernel, plain f32.

If this runs far above the DS kernel's rate, the DS kernel is
compute-bound; if similar, it is structure/bandwidth-bound.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402
from jax._src.pallas.core import Element as _Element  # noqa: E402

from scripts.tpu_dia_ds_probe import (  # noqa: E402
    _round_up,
    bench_loop,
    lap3d_dia_planes,
)


@functools.partial(jax.jit, static_argnames=("offsets", "n", "chunk"))
def dia_spmv_f32(d32, x32, *, offsets, n, chunk=65536):
    d = d32.shape[0]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    span = lo + hi
    n_pad = _round_up(n, chunk)
    grid = (n_pad // chunk,)
    win = _round_up(chunk + span, 1024)
    xp = jnp.pad(x32, (lo, (n_pad - n) + (win - chunk)))
    dp = jnp.pad(d32, ((0, 0), (0, n_pad - n)))

    def kernel(x_ref, d_ref, y_ref):
        xw = x_ref[:]
        acc = d_ref[0, :] * jax.lax.slice(
            xw, (lo + offsets[0],), (lo + offsets[0] + chunk,)
        )
        for k, off in enumerate(offsets[1:], start=1):
            acc = acc + d_ref[k, :] * jax.lax.slice(
                xw, (lo + off,), (lo + off + chunk,)
            )
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
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
    )(xp, dp)
    return y[:n]


def run(g, chunk):
    data, offs = lap3d_dia_planes(g)
    n = g**3
    nnz = int((np.abs(data) > 0).sum())
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    d32 = jnp.asarray(data, jnp.float32)
    x32 = jnp.asarray(x, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(d32, x0, k):
        return jax.lax.fori_loop(
            0,
            k,
            lambda i, v: dia_spmv_f32(
                d32, v, offsets=offs, n=n, chunk=chunk
            )
            * np.float32(1 / 16.0),
            x0,
        )

    dt = bench_loop(loop, d32, x32)
    print(
        json.dumps(
            {
                "g": g,
                "chunk": chunk,
                "f32_ms": round(dt * 1e3, 3),
                "f32_gnnz_s": round(nnz / dt / 1e9, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 243
    for c in [int(v) for v in sys.argv[2:]] or [65536, 131072]:
        try:
            run(g, c)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"chunk": c, "error": str(e)[:160]}), flush=True)
