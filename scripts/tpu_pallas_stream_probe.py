"""Pallas streaming-bandwidth probe: y = 2x over an HBM-resident f32
array, chunked like the DIA kernel. Establishes the achievable Pallas
pipeline bandwidth to compare against the DS kernel's effective rate
(and the XLA fusion's, measured by the same in-loop method)."""

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


def _sync(r):
    return np.asarray(jax.tree_util.tree_leaves(r)[0][:1])


@functools.partial(jax.jit, static_argnames=("chunk",))
def scale_pallas(x, chunk=65536):
    n = x.shape[0]
    grid = (n // chunk,)

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * np.float32(2.0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (chunk,), lambda i: (jnp.int32(i),),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (chunk,), lambda i: (jnp.int32(i),), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
    )(x)


@jax.jit
def scale_xla(x):
    return x * np.float32(2.0)


def bench(fn, x, iters=200):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, v: fn(v) * np.float32(0.5), x
        )

    for k in (10, 10 + iters):
        _sync(loop(x, k=k))

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(loop(x, k=k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(10 + iters) - timed(10)) / iters


if __name__ == "__main__":
    n = 128 * 1024 * 1024  # 512 MB f32
    x = jnp.ones((n,), jnp.float32)
    for chunk in [int(c) for c in sys.argv[1:]] or [65536, 131072, 262144,
                                                    524288]:
        try:
            fn = functools.partial(scale_pallas, chunk=chunk)
            dt = bench(fn, x)
            gbs = 2 * n * 4 / dt / 1e9
            print(json.dumps({"chunk": chunk, "ms": round(dt * 1e3, 3),
                              "GBs": round(gbs, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"chunk": chunk, "error": str(e)[:120]}),
                  flush=True)
    dt = bench(scale_xla, x)
    print(json.dumps({"xla": True, "ms": round(dt * 1e3, 3),
                      "GBs": round(2 * n * 4 / dt / 1e9, 1)}), flush=True)
