"""Runtime-capability probes.

Some PJRT runtimes lack features the default code paths use: host
callbacks (``pure_callback``) and complex dtypes (TPU hardware has no
complex ALU and some runtimes reject C64/C128 outright). Each probe
runs once and is cached; solvers consult them at trace/driver time to
pick an equivalent fully-supported path.
"""

import numpy as np
import jax
import jax.numpy as jnp

_CACHE: dict = {}


def _tracing() -> bool:
    """True when called under an active jax trace — probes must not
    execute there (an eager sub-execution inside a trace fails and
    would poison the cache with a wrong negative)."""
    try:
        return not jax.core.trace_ctx.is_top_level()
    except Exception:
        try:
            import jax._src.core as _core

            return not _core.trace_state_clean()
        except Exception:
            return False


def resolve() -> None:
    """Eagerly run all probes (call from driver entry points, outside
    any jit trace)."""
    host_callbacks_supported()
    complex_supported()


def host_callbacks_supported() -> bool:
    """Whether ``jax.pure_callback`` works inside compiled programs on
    the default backend."""
    if "callbacks" not in _CACHE:
        if _tracing():
            # Un-probed inside a trace: choose the conservative
            # (callback-free) route for this trace, do not cache.
            return False
        try:
            out = jax.jit(
                lambda x: jax.pure_callback(
                    lambda a: np.asarray(a) + 1.0,
                    jax.ShapeDtypeStruct((), jnp.float32),
                    x,
                )
            )(jnp.float32(1.0))
            _CACHE["callbacks"] = bool(out == 2.0)
        except Exception:
            _CACHE["callbacks"] = False
    return _CACHE["callbacks"]


def complex_supported() -> bool:
    """Whether the default backend can execute complex arithmetic."""
    if "complex" not in _CACHE:
        if _tracing():
            return False
        try:
            out = jax.jit(lambda: (jnp.ones((4,), jnp.complex64) * (1 + 2j)).sum())()
            _CACHE["complex"] = bool(abs(complex(out) - (4 + 8j)) < 1e-3)
        except Exception:
            _CACHE["complex"] = False
    return _CACHE["complex"]


def cpu_device():
    """A host CPU device for small replicated kernels (always exists)."""
    return jax.local_devices(backend="cpu")[0]
