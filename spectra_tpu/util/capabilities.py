"""Runtime-capability probes.

Some PJRT runtimes lack features the default code paths use: host
callbacks (``pure_callback``) and complex dtypes (TPU hardware has no
complex ALU and some runtimes reject C64/C128 outright).

The probes run in a **subprocess**: on at least one tunneled TPU
runtime, a failed compile poisons the in-process PJRT client so that
every later ``device_put`` errors — probing in-process would break the
very process that needs the answer. Results are cached per platform in
a temp file, so the subprocess cost is paid once per machine/platform,
and in-memory per process.
"""

import json
import os
import subprocess
import sys
import tempfile

import jax

_CACHE: dict = {}

_PROBE_CODE = r"""
import json
out = {"callbacks": False, "complex": False}
try:
    import numpy as np
    import jax
    # Pin the parent's platform selection (the environment may
    # pre-import jax with a different default plugin; the config is
    # still mutable until the backend initializes).
    {PLATFORM_LINE}
    import jax.numpy as jnp
    try:
        r = jax.jit(
            lambda x: jax.pure_callback(
                lambda a: np.asarray(a) + 1.0,
                jax.ShapeDtypeStruct((), jnp.float32),
                x,
            )
        )(jnp.float32(1.0))
        out["callbacks"] = bool(r == 2.0)
    except Exception:
        pass
    try:
        r = jax.jit(lambda: (jnp.ones((4,), jnp.complex64) * (1 + 2j)).sum())()
        out["complex"] = bool(abs(complex(r) - (4 + 8j)) < 1e-3)
    except Exception:
        pass
except Exception:
    pass
print("CAPS:" + json.dumps(out))
"""


def _cache_path(platform: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), f"spectra_tpu_caps_{platform}_{jax.__version__}.json"
    )


def _probe() -> dict:
    """Run both probes in an isolated subprocess."""
    platform = jax.default_backend()
    path = _cache_path(platform)
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        pass
    caps = {"callbacks": False, "complex": False}
    plat_cfg = getattr(jax.config, "jax_platforms", None)
    pin = (
        f'jax.config.update("jax_platforms", "{plat_cfg}")' if plat_cfg else "pass"
    )
    code = _PROBE_CODE.replace("{PLATFORM_LINE}", pin)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=600,
            capture_output=True,
            text=True,
            env=dict(os.environ),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CAPS:"):
                caps = json.loads(line[5:])
                break
        else:
            return caps  # probe crashed: conservative, do not cache
    except subprocess.TimeoutExpired:
        return caps  # runtime wedged: conservative, do not cache
    try:
        with open(path, "w") as f:
            json.dump(caps, f)
    except OSError:
        pass
    return caps


def _get(key: str) -> bool:
    if key not in _CACHE:
        _CACHE.update(_probe())
    return _CACHE[key]


def resolve() -> None:
    """Eagerly resolve all probes (driver entry points call this)."""
    _get("callbacks")


def host_callbacks_supported() -> bool:
    """Whether ``jax.pure_callback`` works inside compiled programs on
    the default backend."""
    return _get("callbacks")


def complex_supported() -> bool:
    """Whether the default backend can execute complex arithmetic."""
    return _get("complex")


def cpu_device():
    """A host CPU device for small replicated kernels (always exists)."""
    return jax.local_devices(backend="cpu")[0]
