"""Test environment: CPU backend with 8 virtual devices, fp64 enabled.

Mirrors the reference's fp64 CPU test bar (residuals <= 1e-9) and lets
multi-device sharding tests run on any host (SURVEY.md section 4, build
implication (c)).

Note: the environment may pre-import jax with a TPU platform plugin
(sitecustomize), so plain env vars are too late — we must switch the
platform through jax.config before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["SPECTRA_TPU_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import spectra_tpu  # noqa: E402,F401  (enables x64 before any array op)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled executables between test modules.

    The full suite compiles many hundreds of distinct XLA programs in
    one process; holding all of them live eventually crashes the CPU
    backend's JIT inside ``backend_compile_and_load`` (native segfault,
    deterministic at ~200 tests in). Dropping the jit caches at module
    boundaries keeps the live-executable count bounded; modules re-pay
    compile time for shared kernels, which is acceptable.
    """
    yield
    jax.clear_caches()
