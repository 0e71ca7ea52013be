"""Conformance of the triplicated ARPACK nev-adjust rules.

The dsaup2.f 677-684 / dnaup2.f 660-674 restart-size rules live in
three drivers by design (each owns its restart loop): the compiled
Hermitian core (`solvers/_herm_core._nev_adjusted`), the compiled
general core (`solvers/_gen_core._nev_adjusted`), and the native C++
Krylov-Schur driver (`native/dense_eigs.cpp::nev_adjusted`). This test
feeds identical (ritz_val, ritz_est, nconv, nev, ncv) grids through
all three and asserts agreement — in particular across the small-ncv
edge (ncv in 3..8, nev == 1) where the sym/non-sym branch conditions
differ subtly (reference: HermEigsBase.h:178-202, GenEigsBase.h:245-277).
"""

import ctypes
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from spectra_tpu.solvers import _gen_core, _herm_core

NEAR0 = 2.2250738585072014e-307


def _native():
    from spectra_tpu.native import build_and_load
    from spectra_tpu.native.dense_eigs import _LIB, _SRC

    try:
        lib = build_and_load(_SRC, _LIB)
    except Exception as err:  # toolchain-free environment
        pytest.skip(f"native toolchain unavailable: {err}")
    fn = lib.spectra_nev_adjusted
    fn.restype = ctypes.c_int
    fn.argtypes = [
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    return fn


def _est_patterns(ncv, nev, rng):
    """Residual-estimate vectors: generic, zero-tail (converged
    unwanted pairs inflate nev_new), and all-tiny."""
    base = rng.uniform(0.1, 1.0, size=ncv)
    zero_tail = base.copy()
    zero_tail[max(nev, ncv - 2):] = 0.0
    tiny = np.full(ncv, NEAR0 / 100)
    return [base, zero_tail, tiny]


def test_sym_rules_agree_python_vs_native():
    fn = _native()
    rng = np.random.default_rng(0)
    for ncv in [3, 4, 5, 6, 7, 8, 12, 20]:
        for nev in range(1, ncv):
            for est in _est_patterns(ncv, nev, rng):
                wr = np.sort(rng.uniform(-1, 1, size=ncv))[::-1].copy()
                wi = np.zeros(ncv)
                for nconv in range(0, nev + 1):
                    c_val = fn(wr, wi, est, nconv, nev, ncv, 1)
                    py_val = int(
                        _herm_core._nev_adjusted(
                            jnp.asarray(nconv, jnp.int32),
                            jnp.asarray(est),
                            nev,
                            ncv,
                        )
                    )
                    assert c_val == py_val, (
                        f"sym mismatch ncv={ncv} nev={nev} nconv={nconv}: "
                        f"C++ {c_val} vs py {py_val} (est={est})"
                    )


def _gen_val_patterns(ncv, rng):
    """Eigenvalue layouts: all real, and a conjugate pair at every
    possible boundary position (the pair-keep rule's edge)."""
    real = rng.uniform(-1, 1, size=ncv) + 0j
    out = [real]
    for p in range(ncv - 1):
        v = real.copy()
        re, im = v[p].real, 0.7
        v[p] = re + 1j * im
        v[p + 1] = re - 1j * im
        out.append(v)
    return out


def test_gen_rules_agree_python_vs_native():
    fn = _native()
    rng = np.random.default_rng(1)
    for ncv in [3, 4, 5, 6, 7, 8, 12]:
        for nev in range(1, ncv - 1):
            est = rng.uniform(0.1, 1.0, size=ncv)
            est[ncv - 1] = 0.0  # one converged tail entry
            for vals in _gen_val_patterns(ncv, rng):
                wr = np.ascontiguousarray(vals.real)
                wi = np.ascontiguousarray(vals.imag)
                for nconv in range(0, nev + 1):
                    c_val = fn(wr, wi, est, nconv, nev, ncv, 0)
                    py_val = int(
                        _gen_core._nev_adjusted(
                            jnp.asarray(nconv, jnp.int32),
                            jnp.asarray(vals, jnp.complex128),
                            jnp.asarray(est),
                            nev,
                            ncv,
                        )
                    )
                    assert c_val == py_val, (
                        f"gen mismatch ncv={ncv} nev={nev} nconv={nconv}: "
                        f"C++ {c_val} vs py {py_val} (vals={vals})"
                    )


def test_sym_vs_gen_shared_core():
    """On real spectra with no pairs, the sym and gen rules differ only
    in their documented caps (ncv-1 vs ncv-2, and the ncv>2 vs ncv>3
    small-basis branch); everywhere else they coincide."""
    rng = np.random.default_rng(2)
    for ncv, nev in itertools.product([6, 8, 12], [2, 3]):
        est = rng.uniform(0.1, 1.0, size=ncv)
        vals = rng.uniform(-1, 1, size=ncv) + 0j
        for nconv in range(0, nev + 1):
            sym = int(
                _herm_core._nev_adjusted(
                    jnp.asarray(nconv, jnp.int32), jnp.asarray(est), nev, ncv
                )
            )
            gen = int(
                _gen_core._nev_adjusted(
                    jnp.asarray(nconv, jnp.int32),
                    jnp.asarray(vals, jnp.complex128),
                    jnp.asarray(est),
                    nev,
                    ncv,
                )
            )
            assert gen == min(sym, ncv - 2)
