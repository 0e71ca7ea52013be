"""Tests for the fused double-single DIA SpMV (ops/dia_ds.py) and the
DiaHiLoMatrix format (sparse/formats.py).

The Pallas kernel itself runs in interpreter mode on the CPU test
runtime; the TPU-measured numbers live in scripts/tpu_dia_ds_probe.py.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from spectra_tpu.ops.dia_ds import (
    combine_f64,
    dia_spmv_ds_padded,
    hilo_suitable,
    split_f64,
)
from spectra_tpu.sparse.formats import (
    DiaHiLoMatrix,
    DiaMatrix,
    dia_from_scipy,
    maybe_hilo,
)


def _random_dia(n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((len(offsets), n))
    # zero the out-of-range positions (row-aligned DIA convention)
    for k, off in enumerate(offsets):
        if off > 0:
            data[k, n - off :] = 0.0
        elif off < 0:
            data[k, : -off] = 0.0
    return data


def _ref_spmv(data, offsets, x):
    n = x.shape[0]
    y = np.zeros(n)
    for k, off in enumerate(offsets):
        if off >= 0:
            y[: n - off] += data[k, : n - off] * x[off:]
        else:
            y[-off:] += data[k, -off:] * x[: n + off]
    return y


def test_split_combine_accuracy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(512) * 10.0**rng.integers(
        -8, 8, 512
    ))
    hi, lo = split_f64(x)
    assert hi.dtype == jnp.float32 and lo.dtype == jnp.float32
    # double-single representation: residual <= ~2^-48 relative
    err = np.abs(np.asarray(combine_f64(hi, lo)) - np.asarray(x))
    assert np.all(err <= 2.0**-47 * np.abs(np.asarray(x)))


@pytest.mark.parametrize("offsets", [(-3, -1, 0, 1, 3), (-17, 0, 17)])
def test_kernel_interpret_accuracy(offsets):
    n = 300
    chunk = 1024
    data = _random_dia(n, offsets)
    x = np.random.default_rng(2).standard_normal(n)
    n_pad = (n + chunk - 1) // chunk * chunk
    dh, dl = split_f64(
        jnp.pad(jnp.asarray(data), ((0, 0), (0, n_pad - n)))
    )
    xh, xl = split_f64(jnp.asarray(x))
    yh, yl = dia_spmv_ds_padded(
        dh, dl, xh, xl, offsets=offsets, n=n, chunk=chunk, interpret=True
    )
    y = np.asarray(combine_f64(yh, yl))
    y_ref = _ref_spmv(data, offsets, x)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() <= 1e-12 * scale


def test_hilo_matrix_matvec_fallback_matches_dia():
    n = 257
    offsets = (-16, -1, 0, 1, 16)
    data = _random_dia(n, offsets, seed=3)
    dia = DiaMatrix(
        data=jnp.asarray(data), offsets=offsets, n_rows=n, n_cols=n
    )
    hilo = DiaHiLoMatrix.from_dia(dia, chunk=1024)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(n))
    # The stored matrix is A + dA with |dA| <= 2^-48 |A|; every access
    # path must agree with the DIA original to that backward error.
    tol = dict(rtol=2.0**-45, atol=1e-300)
    np.testing.assert_allclose(
        np.asarray(hilo.matvec(x)), np.asarray(dia.matvec(x)),
        rtol=0, atol=2.0**-45 * float(np.abs(dia.matvec(x)).max()),
    )
    np.testing.assert_allclose(
        np.asarray(hilo.to_dia().data), np.asarray(dia.data), **tol
    )
    np.testing.assert_allclose(
        np.asarray(hilo.diagonal()), np.asarray(dia.diagonal()), **tol
    )
    np.testing.assert_allclose(
        np.asarray(hilo.to_dense()), np.asarray(dia.to_dense()), **tol
    )
    X = jnp.asarray(np.random.default_rng(5).standard_normal((n, 3)))
    np.testing.assert_allclose(
        np.asarray(hilo.matmat(X)), np.asarray(dia.matmat(X)),
        rtol=0, atol=2.0**-45 * float(np.abs(dia.matmat(X)).max()),
    )
    assert hilo.dtype == jnp.float64
    assert hilo.nnz == len(offsets) * n


def test_hilo_is_a_pytree():
    n = 64
    offsets = (-1, 0, 1)
    dia = DiaMatrix(
        data=jnp.asarray(_random_dia(n, offsets)), offsets=offsets,
        n_rows=n, n_cols=n,
    )
    hilo = DiaHiLoMatrix.from_dia(dia, chunk=1024)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n))

    @jax.jit
    def mv(m, v):
        return m.matvec(v)

    np.testing.assert_allclose(
        np.asarray(mv(hilo, x)), np.asarray(dia.matvec(x)), rtol=1e-14
    )


def test_maybe_hilo_routing():
    A = sps.diags(
        [-1.0, 2.0, -1.0], [-1, 0, 1], shape=(500, 500)
    ).tocsr()
    dia = dia_from_scipy(A)
    # CPU backend: never routed.
    out = maybe_hilo(dia, threshold=0)
    if jax.default_backend() == "tpu":
        assert isinstance(out, DiaHiLoMatrix)
    else:
        assert out is dia
    # Below threshold: untouched regardless of backend.
    assert maybe_hilo(dia) is dia


def test_hilo_suitable_span_guard():
    assert hilo_suitable((-1, 0, 1), 1000)
    assert not hilo_suitable((-(10**7), 0, 10**7), 10**7)


def test_native_and_scipy_dia_conversion_identical(monkeypatch):
    """dia_from_scipy routes through the threaded native CSR->DIA
    converter; it must match the scipy fallback bit-for-bit."""
    from spectra_tpu import native
    from spectra_tpu.sparse import formats

    if not native.available():
        pytest.skip("no native toolchain")
    A = sps.random(300, 300, density=0.03, random_state=0, format="csr")
    d1 = formats.dia_from_scipy(A)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    d2 = formats.dia_from_scipy(A)
    assert d1.offsets == d2.offsets
    np.testing.assert_array_equal(np.asarray(d1.data), np.asarray(d2.data))


def test_kernel_interpret_3d_stencil_shape():
    """The production shape class: 7-diagonal 3-D stencil offsets
    (+-1, +-g, +-g^2) with multi-chunk grids and hi/lo data planes
    that are NOT exactly representable in f32."""
    g = 7
    n = g**3
    chunk = 128
    offsets = (-(g * g), -g, -1, 0, 1, g, g * g)
    data = _random_dia(n, offsets, seed=11) * np.pi  # non-dyadic values
    x = np.random.default_rng(12).standard_normal(n)
    n_pad = (n + chunk - 1) // chunk * chunk
    dh, dl = split_f64(
        jnp.pad(jnp.asarray(data), ((0, 0), (0, n_pad - n)))
    )
    xh, xl = split_f64(jnp.asarray(x))
    yh, yl = dia_spmv_ds_padded(
        dh, dl, xh, xl, offsets=offsets, n=n, chunk=chunk, interpret=True
    )
    y = np.asarray(combine_f64(yh, yl))
    y_ref = _ref_spmv(data, offsets, x)
    assert np.abs(y - y_ref).max() <= 1e-12 * np.abs(y_ref).max()
