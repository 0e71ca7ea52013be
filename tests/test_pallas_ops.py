"""Pallas kernel tests (interpreter mode — compiled-mode validation
runs on real TPU hardware in the benchmark)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from spectra_tpu.ops import dia_spmv_pallas
from spectra_tpu.sparse import dia_from_scipy


def _laplacian_2d(g):
    lap1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    return (sps.kron(sps.eye(g), lap1) + sps.kron(lap1, sps.eye(g))).tocsr()


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dia_spmv_pallas_matches(dtype):
    g = 24
    A = _laplacian_2d(g)
    dia = dia_from_scipy(A, dtype=dtype)
    x = np.random.default_rng(0).normal(size=g * g).astype(dtype)
    y = np.asarray(
        dia_spmv_pallas(dia.data, dia.offsets, jnp.asarray(x), chunk=1024, interpret=True)
    )
    want = (A @ x.astype(np.float64)).astype(dtype)
    atol = 1e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(y, want, atol=atol)


def test_dia_spmv_pallas_unaligned_n():
    """n not a multiple of the chunk exercises the padding path."""
    n = 777
    diags = sps.diags(
        [np.ones(n - 3), 2.0 + np.arange(n), -np.ones(n - 1)], [-3, 0, 1]
    ).tocsr()
    dia = dia_from_scipy(diags)
    x = np.random.default_rng(1).normal(size=n)
    y = np.asarray(
        dia_spmv_pallas(dia.data, dia.offsets, jnp.asarray(x), chunk=1024, interpret=True)
    )
    np.testing.assert_allclose(y, diags @ x, atol=1e-12)
