"""Hessenberg shifted-QR sweep tests (reference: test/QR.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectra_tpu.linalg.hessenberg import (
    clip_to_hessenberg,
    double_shift_qr,
    hessenberg_qr,
)


def _rand_hess(m, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(m, m))
    if complex_:
        H = H + 1j * rng.normal(size=(m, m))
    return np.triu(H, -1)


def _check_similarity(H, H_new, Q, atol=1e-12):
    m = H.shape[0]
    np.testing.assert_allclose(
        Q.conj().T @ Q, np.eye(m), atol=atol, err_msg="Q not unitary"
    )
    np.testing.assert_allclose(
        Q.conj().T @ H @ Q, H_new, atol=atol, err_msg="not a similarity"
    )
    assert np.abs(np.tril(H_new, -2)).max() == 0.0, "not Hessenberg"


@pytest.mark.parametrize("m", [6, 20, 60])
def test_hessenberg_qr_real(m):
    H = _rand_hess(m, seed=m)
    shift = 0.37
    H_new, Q = hessenberg_qr(jnp.asarray(H), shift)
    _check_similarity(H, np.asarray(H_new), np.asarray(Q))


@pytest.mark.parametrize("m", [6, 24])
def test_hessenberg_qr_complex(m):
    H = _rand_hess(m, seed=m, complex_=True)
    shift = 0.2 - 0.5j
    H_new, Q = hessenberg_qr(jnp.asarray(H), shift)
    _check_similarity(H, np.asarray(H_new), np.asarray(Q))


def test_hessenberg_qr_exact_shift_deflates():
    m = 12
    H = _rand_hess(m, seed=3)
    lam = np.linalg.eigvals(H)
    real_lams = lam[np.abs(lam.imag) < 1e-12]
    assert len(real_lams) > 0
    mu = float(real_lams[0].real)
    H_new, _ = hessenberg_qr(jnp.asarray(H), mu)
    H_new = np.asarray(H_new)
    assert abs(H_new[m - 1, m - 2]) < 1e-8
    np.testing.assert_allclose(H_new[m - 1, m - 1], mu, atol=1e-8)


@pytest.mark.parametrize("m", [6, 20, 60])
def test_double_shift_qr(m):
    H = _rand_hess(m, seed=m + 100)
    lam = np.linalg.eigvals(H)
    cplx = lam[lam.imag > 1e-9]
    mu = cplx[np.argmax(np.abs(cplx))]
    s, t = 2 * mu.real, abs(mu) ** 2
    H_new, Q = double_shift_qr(jnp.asarray(H), s, t)
    _check_similarity(H, np.asarray(H_new), np.asarray(Q), atol=1e-10)


def test_double_shift_exact_pair_deflates():
    m = 10
    H = _rand_hess(m, seed=17)
    lam = np.linalg.eigvals(H)
    cplx = lam[lam.imag > 1e-9]
    mu = cplx[0]
    H_new, _ = double_shift_qr(jnp.asarray(H), 2 * mu.real, abs(mu) ** 2)
    H_new = np.asarray(H_new)
    # the exact conjugate pair deflates into the trailing 2x2 block
    assert abs(H_new[m - 2, m - 3]) < 1e-7
    block = H_new[m - 2 :, m - 2 :]
    block_eig = np.linalg.eigvals(block)
    np.testing.assert_allclose(
        np.sort_complex(block_eig), np.sort_complex([mu.conj(), mu]), atol=1e-7
    )


def test_double_shift_with_deflated_blocks():
    """H with an exact internal zero subdiagonal (two blocks)."""
    m = 12
    H = _rand_hess(m, seed=23)
    H[6, 5] = 0.0
    lam = np.linalg.eigvals(H)
    cplx = lam[lam.imag > 1e-9]
    mu = cplx[0]
    H_new, Q = double_shift_qr(jnp.asarray(H), 2 * mu.real, abs(mu) ** 2)
    _check_similarity(H, np.asarray(H_new), np.asarray(Q), atol=1e-10)
    # block structure is preserved
    assert abs(np.asarray(H_new)[6, 5]) < 1e-12


def test_clip_to_hessenberg():
    M = np.ones((5, 5))
    C = np.asarray(clip_to_hessenberg(jnp.asarray(M)))
    assert np.abs(np.tril(C, -2)).max() == 0
    assert np.abs(np.triu(C, -1) - np.triu(M, -1)).max() == 0
