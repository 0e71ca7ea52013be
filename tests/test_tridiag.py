"""Tridiagonal QR micro-kernel tests vs numpy ground truth.

Mirrors the checks of the reference's test/QR.cpp (QR factorization
identity, orthogonality of Q, Q^T T Q correctness) at sizes including
the ncv-scale the solver uses.
"""

import jax.numpy as jnp
import numpy as np

from spectra_tpu.linalg.tridiag import (
    accumulate_q,
    apply_yq,
    tridiag_eigen,
    tridiag_qr,
    tridiag_qtq,
    tridiag_to_dense,
)


def _random_tridiag(n, seed):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=n)
    e = rng.normal(size=n - 1)
    return d, e


def _dense(d, e):
    return np.diag(d) + np.diag(e, -1) + np.diag(e, 1)


class TestTridiagQR:
    def test_qr_identity_and_orthogonality(self):
        for n, seed in [(5, 0), (20, 1), (100, 2)]:
            d, e = _random_tridiag(n, seed)
            T = _dense(d, e)
            shift = 0.7
            c, s, e_defl = tridiag_qr(jnp.asarray(d), jnp.asarray(e), shift)
            Q = np.asarray(accumulate_q(c, s))
            # Q orthogonal
            np.testing.assert_allclose(Q.T @ Q, np.eye(n), atol=1e-13)
            # Q R = T - shift I  =>  Q^T (T - shift I) is upper triangular
            R = Q.T @ (T - shift * np.eye(n))
            np.testing.assert_allclose(np.tril(R, -1), 0, atol=1e-12)
            # R has bandwidth 2 (tridiagonal source)
            np.testing.assert_allclose(np.triu(R, 3), 0, atol=1e-12)

    def test_qtq_matches_explicit_product(self):
        for n, seed in [(6, 3), (30, 4)]:
            d, e = _random_tridiag(n, seed)
            T = _dense(d, e)
            shift = -1.3
            c, s, e_defl = tridiag_qr(jnp.asarray(d), jnp.asarray(e), shift)
            Q = np.asarray(accumulate_q(c, s))
            d2, e2 = tridiag_qtq(jnp.asarray(d), e_defl, c, s)
            got = np.asarray(tridiag_to_dense(d2, e2))
            want = Q.T @ T @ Q
            np.testing.assert_allclose(got, want, atol=1e-12)
            # result stays symmetric tridiagonal by construction
            assert np.abs(np.triu(got, 2)).max() == 0.0

    def test_shift_at_eigenvalue_deflates(self):
        # Shifting by an exact eigenvalue must drive the last
        # subdiagonal entry of Q^T T Q to (near) zero — the property the
        # implicit restart relies on.
        d, e = _random_tridiag(12, 5)
        T = _dense(d, e)
        mu = np.linalg.eigvalsh(T)[-1]
        c, s, e_defl = tridiag_qr(jnp.asarray(d), jnp.asarray(e), mu)
        d2, e2 = tridiag_qtq(jnp.asarray(d), e_defl, c, s)
        assert abs(np.asarray(e2)[-1]) < 1e-8

    def test_apply_yq_matches_matmul(self):
        n = 10
        d, e = _random_tridiag(n, 6)
        c, s, _ = tridiag_qr(jnp.asarray(d), jnp.asarray(e), 0.0)
        Q = np.asarray(accumulate_q(c, s))
        Y = np.random.default_rng(7).normal(size=(4, n))
        got = np.asarray(apply_yq(jnp.asarray(Y), c, s))
        np.testing.assert_allclose(got, Y @ Q, atol=1e-13)


class TestTridiagEigen:
    def test_eigen_decomposition(self):
        for n, seed in [(10, 0), (64, 1)]:
            d, e = _random_tridiag(n, seed)
            T = _dense(d, e)
            evals, evecs = tridiag_eigen(jnp.asarray(d), jnp.asarray(e))
            evals, evecs = np.asarray(evals), np.asarray(evecs)
            np.testing.assert_allclose(
                T @ evecs, evecs * evals[None, :], atol=1e-12
            )
            np.testing.assert_allclose(evecs.T @ evecs, np.eye(n), atol=1e-12)
            np.testing.assert_allclose(evals, np.linalg.eigvalsh(T), atol=1e-12)
