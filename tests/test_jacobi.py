"""Parallel-ordered cyclic Jacobi eigensolver (linalg/jacobi.py).

On the TPU backend ``jnp.linalg.eigh``'s f64 eigenvectors carry ~1e-7
residual (the emulated-f64 eigenvector kernel), which propagated into
convergence estimates, thick-restart compression and Ritz assembly —
every TPU-runtime eigensolve was capped near 1e-7. ``jacobi_eigh`` is
the accurate elementwise-only replacement; ``eigh_accurate`` routes to
it on (TPU, wide dtype) and to XLA's native eigh elsewhere. These
tests pin the algorithm on every backend (the kernel is pure jnp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectra_tpu.linalg.jacobi import _round_robin, eigh_accurate, jacobi_eigh


@pytest.mark.parametrize("m", [1, 2, 5, 8, 40, 41, 64])
def test_random_symmetric(m):
    rng = np.random.default_rng(m)
    A = rng.normal(size=(m, m))
    A = A + A.T
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    assert np.all(np.diff(w) >= 0)  # ascending
    np.testing.assert_allclose(w, np.linalg.eigvalsh(A), rtol=0, atol=1e-11)
    assert np.abs(A @ V - V * w[None, :]).max() <= 1e-11
    assert np.abs(V.T @ V - np.eye(m)).max() <= 1e-12


def test_degenerate_clusters():
    # Multiplicities: the north-star 3-D Laplacian regime.
    d = np.repeat([1.0, 2.0, 2.0 + 1e-9, 5.0], 10)
    rng = np.random.default_rng(3)
    Q, _ = np.linalg.qr(rng.normal(size=(40, 40)))
    A = Q @ np.diag(d) @ Q.T
    A = 0.5 * (A + A.T)
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    np.testing.assert_allclose(w, np.sort(d), rtol=0, atol=1e-12)
    assert np.abs(A @ V - V * w[None, :]).max() <= 1e-12
    assert np.abs(V.T @ V - np.eye(40)).max() <= 1e-13


def test_wide_dynamic_range():
    d = np.geomspace(1e-12, 1e6, 30)
    rng = np.random.default_rng(4)
    Q, _ = np.linalg.qr(rng.normal(size=(30, 30)))
    A = Q @ np.diag(d) @ Q.T
    A = 0.5 * (A + A.T)
    w = np.asarray(jax.jit(jacobi_eigh)(jnp.asarray(A))[0])
    # Absolute accuracy at the scale of ||A|| (~1e6 here), like any
    # backward-stable dense eigensolver: atol 1e-8 = 1e-14 relative.
    np.testing.assert_allclose(w, np.sort(d), rtol=0, atol=1e-8)


def test_tiny_offdiag_no_overflow():
    # |apq| ~ 1e-20 against O(10) diagonal separation: tau^2 overflows
    # the TPU float-float emulation unless the pivot is skipped
    # (observed NaN); the eps-floor skip must keep this finite.
    A = np.diag([1.0, 11.0, -3.0, 7.0])
    A[0, 1] = A[1, 0] = 1e-20
    A[2, 3] = A[3, 2] = 1e-17
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    assert bool(jnp.all(jnp.isfinite(w))) and bool(jnp.all(jnp.isfinite(V)))
    np.testing.assert_allclose(
        np.asarray(w), np.sort(np.diag(A)), rtol=0, atol=1e-15
    )


def test_round_robin_covers_all_pairs():
    for m in [2, 4, 8, 42]:
        sched = _round_robin(m)
        assert sched.shape == (m - 1, m // 2, 2)
        seen = set()
        for rnd in sched:
            flat = [int(x) for pair in rnd for x in pair]
            assert len(set(flat)) == m  # disjoint within a round
            seen |= {tuple(p) for p in rnd.tolist()}
        assert len(seen) == m * (m - 1) // 2  # every pair exactly once


def test_eigh_accurate_matches_eigh_off_tpu():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(12, 12))
    A = A + A.T
    w, V = eigh_accurate(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(w), np.linalg.eigvalsh(A), rtol=0, atol=1e-12
    )
    V = np.asarray(V)
    assert np.abs(A @ V - V * np.asarray(w)[None, :]).max() <= 1e-12


def test_equal_diagonal_live_pivot():
    # Review finding: tau == 0 (exactly equal diagonal entries, live
    # pivot) must rotate by 45 degrees, not skip-and-zero the pivot —
    # jnp.sign(0) == 0 silently destroyed the off-diagonal mass.
    A = np.array([[2.0, 1.0], [1.0, 2.0]])
    w, V = jacobi_eigh(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w), [1.0, 3.0], atol=1e-14)
    V = np.asarray(V)
    assert np.abs(A @ V - V * np.asarray(w)[None, :]).max() < 1e-14
    # Larger case: block of exactly-equal diagonals with couplings.
    B = np.full((6, 6), 0.3)
    np.fill_diagonal(B, 5.0)
    w2 = np.asarray(jacobi_eigh(jnp.asarray(B))[0])
    np.testing.assert_allclose(w2, np.linalg.eigvalsh(B), atol=1e-12)
