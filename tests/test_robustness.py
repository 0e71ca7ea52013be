"""Robustness battery: seed sweeps, determinism, reference-size grids.

The reference's CI runs each solver over a size x rule grid; this adds
a randomized sweep (many seeded matrices through one config) and an
explicit bitwise-determinism check (the replicated-computation
guarantee the distributed design relies on, SURVEY.md section 5).
"""

import numpy as np
import pytest

import spectra_tpu as st
from spectra_tpu.util.rng import SimpleRandom


class TestSeedSweep:
    @pytest.mark.parametrize("seed", range(12))
    def test_sym_many_seeds(self, seed):
        rng = np.random.default_rng(seed)
        n = 80
        A = rng.uniform(size=(n, n)) - 0.5
        A = A + A.T
        op = st.DenseSymMatProd.create(A)
        eigs = st.SymEigsSolver(op, nev=4, ncv=16)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == 4
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-9


class TestDeterminism:
    def test_bitwise_repeatable(self):
        """Two identical runs produce bitwise identical results — the
        property that lets the replicated small problem run divergence-
        free on every host of a mesh."""
        rng = np.random.default_rng(42)
        n = 150
        A = rng.uniform(size=(n, n)) - 0.5
        A = A + A.T
        op = st.DenseSymMatProd.create(A)

        outs = []
        for _ in range(2):
            eigs = st.SymEigsSolver(op, nev=5, ncv=20)
            eigs.init()
            eigs.compute(st.SortRule.LargestMagn)
            outs.append(
                (eigs.eigenvalues().copy(), np.asarray(eigs.eigenvectors()))
            )
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])

    def test_default_v0_matches_reference_stream(self):
        """The default starting vector is the reference's SimpleRandom
        stream, bit for bit (Util/SimpleRandom.h:21-129 semantics)."""
        v = SimpleRandom(0).random_vec(8)
        # First draws of the Park-Miller MINSTD generator, seed 0 -> 1:
        # state_k = 16807^k mod (2^31 - 1), value = state / m - 0.5.
        m = 2**31 - 1
        state = 1
        expected = []
        for _ in range(8):
            state = (state * 16807) % m
            expected.append(state / m - 0.5)
        np.testing.assert_allclose(v, expected, rtol=0, atol=0)


@pytest.mark.slow
class TestReferenceSizeGrid:
    """The reference's largest test configuration (n=1000, k=20, m=50),
    run with `pytest -m slow` (test/SymEigs.cpp:100-167)."""

    def test_n1000_k20_m50(self):
        rng = np.random.default_rng(123)
        n = 1000
        A = rng.uniform(size=(n, n)) - 0.5
        A = A + A.T
        op = st.DenseSymMatProd.create(A)
        eigs = st.SymEigsSolver(op, nev=20, ncv=50)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == 20
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-9


@pytest.mark.slow
class TestReferenceSizeGridGen:
    """Reference gen sizes (n=1000, k=10, m=30), pytest -m slow."""

    def test_gen_n1000(self):
        rng = np.random.default_rng(7)
        n = 1000
        A = rng.uniform(size=(n, n)) - 0.5
        op = st.DenseGenMatProd.create(A)
        eigs = st.GenEigsSolver(op, nev=10, ncv=30)
        eigs.init()
        nconv = eigs.compute(st.SortRule.LargestMagn)
        assert eigs.info() == st.CompInfo.Successful
        assert nconv == 10
        vals = eigs.eigenvalues()
        vecs = np.asarray(eigs.eigenvectors())
        assert np.abs(A @ vecs - vecs * vals[None, :]).max() < 1e-9
