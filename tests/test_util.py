"""Util-layer tests: RNG bit-exactness and selection rules."""

import numpy as np
import pytest

from spectra_tpu.util.rng import SimpleRandom
from spectra_tpu.util.selection import SortRule, argsort, both_ends_permutation


def _reference_lcg_stream(seed, count):
    """Literal transcription of the MINSTD recurrence for cross-checking
    the vectorized implementation (state' = 16807 * state mod 2^31-1)."""
    m = 2147483647
    state = (seed & m) if seed else 1
    out = []
    for _ in range(count):
        state = (16807 * state) % m
        out.append(state / m - 0.5)
    return np.array(out)


class TestSimpleRandom:
    def test_matches_sequential_lcg(self):
        for seed in (0, 1, 42, 123456789):
            got = SimpleRandom(seed).random_vec(1000)
            want = _reference_lcg_stream(seed, 1000)
            np.testing.assert_array_equal(got, want)

    def test_large_vector_crosses_block_boundary(self):
        n = (1 << 16) + 7
        got = SimpleRandom(0).random_vec(n)
        want = _reference_lcg_stream(0, n)
        np.testing.assert_array_equal(got, want)

    def test_interleaved_draws_consistent(self):
        rng = SimpleRandom(7)
        a = rng.random()
        b = rng.random_vec(5)
        combined = np.concatenate([[a], b])
        np.testing.assert_array_equal(combined, _reference_lcg_stream(7, 6))

    def test_complex_draws(self):
        v = SimpleRandom(0).random_vec(4, dtype=np.complex128)
        stream = _reference_lcg_stream(0, 8)
        np.testing.assert_array_equal(v.real, stream[0::2])
        np.testing.assert_array_equal(v.imag, stream[1::2])

    def test_range(self):
        v = SimpleRandom(0).random_vec(10000)
        assert np.all(v > -0.5) and np.all(v < 0.5)


class TestArgsort:
    vals = np.array([3.0, -5.0, 1.0, -2.0, 4.0])

    def test_largest_magn(self):
        ind = np.asarray(argsort(SortRule.LargestMagn, self.vals))
        assert list(self.vals[ind]) == [-5.0, 4.0, 3.0, -2.0, 1.0]

    def test_largest_alge(self):
        ind = np.asarray(argsort(SortRule.LargestAlge, self.vals))
        assert list(self.vals[ind]) == [4.0, 3.0, 1.0, -2.0, -5.0]

    def test_smallest_magn(self):
        ind = np.asarray(argsort(SortRule.SmallestMagn, self.vals))
        assert list(self.vals[ind]) == [1.0, -2.0, 3.0, 4.0, -5.0]

    def test_smallest_alge(self):
        ind = np.asarray(argsort(SortRule.SmallestAlge, self.vals))
        assert list(self.vals[ind]) == [-5.0, -2.0, 1.0, 3.0, 4.0]

    def test_both_ends_interleave(self):
        # Largest => Smallest => 2nd largest => 2nd smallest => ...
        ind = np.asarray(argsort(SortRule.BothEnds, self.vals))
        assert list(self.vals[ind]) == [4.0, -5.0, 3.0, -2.0, 1.0]

    def test_both_ends_permutation_even(self):
        assert list(both_ends_permutation(4)) == [0, 3, 1, 2]

    def test_complex_rules(self):
        vals = np.array([1 + 1j, -3 + 0.5j, 0.1 - 2j])
        ind = np.asarray(argsort(SortRule.LargestMagn, vals))
        assert ind[0] == 1
        ind = np.asarray(argsort(SortRule.LargestReal, vals))
        assert ind[0] == 0
        ind = np.asarray(argsort(SortRule.LargestImag, vals))
        assert ind[0] == 2
        ind = np.asarray(argsort(SortRule.SmallestImag, vals))
        assert ind[0] == 1  # |0.5| smallest imag in magnitude

    def test_alge_rejects_complex(self):
        with pytest.raises(ValueError):
            argsort(SortRule.LargestAlge, np.array([1 + 1j]))


class TestArgsortNp:
    """numpy twin of the jit argsort (host-driven paths)."""

    def test_matches_jax_real(self):
        from spectra_tpu.util.selection import argsort, argsort_np

        v = np.random.default_rng(0).normal(size=17)
        for rule in [
            SortRule.LargestMagn,
            SortRule.SmallestMagn,
            SortRule.LargestAlge,
            SortRule.SmallestAlge,
            SortRule.BothEnds,
        ]:
            np.testing.assert_array_equal(
                argsort_np(rule, v), np.asarray(argsort(rule, v))
            )

    def test_matches_jax_complex(self):
        from spectra_tpu.util.selection import argsort, argsort_np

        rng = np.random.default_rng(1)
        v = rng.normal(size=11) + 1j * rng.normal(size=11)
        for rule in [
            SortRule.LargestMagn,
            SortRule.SmallestMagn,
            SortRule.LargestReal,
            SortRule.LargestImag,
        ]:
            np.testing.assert_array_equal(
                argsort_np(rule, v), np.asarray(argsort(rule, v))
            )


def test_capabilities_on_cpu():
    from spectra_tpu.util import capabilities

    assert capabilities.host_callbacks_supported() is True
    assert capabilities.complex_supported() is True
    assert capabilities.cpu_device().platform == "cpu"
