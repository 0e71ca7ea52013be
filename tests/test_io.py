"""Matrix Market IO round-trips (spectra_tpu/io.py): native C++ reader
vs scipy, operator wrapping, and symmetric-pattern handling."""

import numpy as np
import pytest
import scipy.io
import scipy.sparse as sps

from spectra_tpu import io as stio
from spectra_tpu import native


def _roundtrip(tmp_path, mat, name):
    path = str(tmp_path / name)
    scipy.io.mmwrite(path[:-4], mat)  # mmwrite appends .mtx
    return path


def test_load_matrix_market_matches_scipy(tmp_path):
    rng = np.random.default_rng(0)
    A = sps.random(
        60, 50, density=0.08, random_state=1, format="coo", dtype=np.float64
    )
    path = _roundtrip(tmp_path, A, "gen.mtx")
    got = stio.load_matrix_market(path).tocsr()
    want = scipy.io.mmread(path).tocsr()
    assert got.shape == want.shape
    d = abs(got - want)
    assert (d.max() if d.nnz else 0.0) < 1e-14


def test_load_matrix_market_symmetric(tmp_path):
    A = sps.random(40, 40, density=0.1, random_state=2, format="coo")
    A = (A + A.T) * 0.5  # mmwrite stores symmetric as lower triangle
    path = _roundtrip(tmp_path, A.tocoo(), "sym.mtx")
    got = stio.load_matrix_market(path).tocsr()
    want = scipy.io.mmread(path).tocsr()
    d = abs(got - want)
    assert (d.max() if d.nnz else 0.0) < 1e-14
    # the on-disk file really used symmetric storage
    with open(path) as fh:
        assert "symmetric" in fh.readline()


def test_native_and_fallback_agree(tmp_path, monkeypatch):
    if not native.available():
        pytest.skip("no native toolchain")
    A = sps.random(30, 30, density=0.15, random_state=3, format="coo")
    path = _roundtrip(tmp_path, A, "both.mtx")
    got_native = stio.load_matrix_market(path).tocsr()
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", True)
    got_scipy = stio.load_matrix_market(path).tocsr()
    d = abs(got_native - got_scipy)
    assert (d.max() if d.nnz else 0.0) < 1e-14


def test_load_operator_kinds(tmp_path):
    A = sps.random(25, 25, density=0.2, random_state=4, format="coo")
    A = A + A.T
    path = _roundtrip(tmp_path, A.tocoo(), "op.mtx")
    x = np.random.default_rng(5).standard_normal(25)
    want = A.tocsr() @ x
    for kind in ("sym", "gen"):
        op = stio.load_operator(path, kind=kind)
        got = np.asarray(op.perform_op(np.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-12)
    with pytest.raises(ValueError):
        stio.load_operator(path, kind="nope")
