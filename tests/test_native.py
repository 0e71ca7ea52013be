"""Native C++ sparse-toolkit tests (with scipy as ground truth)."""

import numpy as np
import pytest
import scipy.sparse as sps

from spectra_tpu import native


def _rand_coo(n, nnz, seed=0, with_dups=True):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    if with_dups:
        rows[: nnz // 10] = rows[nnz // 2 : nnz // 2 + nnz // 10]
        cols[: nnz // 10] = cols[nnz // 2 : nnz // 2 + nnz // 10]
    return rows, cols, vals


def test_native_available():
    assert native.available(), "native library failed to build"


def test_coo_to_csr_dedup():
    n, nnz = 50, 400
    rows, cols, vals = _rand_coo(n, nnz)
    indptr, indices, data = native.coo_to_csr(n, rows, cols, vals)
    ref = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)
    np.testing.assert_allclose(data, ref.data, atol=1e-14)


def test_csr_to_ell_matches_python():
    n = 30
    rng = np.random.RandomState(1)
    A = sps.random(n, n, density=0.2, random_state=rng, format="csr")
    cols, vals = native.csr_to_ell(
        n, A.indptr.astype(np.int64), A.indices.astype(np.int64), A.data
    )
    from spectra_tpu.sparse.formats import _ell_arrays_from_csr

    pc, pv = _ell_arrays_from_csr(A.indptr, A.indices, A.data, n)
    np.testing.assert_array_equal(cols, pc)
    np.testing.assert_allclose(vals, pv)


def test_csr_to_dia_roundtrip():
    g = 12
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
    offsets, data = native.csr_to_dia(
        A.shape[0], A.shape[1], A.indptr.astype(np.int64),
        A.indices.astype(np.int64), A.data,
    )
    assert offsets == (-g, -1, 0, 1, g)
    # reconstruct and compare
    D = np.zeros(A.shape)
    for k, off in enumerate(offsets):
        i = np.arange(A.shape[0])
        j = i + off
        ok = (j >= 0) & (j < A.shape[1])
        D[i[ok], j[ok]] = data[k, ok]
    np.testing.assert_allclose(D, A.toarray())


def test_rowpart_halo():
    g = 16
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
    counts = native.rowpart_halo(
        g * g, A.indptr.astype(np.int64), A.indices.astype(np.int64), 4
    )
    # 2D Laplacian row blocks touch one g-row halo on each side.
    assert counts[0] == g and counts[-1] == g
    assert all(c == 2 * g for c in counts[1:-1])


def test_matrix_market_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    A = sps.random(40, 30, density=0.15, random_state=rng, format="coo")
    path = tmp_path / "m.mtx"
    from scipy.io import mmwrite

    mmwrite(str(path), A)
    B = native.read_matrix_market(str(path))
    np.testing.assert_allclose(B.toarray(), A.toarray(), atol=1e-12)


def test_matrix_market_symmetric(tmp_path):
    rng = np.random.RandomState(8)
    A = sps.random(25, 25, density=0.2, random_state=rng, format="coo")
    S = (A + A.T).tocoo()
    path = tmp_path / "s.mtx"
    from scipy.io import mmwrite

    mmwrite(str(path), S, symmetry="symmetric")
    B = native.read_matrix_market(str(path))
    np.testing.assert_allclose(B.toarray(), S.toarray(), atol=1e-12)


def test_laplacian2d_dia_generator():
    g = 10
    offsets, data = native.laplacian2d_dia(g)
    from spectra_tpu.sparse.formats import DiaMatrix
    import jax.numpy as jnp

    dia = DiaMatrix(
        data=jnp.asarray(data), offsets=offsets, n_rows=g * g, n_cols=g * g
    )
    l1 = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(g, g))
    A = (sps.kron(sps.eye(g), l1) + sps.kron(l1, sps.eye(g))).tocsr()
    np.testing.assert_allclose(np.asarray(dia.to_dense()), A.toarray())
