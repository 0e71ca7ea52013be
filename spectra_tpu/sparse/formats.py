"""TPU-native sparse matrix formats.

The reference wraps Eigen's compressed-column/row sparse types
(reference: include/Spectra/MatOp/SparseSymMatProd.h:31-108 and
friends); CSR's variable-length rows force dynamic shapes, which XLA
cannot tile. Here the device-resident format is **ELLPACK**: every row
padded to a fixed width ``L = max nnz/row`` with (column 0, value 0)
entries, so the SpMV

    y[i] = sum_l vals[i, l] * x[cols[i, l]]

is a statically-shaped gather plus a row reduction — one fused XLA op
chain. Padding entries multiply by 0 and contribute nothing.

Host-side conversion from scipy.sparse / dense numpy runs once at
operator construction; the device arrays (``cols``, ``vals``) are
row-partitionable: under a 1-D "rows" mesh they shard along axis 0
while ``x`` is gathered (XLA inserts the all-gather over ICI).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("n_rows", "n_cols"))
class EllMatrix:
    """Fixed-width (ELLPACK) sparse matrix.

    Attributes:
      cols: (n_rows, L) int32 column indices, padded with 0.
      vals: (n_rows, L) values, padded with 0.
      n_rows, n_cols: static logical shape.
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    n_rows: int
    n_cols: int

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def row_width(self) -> int:
        return self.cols.shape[1]

    @property
    def nnz(self) -> int:
        """Stored entries incl. explicit zeros (static metadata only
        when constructed via the host converters)."""
        return int(self.cols.shape[0] * self.cols.shape[1])

    def matvec(self, x):
        """y = A x (1-D x) — the statically-shaped ELL SpMV."""
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def matmat(self, X):
        """Y = A X for a block of vectors (columns of X)."""
        return jnp.einsum("rl,rlk->rk", self.vals, X[self.cols, :])

    def rmatvec(self, x):
        """y = A^H x via scatter-add (used for rectangular operators)."""
        contrib = jnp.conj(self.vals) * x[:, None]
        y = jnp.zeros((self.n_cols,), self.vals.dtype)
        return y.at[self.cols].add(contrib)

    def element(self, i, j):
        """A[i, j] (0 if not stored). Padded entries have value 0."""
        row_cols = self.cols[i]
        row_vals = self.vals[i]
        return jnp.sum(jnp.where(row_cols == j, row_vals, 0))

    def diagonal(self):
        i = jnp.arange(self.n_rows)[:, None]
        return jnp.sum(jnp.where(self.cols == i, self.vals, 0), axis=1)

    def to_dense(self):
        A = jnp.zeros((self.n_rows, self.n_cols), self.vals.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(self.n_rows)[:, None], self.cols.shape
        )
        return A.at[rows, self.cols].add(self.vals)


def _ell_arrays_from_csr(indptr, indices, data, n_rows, pad_width=None):
    """Vectorized host-side CSR -> padded ELL conversion."""
    nnz_per_row = np.diff(indptr)
    L = int(nnz_per_row.max()) if n_rows and nnz_per_row.size else 1
    if pad_width is not None:
        L = max(L, int(pad_width))
    L = max(L, 1)
    cols = np.zeros((n_rows, L), dtype=np.int32)
    vals = np.zeros((n_rows, L), dtype=data.dtype)
    # Position of each nnz within its row:
    offs = np.arange(len(indices)) - np.repeat(indptr[:-1], nnz_per_row)
    rows = np.repeat(np.arange(n_rows), nnz_per_row)
    cols[rows, offs] = indices
    vals[rows, offs] = data
    return cols, vals


def ell_from_scipy(sp_mat, dtype=None, pad_width=None) -> EllMatrix:
    """Build an :class:`EllMatrix` from any scipy.sparse matrix."""
    csr = sp_mat.tocsr()
    csr.sum_duplicates()
    n_rows, n_cols = csr.shape
    data = csr.data if dtype is None else csr.data.astype(dtype)
    cols, vals = _ell_arrays_from_csr(
        csr.indptr, csr.indices, data, n_rows, pad_width
    )
    return EllMatrix(
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        n_rows=n_rows,
        n_cols=n_cols,
    )


def ell_from_dense(mat, pad_width=None) -> EllMatrix:
    """Build an :class:`EllMatrix` from a dense array's nonzeros."""
    mat = np.asarray(mat)
    n_rows, n_cols = mat.shape
    mask = mat != 0
    nnz_per_row = mask.sum(axis=1)
    indptr = np.concatenate([[0], np.cumsum(nnz_per_row)])
    rows, cols_idx = np.nonzero(mask)
    data = mat[rows, cols_idx]
    cols, vals = _ell_arrays_from_csr(
        indptr, cols_idx.astype(np.int32), data, n_rows, pad_width
    )
    return EllMatrix(
        cols=jnp.asarray(cols),
        vals=jnp.asarray(vals),
        n_rows=n_rows,
        n_cols=n_cols,
    )


@pytree_dataclass(meta_fields=("offsets", "n_rows", "n_cols"))
class DiaMatrix:
    """Diagonal (DIA) sparse storage — the speed-of-light format for
    banded/stencil matrices (e.g. grid Laplacians).

    ``data[k, i] = A[i, i + offsets[k]]`` (row-aligned), so the SpMV is

        y[i] = sum_k data[k, i] * x[i + offsets[k]]

    — d shifted fused multiply-adds with **no gathers**: XLA compiles
    this to a single bandwidth-bound VPU sweep, and it row-partitions
    with only nearest-neighbor halo traffic (|offset| elements per
    boundary), unlike gather-based formats.

    Out-of-range positions of each diagonal hold zeros.
    """

    data: jnp.ndarray  # (d, n_rows)
    offsets: tuple  # static ints, strictly increasing
    n_rows: int
    n_cols: int

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0] * self.data.shape[1])

    def matvec(self, x):
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        xp = jnp.pad(x, (lo, hi))
        y = jnp.zeros((self.n_rows,), jnp.result_type(self.data.dtype, x.dtype))
        for k, off in enumerate(self.offsets):
            y = y + self.data[k] * jax.lax.dynamic_slice(
                xp, (lo + off,), (self.n_rows,)
            )
        return y

    def matmat(self, X):
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        Xp = jnp.pad(X, ((lo, hi), (0, 0)))
        Y = jnp.zeros(
            (self.n_rows, X.shape[1]),
            jnp.result_type(self.data.dtype, X.dtype),
        )
        for k, off in enumerate(self.offsets):
            Y = Y + self.data[k][:, None] * jax.lax.dynamic_slice(
                Xp, (lo + off, 0), (self.n_rows, X.shape[1])
            )
        return Y

    def rmatvec(self, x):
        """y = A^H x: the transposed stencil, still gather-free —
        diagonal ``off`` of A is diagonal ``-off`` of A^H with
        row-aligned values ``conj(data[k, i - off])``."""
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        out_len = self.n_cols
        y = jnp.zeros((out_len,), self.data.dtype)
        tail = lo + max(0, out_len - self.n_rows)
        for k, off in enumerate(self.offsets):
            # contribution to y[j]: conj(A[j-off, j]) x[j-off]
            w = jnp.pad(jnp.conj(self.data[k]) * x, (hi, tail))
            y = y + jax.lax.dynamic_slice(w, (hi - off,), (out_len,))
        return y

    def element(self, i, j):
        out = jnp.zeros((), self.data.dtype)
        for k, off in enumerate(self.offsets):
            out = jnp.where(j - i == off, self.data[k, i], out)
        return out

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros((self.n_rows,), self.data.dtype)

    def to_dense(self):
        A = jnp.zeros((self.n_rows, self.n_cols), self.data.dtype)
        i = jnp.arange(self.n_rows)
        for k, off in enumerate(self.offsets):
            j = i + off
            ok = (j >= 0) & (j < self.n_cols)
            A = A.at[i, jnp.clip(j, 0, self.n_cols - 1)].add(
                jnp.where(ok, self.data[k], 0.0)
            )
        return A


@pytree_dataclass(meta_fields=("offsets", "n_rows", "n_cols", "chunk"))
class DiaHiLoMatrix:
    """DIA matrix stored as native f32 hi/lo planes — the HBM-resident
    f64 SpMV format for TPU (no-native-f64) chips.

    ``data_hi + data_lo`` is a two-term decomposition of the f64
    diagonals (hi = f32(a), lo = f32(a - hi); residual <= 2^-48
    relative — a backward perturbation of A far under any solver
    tolerance), padded to a
    multiple of ``chunk`` so the Pallas kernel
    (:func:`spectra_tpu.ops.dia_ds.dia_spmv_ds_padded`) pays no
    per-call pad sweep. ``matvec`` runs the fused double-single kernel
    on TPU (one HBM pass over all diagonals, ~2^-48 relative accuracy;
    3.3x the XLA f64 lowering at the 100M-nnz scale) and falls back to
    the exact f64 :class:`DiaMatrix` path elsewhere.

    Reference hot op: include/Spectra/MatOp/SparseSymMatProd.h:83-89.
    """

    data_hi: jnp.ndarray  # (d, n_pad) f32
    data_lo: jnp.ndarray  # (d, n_pad) f32
    offsets: tuple
    n_rows: int
    n_cols: int
    chunk: int

    @property
    def dtype(self):
        return jnp.dtype(jnp.float64)

    @property
    def nnz(self) -> int:
        return int(self.data_hi.shape[0] * self.n_rows)

    @classmethod
    def from_dia(cls, dia: "DiaMatrix", chunk: int | None = None):
        from spectra_tpu.ops.dia_ds import pick_hilo_chunk, split_f64

        if chunk is None:
            chunk = pick_hilo_chunk(dia.offsets, dia.data.shape[0])
            if chunk is None:
                raise ValueError(
                    "DIA shape does not fit the hi/lo kernel VMEM "
                    "budget (see ops.dia_ds.pick_hilo_chunk)"
                )
        chunk = int(chunk)
        n_pad = (dia.n_rows + chunk - 1) // chunk * chunk
        data = jnp.asarray(dia.data, jnp.float64)
        hi, lo = split_f64(jnp.pad(data, ((0, 0), (0, n_pad - dia.n_rows))))
        return cls(
            data_hi=hi,
            data_lo=lo,
            offsets=dia.offsets,
            n_rows=dia.n_rows,
            n_cols=dia.n_cols,
            chunk=chunk,
        )

    def to_dia(self) -> "DiaMatrix":
        """Exact f64 DiaMatrix (the planes' sum) — the fallback and
        compatibility path for non-matvec access."""
        from spectra_tpu.ops.dia_ds import combine_f64

        return DiaMatrix(
            data=combine_f64(self.data_hi, self.data_lo)[:, : self.n_rows],
            offsets=self.offsets,
            n_rows=self.n_rows,
            n_cols=self.n_cols,
        )

    @property
    def data(self):  # compatibility: logical f64 diagonals
        return self.to_dia().data

    def matvec(self, x):
        import jax as _jax

        from spectra_tpu.ops.dia_ds import (
            combine_f64,
            dia_spmv_ds_padded,
            split_f64,
        )

        if _jax.default_backend() != "tpu" or x.dtype != jnp.float64:
            return self.to_dia().matvec(x)
        xh, xl = split_f64(x)
        yh, yl = dia_spmv_ds_padded(
            self.data_hi,
            self.data_lo,
            xh,
            xl,
            offsets=self.offsets,
            n=self.n_rows,
            chunk=self.chunk,
        )
        return combine_f64(yh, yl)

    def matmat(self, X):
        import jax as _jax

        if _jax.default_backend() != "tpu" or X.dtype != jnp.float64:
            return self.to_dia().matmat(X)
        # column-at-a-time through the kernel (lax.map: one compiled
        # instance, k sequential calls) — the to_dia fallback would
        # materialize a full f64 copy of the planes per call.
        Y = _jax.lax.map(self.matvec, X.T)
        return Y.T

    def rmatvec(self, x):
        return self.to_dia().rmatvec(x)

    def element(self, i, j):
        return self.to_dia().element(i, j)

    def diagonal(self):
        return self.to_dia().diagonal()

    def to_dense(self):
        return self.to_dia().to_dense()


#: working-set bytes above which the f64 XLA DIA path stops being
#: VMEM-resident in-loop and the hi/lo Pallas kernel wins (measured:
#: 1M-row 5-diag 2-D stencil [56 MB] stays VMEM-resident at 52 Gnnz/s;
#: 14.35M-row 7-diag [1 GB] runs 6 Gnnz/s XLA vs 19.6 hi/lo).
HILO_BYTES_THRESHOLD = 120 * 1024 * 1024


def maybe_hilo(dia, threshold: int | None = None):
    """Route a DiaMatrix to hi/lo-plane storage when the TPU backend
    is active and the SpMV working set exceeds VMEM residency."""
    if not isinstance(dia, DiaMatrix):
        return dia
    if dia.dtype != jnp.float64 or dia.n_rows != dia.n_cols:
        return dia
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return dia
    from spectra_tpu.ops.dia_ds import pick_hilo_chunk

    d = dia.data.shape[0]
    work = (d + 2) * 8 * dia.n_rows
    if work < (HILO_BYTES_THRESHOLD if threshold is None else threshold):
        return dia
    chunk = pick_hilo_chunk(dia.offsets, d)
    if chunk is None:
        return dia
    return DiaHiLoMatrix.from_dia(dia, chunk=chunk)


def _dia_host_arrays(sp_mat, dtype=None):
    """Row-aligned host DIA arrays ``(offsets, rows)`` from scipy
    sparse — through the threaded native converter when available
    (scipy's .todia() alone cost ~59 s at 100M nnz), scipy otherwise."""
    csr = sp_mat.tocsr()
    n_rows, n_cols = csr.shape
    if csr.dtype == np.float64 and dtype in (None, np.float64):
        from spectra_tpu import native as _native

        if _native.available():
            offsets, rows = _native.csr_to_dia(
                n_rows, n_cols, csr.indptr, csr.indices, csr.data
            )
            return offsets, rows, n_rows, n_cols
    dia = csr.todia()
    offsets = tuple(int(o) for o in dia.offsets)
    data = dia.data if dtype is None else dia.data.astype(dtype)
    # scipy aligns data[k] by column index; shift to row alignment:
    # row_data[k, i] = A[i, i+off] = scipy_data[k, i+off].
    rows = np.zeros((len(offsets), n_rows), dtype=data.dtype)
    width = data.shape[1]  # scipy may store fewer than n_cols columns
    for k, off in enumerate(offsets):
        lo = max(0, -off)
        hi = min(n_rows, n_cols - off, width - off)
        if hi > lo:
            rows[k, lo:hi] = data[k, lo + off : hi + off]
    order = np.argsort(offsets)
    return (
        tuple(offsets[i] for i in order),
        rows[order],
        n_rows,
        n_cols,
    )


def dia_from_scipy(sp_mat, dtype=None) -> DiaMatrix:
    """Build a row-aligned :class:`DiaMatrix` from scipy sparse."""
    offsets, rows, n_rows, n_cols = _dia_host_arrays(sp_mat, dtype)
    return DiaMatrix(
        data=jnp.asarray(rows),
        offsets=offsets,
        n_rows=n_rows,
        n_cols=n_cols,
    )


def dia_device_from_scipy(sp_mat, dtype=None):
    """DIA device storage from scipy sparse with hi/lo routing decided
    BEFORE any device transfer: HBM-resident f64 stencils on TPU ship
    as two f32 planes split on the host (skipping the 0.8 GB-scale
    device f64 intermediate + emulated-f64 split that
    ``maybe_hilo(dia_from_scipy(...))`` would pay)."""
    offsets, rows, n_rows, n_cols = _dia_host_arrays(sp_mat, dtype)
    d = rows.shape[0]
    route = (
        rows.dtype == np.float64
        and n_rows == n_cols  # the kernel is square-operator only
        and (d + 2) * 8 * n_rows >= HILO_BYTES_THRESHOLD
    )
    if route:
        import jax as _jax

        route = _jax.default_backend() == "tpu"
    if route:
        from spectra_tpu.ops.dia_ds import pick_hilo_chunk

        chunk = pick_hilo_chunk(offsets, d)
        if chunk is not None:
            n_pad = (n_rows + chunk - 1) // chunk * chunk
            padded = np.zeros((d, n_pad), np.float64)
            padded[:, :n_rows] = rows
            hi = padded.astype(np.float32)
            lo = (padded - hi.astype(np.float64)).astype(np.float32)
            return DiaHiLoMatrix(
                data_hi=jnp.asarray(hi),
                data_lo=jnp.asarray(lo),
                offsets=offsets,
                n_rows=n_rows,
                n_cols=n_cols,
                chunk=chunk,
            )
    return DiaMatrix(
        data=jnp.asarray(rows),
        offsets=offsets,
        n_rows=n_rows,
        n_cols=n_cols,
    )


def dia_suitability(sp_mat, max_diags: int = 32) -> bool:
    """True when the matrix is banded enough that DIA beats ELL: few
    distinct diagonals and low fill overhead."""
    csr = sp_mat.tocsr()
    coo = csr.tocoo()
    if coo.nnz == 0:
        return False
    diags = np.unique(coo.col - coo.row)
    if len(diags) > max_diags:
        return False
    stored = len(diags) * csr.shape[0]
    return stored <= 4 * coo.nnz


def symmetrize_scipy(sp_mat, uplo: str = "L", conjugate: bool = False):
    """Full symmetric/Hermitian matrix from one triangle of a scipy
    sparse matrix — the input convention of the reference's
    ``selfadjointView`` wrappers (SparseSymMatProd.h:83-89)."""
    import scipy.sparse as sps

    csr = sp_mat.tocsr()
    if uplo == "L":
        tri = sps.tril(csr, 0, format="csr")
        off = sps.tril(csr, -1, format="csr")
    elif uplo == "U":
        tri = sps.triu(csr, 0, format="csr")
        off = sps.triu(csr, 1, format="csr")
    else:
        raise ValueError("uplo must be 'L' or 'U'")
    other = off.conjugate().T if conjugate else off.T
    return (tri + other).tocsr()
