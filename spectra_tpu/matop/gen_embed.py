"""Real embedding of general complex operators.

TPU hardware has no complex ALU; :mod:`spectra_tpu.matop.herm_embed`
covers the Hermitian case, and this module covers **general complex
matrices** (the reference's v1.2.0 complex `GenEigsSolver`,
reference: include/Spectra/GenEigsSolver.h:159-186), so the
non-symmetric complex solver runs on complex-free accelerators:

    C = A + iB  ->  M = [[A, -B], [B, A]]   (real, 2n x 2n)

Spectral structure (M is the realification of the complex-linear map C):

* spec(M) = spec(C) u conj(spec(C)).
* For an M-eigenpair ``(lam, w)`` with ``w = [p; q]`` (complex halves),
  ``z = p + iq`` satisfies ``C z = lam z`` — unless ``lam`` belongs
  only to the conjugate copy, in which case ``z ~ 0`` (a *phantom*).
  Writing J = [[0, -I], [I, 0]] (the realified multiplication by i,
  commuting with M), the map ``w -> p + iq`` is exactly the projection
  onto J's +i eigenbundle, where M acts as C; the -i bundle carries
  conj(C) and maps to zero.
* Each C-eigenpair therefore occupies TWO slots of M's spectrum (its
  own value and its conjugate's phantom), so k eigenpairs of C are
  recovered from a 2k-pair real solve, followed by phantom filtering
  and J-orbit dedup (Jw = iw maps to the same complex direction).

The solver-side driver is
:class:`spectra_tpu.solvers.gen_eigs.GenEigsSolver`, which routes here
automatically when handed a :class:`RealEmbeddedGenMatProd`.
"""

import numpy as np

import jax.numpy as jnp

from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("n_orig", "_sparse"))
class RealEmbeddedGenMatProd:
    """Real 2n x 2n embedding of a general complex matrix.

    ``inner`` holds the real operator (a
    :class:`~spectra_tpu.matop.dense.DenseGenMatProd` over block GEMVs
    for dense input, or a
    :class:`~spectra_tpu.matop.sparse.SparseGenMatProd` over the
    assembled real 2n sparse matrix for sparse input).
    """

    inner: object
    n_orig: int
    _sparse: bool = False

    @classmethod
    def create(cls, mat):
        from spectra_tpu.matop.sparse import SparseGenMatProd

        if hasattr(mat, "tocsr"):  # scipy sparse (complex)
            import scipy.sparse as sps

            csr = mat.tocsr()
            n = csr.shape[0]
            Ar = csr.real.tocsr()
            Ai = csr.imag.tocsr() if np.iscomplexobj(csr.data) else (
                sps.csr_matrix((n, n))
            )
            M = sps.bmat([[Ar, -Ai], [Ai, Ar]], format="csr")
            return cls(
                inner=SparseGenMatProd.create(M), n_orig=n, _sparse=True
            )
        full = np.asarray(mat)
        n = full.shape[0]
        return cls(
            inner=_DenseEmbeddedBlocks(
                R=jnp.asarray(np.real(full).astype(np.float64)),
                S=jnp.asarray(np.imag(full).astype(np.float64)),
            ),
            n_orig=n,
            _sparse=False,
        )

    @property
    def dtype(self):
        return self.inner.dtype  # real: the solver runs real IRAM

    def rows(self) -> int:
        return 2 * self.n_orig

    def cols(self) -> int:
        return 2 * self.n_orig

    def perform_op(self, v):
        return self.inner.perform_op(v)

    # -- complex recovery --------------------------------------------

    def map_ritz_pairs(
        self, vals, vecs, phantom_rtol=1e-4, dedupe_overlap=0.99
    ):
        """Map embedded Ritz pairs to C-eigenpairs.

        Args:
          vals: (m,) complex Ritz values of M.
          vecs: (2n, m) complex Ritz vectors of M (unit columns).

        Returns (cvals, cvecs): the surviving C-eigenpairs after
        phantom filtering (``||p + iq|| <= phantom_rtol * sqrt(2)``)
        and duplicate removal (same value + same complex direction).
        """
        n = self.n_orig
        vals = np.asarray(vals)
        vecs = np.asarray(vecs)
        z = vecs[:n, :] + 1j * vecs[n:, :]
        norms = np.linalg.norm(z, axis=0)
        keep = norms > phantom_rtol * np.sqrt(2.0)
        vals, z = vals[keep], z[:, keep] / norms[keep][None, :]
        out = []
        scale = max(1.0, float(np.abs(vals).max()) if len(vals) else 1.0)
        for i in range(len(vals)):
            dup = False
            for j, (vj, zj) in enumerate(out):
                if abs(vals[i] - vj) <= 1e-7 * scale and (
                    abs(np.vdot(zj, z[:, i])) >= dedupe_overlap
                ):
                    dup = True
                    break
            if not dup:
                out.append((vals[i], z[:, i]))
        if not out:
            return np.zeros(0, np.complex128), np.zeros(
                (n, 0), np.complex128
            )
        cvals = np.array([v for v, _ in out])
        cvecs = np.stack([zz for _, zz in out], axis=1)
        return cvals, cvecs


@pytree_dataclass
class RotatedEmbeddedGenMatProd:
    """The realification of ``C' = -i C`` over an existing embedding:
    ``M' = (-J) M`` with J = [[0, -I], [I, 0]] — one concat swap per
    matvec, no new matrix. Since C' shares C's eigenvectors with
    ``lambda' = -i lambda``, selecting Largest/SmallestREAL on C'
    equals Largest/SmallestIMAG on C — the rotation that makes the
    imaginary-part selection rules well-posed on the conjugate-
    symmetric embedded spectrum (on M itself, LI degenerates to
    largest |Im|)."""

    embed: RealEmbeddedGenMatProd

    @property
    def dtype(self):
        return self.embed.dtype

    @property
    def n_orig(self) -> int:
        return self.embed.n_orig

    def rows(self) -> int:
        return self.embed.rows()

    def cols(self) -> int:
        return self.embed.cols()

    def perform_op(self, v):
        w = self.embed.perform_op(v)
        n = self.embed.n_orig
        # -J w = (w_bottom, -w_top)
        return jnp.concatenate([w[..., n:], -w[..., :n]], axis=-1)


@pytree_dataclass
class _DenseEmbeddedBlocks:
    """M @ v via four real GEMVs without materializing the 2n matrix
    (same flops as one complex GEMV)."""

    R: jnp.ndarray  # (n, n) real part
    S: jnp.ndarray  # (n, n) imag part

    @property
    def dtype(self):
        return self.R.dtype

    def rows(self) -> int:
        return 2 * self.R.shape[0]

    def cols(self) -> int:
        return 2 * self.R.shape[0]

    def perform_op(self, v):
        n = self.R.shape[0]
        x, y = v[..., :n], v[..., n:]
        top = x @ self.R.T - y @ self.S.T
        bot = x @ self.S.T + y @ self.R.T
        return jnp.concatenate([top, bot], axis=-1)
