"""General (non-symmetric) eigensolver, real and complex matrices.

TPU-native counterpart of the reference's GenEigsSolver
(reference: include/Spectra/GenEigsSolver.h:159-186; complex-matrix
support added in v1.2.0, CHANGELOG.md:5): implicitly restarted Arnoldi
for k eigenvalues of a general matrix available through a matvec.
Eigenvalues (and eigenvectors) are complex; for real matrices they come
in conjugate pairs.

Example
-------
>>> import numpy as np
>>> import spectra_tpu as st
>>> A = np.random.default_rng(0).normal(size=(100, 100))
>>> op = st.DenseGenMatProd.create(A)
>>> eigs = st.GenEigsSolver(op, nev=4, ncv=20)
>>> eigs.init()
>>> nconv = eigs.compute(st.SortRule.LargestMagn)
"""

import numpy as np

from spectra_tpu.solvers.gen_base import GenEigsBase


class GenEigsSolver(GenEigsBase):
    """Implicitly restarted Arnoldi for general eigenvalue problems.

    ``op`` is any operator with ``rows()``, ``cols()``, ``dtype`` and
    ``perform_op(x)`` — real or complex dtype; e.g.
    :class:`~spectra_tpu.matop.dense.DenseGenMatProd` or
    :class:`~spectra_tpu.matop.sparse.SparseGenMatProd`.

    Complex matrices on complex-free accelerators: pass a
    :class:`~spectra_tpu.matop.gen_embed.RealEmbeddedGenMatProd` —
    the solve then runs the REAL IRAM on the 2n embedding
    M = [[Re C, -Im C], [Im C, Re C]] and recovers the complex
    eigenpairs (phantom-filtered, J-orbit-deduped; see
    matop/gen_embed.py). Reference capability:
    GenEigsSolver.h:159-186 (complex scalar, v1.2.0).
    """

    def __init__(self, op, nev: int, ncv: int, bop=None):
        from spectra_tpu.matop.gen_embed import RealEmbeddedGenMatProd

        if isinstance(op, RealEmbeddedGenMatProd) and type(
            self
        ) is GenEigsSolver:
            self.__class__ = EmbeddedGenEigsSolver
            EmbeddedGenEigsSolver.__init__(self, op, nev, ncv)
            return
        GenEigsBase.__init__(self, op, nev, ncv, bop=bop)


class EmbeddedGenEigsSolver(GenEigsSolver):
    """General complex eigenpairs through the real 2n embedding.

    Each C-eigenpair occupies two slots of the embedding's spectrum
    (its value and its conjugate's phantom), so the inner real solve
    asks for ``2 nev`` pairs; ``compute`` then phantom-filters,
    dedupes, and returns up to ``nev`` complex eigenpairs of C ordered
    by ``sorting``.
    """

    def __init__(self, op, nev: int, ncv: int):
        self._embed = op
        self._user_nev = int(nev)
        n2 = op.rows()
        inner_nev = min(2 * nev, n2 - 2)
        inner_ncv = int(min(max(2 * ncv, inner_nev + 3), n2))
        GenEigsBase.__init__(self, op, inner_nev, inner_ncv)
        self._cvals = np.zeros(0, np.complex128)
        self._cvecs = np.zeros((op.n_orig, 0), np.complex128)

    def init(self, resid=None):
        if resid is not None:
            resid = np.asarray(resid)
            if np.iscomplexobj(resid):
                # complex length-n start -> its realification
                resid = np.concatenate([resid.real, resid.imag])
        super().init(resid)

    def compute(
        self,
        selection=None,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting=None,
    ) -> int:
        from spectra_tpu.util.selection import SortRule, argsort_np

        selection = SortRule.LargestMagn if selection is None else selection
        sorting = SortRule.LargestMagn if sorting is None else sorting
        if selection in (SortRule.LargestImag, SortRule.SmallestImag):
            # Imag-part rules degenerate on the conjugate-symmetric
            # embedded spectrum (LI of M = largest |Im| of C). Rotate:
            # run Largest/SmallestREAL on the realification of -iC
            # (a free block swap) and map lambda = i lambda' back.
            from spectra_tpu.matop.gen_embed import (
                RotatedEmbeddedGenMatProd,
            )

            inner_sel = (
                SortRule.LargestReal
                if selection == SortRule.LargestImag
                else SortRule.SmallestReal
            )
            rot = GenEigsBase(
                RotatedEmbeddedGenMatProd(embed=self._embed),
                self._nev,
                self._ncv,
            )
            rot.init(np.asarray(self._v0) if self._v0 is not None else None)
            rot.compute(inner_sel, maxit, tol, inner_sel)
            self._niter = rot.num_iterations()
            self._nops = rot.num_operations()
            self._info = rot.info()
            vals = 1j * np.asarray(rot.eigenvalues())
            vecs = np.asarray(rot.eigenvectors())
        else:
            super().compute(selection, maxit, tol, sorting)
            vals = super().eigenvalues()
            vecs = super().eigenvectors()
        cvals, cvecs = self._embed.map_ritz_pairs(vals, vecs)
        if len(cvals):
            order = np.asarray(argsort_np(sorting, cvals))
            cvals, cvecs = cvals[order], cvecs[:, order]
        self._cvals = cvals[: self._user_nev]
        self._cvecs = cvecs[:, : self._user_nev]
        return len(self._cvals)

    def eigenvalues(self):
        return self._cvals

    def eigenvectors(self, nvec=None):
        nvec = len(self._cvals) if nvec is None else min(
            nvec, self._cvals.shape[0]
        )
        return self._cvecs[:, :nvec]
