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

from spectra_tpu.solvers.gen_base import GenEigsBase


class GenEigsSolver(GenEigsBase):
    """Implicitly restarted Arnoldi for general eigenvalue problems.

    ``op`` is any operator with ``rows()``, ``cols()``, ``dtype`` and
    ``perform_op(x)`` — real or complex dtype; e.g.
    :class:`~spectra_tpu.matop.dense.DenseGenMatProd` or
    :class:`~spectra_tpu.matop.sparse.SparseGenMatProd`.
    """
