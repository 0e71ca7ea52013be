"""Standard real symmetric eigensolver.

TPU-native counterpart of the reference's SymEigsSolver
(reference: include/Spectra/SymEigsSolver.h:134-160): implicitly
restarted Lanczos for k extremal eigenpairs of a real symmetric matrix
available through a matvec.

Example
-------
>>> import numpy as np
>>> import spectra_tpu as st
>>> A = np.random.default_rng(0).normal(size=(1000, 1000))
>>> A = A + A.T
>>> op = st.DenseSymMatProd.create(A)
>>> eigs = st.SymEigsSolver(op, nev=3, ncv=6)
>>> eigs.init()
>>> nconv = eigs.compute(st.SortRule.LargestAlge)
>>> evalues = eigs.eigenvalues()
"""

from spectra_tpu.solvers.base import HermEigsBase


class SymEigsSolver(HermEigsBase):
    """Implicitly restarted Lanczos for real symmetric problems.

    ``op`` is any operator with ``rows()``, ``cols()``, ``dtype`` and
    ``perform_op(x)`` — e.g. :class:`~spectra_tpu.matop.dense.DenseSymMatProd`
    or a sharded sparse operator.
    """

    _mode = "lanczos"
