"""Complex Hermitian eigensolver.

TPU-native counterpart of the reference's HermEigsSolver
(reference: include/Spectra/HermEigsSolver.h:122-148): implicitly
restarted Lanczos for complex Hermitian matrices — real eigenvalues,
complex eigenvectors. The Krylov basis V and the matvec run in complex
arithmetic; the projected matrix H is numerically a *real* symmetric
tridiagonal (Hermitian Rayleigh quotients are real), so the whole
replicated small-problem pipeline — tridiagonal QR restarts and Ritz
extraction — is shared unchanged with the real solver
(reference bridges the same way via
LinAlg/UpperHessenbergQR.h:701-708's complex-destination overload).
"""

from spectra_tpu.solvers.base import HermEigsBase


class HermEigsSolver(HermEigsBase):
    """Implicitly restarted Lanczos for complex Hermitian problems.

    ``op`` is any complex-dtype operator with ``rows()``, ``cols()``,
    ``dtype`` and ``perform_op(x)`` — e.g.
    :class:`~spectra_tpu.matop.dense.DenseHermMatProd` or
    :class:`~spectra_tpu.matop.sparse.SparseHermMatProd`.
    """

    _mode = "lanczos"
