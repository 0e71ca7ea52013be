"""Real embedding of complex Hermitian operators.

TPU hardware has no complex ALU; this adapter maps a Hermitian problem
onto a real symmetric one twice the size, so the Hermitian solvers run
on complex-free accelerators:

    A = R + iS Hermitian (R symmetric, S antisymmetric)  ->
    E = [[R, -S], [S, R]]  (real symmetric, 2n x 2n)

Each eigenvalue lambda of A appears in E with multiplicity 2; if
``z = x + iy`` is an A-eigenvector, then (x, y) and (-y, x) are the
E-eigenvectors. Lanczos from a single starting vector converges to one
member of each doubled pair, which is exactly what we need: k distinct
eigenvalues of A are recovered from the top-k distinct eigenvalues of
E, and complex eigenvectors are reassembled from the halves.

Multiplicity: a naive real Lanczos on E cannot distinguish a genuine
repeated eigenvalue of A from the structural doubling (both members of
a J-orbit {z, Jz} recover the same complex eigenvector). The solver
therefore runs a *J-structured* Lanczos — ``j_map`` below declares the
realified multiplication by i, and the factorization orthogonalizes
against J V as well as V (see
:class:`spectra_tpu.matop.arnoldi_op.JStructuredArnoldiOp`). Each Ritz
pair is then a distinct complex eigenpair, and genuine multiplicities
emerge through rounding exactly as in complex ARPACK.
"""

import numpy as np
import jax.numpy as jnp

from spectra_tpu.matop.dense import _hermitize
from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass
class RealEmbeddedHermMatProd:
    """Real symmetric 2n x 2n embedding of a Hermitian matrix."""

    R: jnp.ndarray  # (n, n) real part (symmetric)
    S: jnp.ndarray  # (n, n) imag part (antisymmetric)

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        full = np.asarray(_hermitize(jnp.asarray(mat), uplo))
        return cls(
            R=jnp.asarray(np.real(full)), S=jnp.asarray(np.imag(full))
        )

    @property
    def dtype(self):
        return self.R.dtype

    @property
    def n_orig(self) -> int:
        return self.R.shape[0]

    def rows(self) -> int:
        return 2 * self.R.shape[0]

    def cols(self) -> int:
        return 2 * self.R.shape[0]

    def perform_op(self, v):
        """E @ v without materializing E: two halves, four real GEMVs
        (same flops as one complex GEMV)."""
        n = self.R.shape[0]
        x, y = v[:n], v[n:]
        top = self.R @ x - self.S @ y
        bot = self.S @ x + self.R @ y
        return jnp.concatenate([top, bot])

    def diagonal(self):
        d = jnp.diagonal(self.R)
        return jnp.concatenate([d, d])

    def j_map(self, v):
        """The realified multiplication by i: J(x, y) = (-y, x).

        J commutes with E, is orthogonal and antisymmetric. Works on a
        vector (2n,) or a row-major basis block (m, 2n) — the embedded
        axis is always the LAST one. Declaring this method makes
        :class:`~spectra_tpu.matop.arnoldi_op.ArnoldiOp.create`
        return a J-structured op whose Lanczos factorization
        orthogonalizes against J V as well as V (see module docstring).
        """
        n = self.R.shape[0]
        return jnp.concatenate([-v[..., n:], v[..., :n]], axis=-1)

    def recover_eigenvectors(self, embedded_vecs):
        """Complex A-eigenvectors from E-eigenvectors: z = x + i y."""
        n = self.R.shape[0]
        x = np.asarray(embedded_vecs[:n, :])
        y = np.asarray(embedded_vecs[n:, :])
        z = x + 1j * y
        norms = np.linalg.norm(z, axis=0)
        return z / np.where(norms > 0, norms, 1.0)
