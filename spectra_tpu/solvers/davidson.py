"""Davidson (diagonal-preconditioned Jacobi-Davidson) eigensolver.

TPU-native counterpart of the reference's DavidsonSymEigsSolver
(reference: include/Spectra/DavidsonSymEigsSolver.h:31-89): the
Derived-Pair-Residue (DPR) correction ``-(D - rho I)^{-1} r``
(DavidsonSymEigsSolver.h:77-88) over an initial search space of unit
vectors at the extreme diagonal entries (:60-72). Effective for
diagonally dominant matrices.
"""

import jax.numpy as jnp
import numpy as np

from spectra_tpu.solvers.jd_sym_eigs import JDSymEigsBase
from spectra_tpu.util.selection import SortRule, argsort


class DavidsonSymEigsSolver(JDSymEigsBase):
    """Davidson solver with DPR correction.

    ``op`` must additionally expose ``diagonal()`` (all the built-in
    MatProd operators do) — the counterpart of the reference caching
    ``op(i, i)`` element access (DavidsonSymEigsSolver.h:45-49).
    """

    def __init__(self, op, nev: int, nvec_init: int | None = None, nvec_max: int | None = None):
        super().__init__(op, nev, nvec_init, nvec_max)
        self._diagonal = jnp.asarray(op.diagonal())

    def setup_initial_search_space(self, selection: SortRule):
        """Unit vectors at the ``nvec_init`` extreme diagonal entries
        (reference: DavidsonSymEigsSolver.h:60-72)."""
        ind = np.asarray(argsort(selection, self._diagonal))
        size = self._initial_search_space_size
        n = int(self._op.rows())
        basis = np.zeros((n, size), dtype=np.asarray(self._diagonal).dtype)
        for k in range(size):
            basis[ind[k], k] = 1.0
        return jnp.asarray(basis)

    def calculate_correction_vector(self):
        """DPR correction ``r_k / (rho_k - D)`` for the leading
        ``correction_size`` Ritz pairs
        (reference: DavidsonSymEigsSolver.h:77-88)."""
        pairs = self._ritz_pairs
        k = self._correction_size
        residues = pairs.residues[:, :k]
        rho = pairs.values[:k]
        denom = rho[None, :] - self._diagonal[:, None]
        return residues / denom

    # Compiled-path form of the same DPR correction (aux = diag(A)).
    @staticmethod
    def _correction_kernel(vals_c, residues_c, aux):
        return residues_c / (vals_c[None, :] - aux[:, None])

    def _correction_aux(self):
        return self._diagonal
