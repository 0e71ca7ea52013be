"""Search-space manager for the Jacobi-Davidson solvers.

TPU-native counterpart of the reference's SearchSpace
(reference: include/Spectra/LinAlg/SearchSpace.h:20-92): maintains the
orthonormal basis V and the operator-basis product W = A V, applying
the operator **only to newly added columns**
(SearchSpace.h:57-63), restarting to the leading Ritz vectors
(SearchSpace.h:70-74), and extending the basis with twice-is-enough
orthogonalized correction vectors (SearchSpace.h:80-85).

Host-driven: the basis width changes between iterations, so each width
compiles once and is cached — the device-side work (block matvec,
projections, QR) is jitted per shape, mirroring how the reference
drives Eigen from a host loop.
"""

import jax.numpy as jnp

from spectra_tpu.linalg.orthogonalization import twice_is_enough
from spectra_tpu.linalg import ritz_pairs as rp


class SearchSpace:
    """Mutable (host-side) holder of the JD basis V and product W."""

    def __init__(self):
        self.V = None  # (n, m) orthonormal basis
        self.W = None  # (n, m_op) operator applied to the first m_op cols

    @property
    def size(self) -> int:
        return 0 if self.V is None else self.V.shape[1]

    def initialize_search_space(self, initial_space):
        self.V = jnp.asarray(initial_space)
        self.W = None

    def update_operator_basis_product(self, op):
        """W <- [W, A V_new]: only new columns hit the operator."""
        n_done = 0 if self.W is None else self.W.shape[1]
        if n_done == self.size:
            return
        new = op.perform_op(self.V[:, n_done:])
        self.W = new if self.W is None else jnp.concatenate([self.W, new], axis=1)

    def restart(self, pairs: rp.RitzPairs, new_size: int):
        """Collapse to the leading ``new_size`` Ritz vectors."""
        self.V = pairs.vectors[:, :new_size]
        self.W = self.W @ pairs.small_vectors[:, :new_size]

    def extend_basis(self, corrections):
        """Append orthogonalized correction vectors."""
        n_locked = self.size
        appended = jnp.concatenate([self.V, jnp.asarray(corrections)], axis=1)
        self.V = twice_is_enough(appended, n_locked)
