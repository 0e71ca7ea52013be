"""Rayleigh-Ritz extraction for the Jacobi-Davidson solvers.

TPU-native counterpart of the reference's RitzPairs
(reference: include/Spectra/LinAlg/RitzPairs.h:23-126): from a search
space (V, W = A V) form the small projected matrix ``V^H W``,
eigendecompose it (XLA ``eigh`` — symmetric by construction), and
assemble Ritz values, small-space vectors, full Ritz vectors and
residues ``A V s - V s theta`` (RitzPairs.h:107-126).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.linalg.jacobi import eigh_accurate
from spectra_tpu.util.selection import SortRule, argsort


class RitzPairs(NamedTuple):
    values: jax.Array  # (m,) Ritz values
    small_vectors: jax.Array  # (m, m) eigenvectors of the projected problem
    vectors: jax.Array  # (n, m) Ritz vectors V s
    residues: jax.Array  # (n, m) A V s - V s theta


@jax.jit
def compute_eigen_pairs(V, W) -> RitzPairs:
    """Rayleigh-Ritz on span(V) with W = A V precomputed."""
    H_proj = jnp.conj(V).T @ W
    # Symmetrize: V^H A V is Hermitian up to rounding.
    H_proj = 0.5 * (H_proj + jnp.conj(H_proj).T)
    values, small = eigh_accurate(H_proj)
    vectors = V @ small
    residues = W @ small - vectors * values[None, :]
    return RitzPairs(
        values=values, small_vectors=small, vectors=vectors, residues=residues
    )


def sort(pairs: RitzPairs, selection: SortRule) -> RitzPairs:
    """Order the Ritz pairs wanted-first (RitzPairs.h:55-66)."""
    ind = argsort(selection, pairs.values)
    return RitzPairs(
        values=pairs.values[ind],
        small_vectors=pairs.small_vectors[:, ind],
        vectors=pairs.vectors[:, ind],
        residues=pairs.residues[:, ind],
    )


def convergence(pairs: RitzPairs, tol, nev: int):
    """Per-pair convergence flags by residual column norm
    (reference: RitzPairs.h:73-87)."""
    norms = jnp.linalg.norm(pairs.residues[:, :nev], axis=0)
    flags = norms < tol
    return flags, bool(np.all(np.asarray(flags)))
