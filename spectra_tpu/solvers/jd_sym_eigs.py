"""Jacobi-Davidson driver base for symmetric eigenproblems.

TPU-native counterpart of the reference's JDSymEigsBase
(reference: include/Spectra/JDSymEigsBase.h:34-186): the iteration
{restart if the search space exceeds its maximum
(JDSymEigsBase.h:151-156), extend W = A V incrementally (:158),
Rayleigh-Ritz (:160), sort, converge on residual column norms
(RitzPairs.h:73-87), derived-class correction vectors, orthonormal
basis extension} driven from the host with jitted device steps.

Subclasses implement ``setup_initial_search_space(selection)`` and
``calculate_correction_vector()`` — the reference's CRTP seam as plain
virtual methods.
"""

import os

import numpy as np
import jax.numpy as jnp

from spectra_tpu.linalg import ritz_pairs as rp
from spectra_tpu.linalg.search_space import SearchSpace
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.selection import SortRule


class JDSymEigsBase:
    """Base class for Jacobi-Davidson-type symmetric eigensolvers."""

    def __init__(self, op, nev: int, nvec_init: int | None = None, nvec_max: int | None = None):
        n = op.cols()
        if nev < 1 or nev > n - 1:
            raise ValueError("nev must satisfy 1 <= nev <= n - 1, n is the size of matrix")
        self._op = op
        self._nev = int(nev)
        self._max_search_space_size = int(nvec_max) if nvec_max else 10 * nev
        self._initial_search_space_size = int(nvec_init) if nvec_init else 2 * nev
        self._correction_size = int(nev)
        # reference: JDSymEigsBase.h initialize()
        if n < self._max_search_space_size:
            self._max_search_space_size = n
        if n < self._initial_search_space_size + self._correction_size:
            self._initial_search_space_size = n // 3
            self._correction_size = n // 3
        self._info = CompInfo.NotComputed
        self._niter = 0
        self._search_space = SearchSpace()
        self._ritz_pairs = None

    # -- knobs (reference: JDSymEigsBase.h:93-111) ---------------------
    def set_max_search_space_size(self, size: int):
        self._max_search_space_size = int(size)

    def set_correction_size(self, size: int):
        self._correction_size = int(size)

    def set_initial_search_space_size(self, size: int):
        self._initial_search_space_size = int(size)

    # -- accessors -----------------------------------------------------
    def info(self) -> CompInfo:
        return self._info

    def num_iterations(self) -> int:
        return self._niter

    def eigenvalues(self) -> np.ndarray:
        return np.asarray(self._ritz_pairs.values[: self._nev])

    def eigenvectors(self) -> np.ndarray:
        return np.asarray(self._ritz_pairs.vectors[:, : self._nev])

    # -- CRTP seam -----------------------------------------------------
    def setup_initial_search_space(self, selection: SortRule):
        raise NotImplementedError

    def calculate_correction_vector(self):
        raise NotImplementedError

    # Compiled-path seam: subclasses expose the correction as a pure
    # static function + aux operand (the CRTP virtual as data flow).
    _correction_kernel = None  # staticmethod (vals_c, residues_c, aux)

    def _correction_aux(self):
        return None

    # -- compiled whole-iteration path (solvers/_jd_core.py) ------------
    def _use_compiled(self, selection: SortRule) -> bool:
        mode = os.environ.get("SPECTRA_TPU_JD_DRIVER", "auto")
        if mode == "host":
            return False
        if type(self)._correction_kernel is None:
            return False
        if selection == SortRule.BothEnds:
            # the interleave permutation is width-dependent; host loop
            return False
        # Padded buffer must fit: widest schedule point <= n.
        i0, c, M = (
            self._initial_search_space_size,
            self._correction_size,
            self._max_search_space_size,
        )
        if i0 < self._nev or c < 1:
            return False
        top = i0
        while top <= M:
            top += c
        return top <= self._op.rows()

    def _compute_compiled(self, initial_space, selection, maxit, tol) -> int:
        from spectra_tpu.solvers._jd_core import jd_compute

        res = jd_compute(
            self._op,
            jnp.asarray(initial_space),
            self._correction_aux(),
            jnp.asarray(int(maxit), jnp.int32),
            tol,
            max_space=self._max_search_space_size,
            i0=self._initial_search_space_size,
            c=self._correction_size,
            nev=self._nev,
            selection=selection,
            correction_fn=type(self)._correction_kernel,
        )
        status = int(res.status)
        self._niter = int(res.niter)
        self._info = {
            1: CompInfo.Successful,
            2: CompInfo.NotConverging,
            3: CompInfo.NumericalIssue,
        }.get(status, CompInfo.NotComputed)
        self._ritz_pairs = rp.RitzPairs(
            values=jnp.asarray(res.values),
            small_vectors=None,
            vectors=jnp.asarray(res.vectors),
            residues=jnp.asarray(res.residues),
        )
        return int(np.asarray(res.conv).sum())

    # -- main loop (reference: JDSymEigsBase.h:141-185) ----------------
    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 100,
        tol: float = 1e-10,
    ) -> int:
        initial_space = self.setup_initial_search_space(selection)
        return self.compute_with_guess(initial_space, selection, maxit, tol)

    def compute_with_guess(
        self,
        initial_space,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 100,
        tol: float = 1e-10,
    ) -> int:
        if self._use_compiled(selection):
            return self._compute_compiled(initial_space, selection, maxit, tol)
        ss = self._search_space
        ss.initialize_search_space(initial_space)
        self._niter = 0
        conv_flags = np.zeros((self._nev,), bool)
        for it in range(maxit):
            self._niter = it + 1
            if ss.size > self._max_search_space_size:
                ss.restart(self._ritz_pairs, self._initial_search_space_size)

            ss.update_operator_basis_product(self._op)
            pairs = rp.compute_eigen_pairs(ss.V, ss.W)
            if not bool(jnp.all(jnp.isfinite(pairs.values))):
                self._info = CompInfo.NumericalIssue
                break
            pairs = rp.sort(pairs, selection)
            self._ritz_pairs = pairs

            flags, converged = rp.convergence(pairs, tol, self._nev)
            conv_flags = np.asarray(flags)
            if converged:
                self._info = CompInfo.Successful
                break
            if it == maxit - 1:
                self._info = CompInfo.NotConverging
                break
            corrections = self.calculate_correction_vector()
            ss.extend_basis(corrections)
        return int(conv_flags.sum())
