"""Chebyshev polynomial spectral filtering.

Accelerator-friendly answer to clustered extremal spectra (the regime
where plain Lanczos — ours and ARPACK's alike — stalls; see
BASELINE.md's feasibility note on the 2D-Laplacian top): iterate on

    p(A) = T_d( (2A - (hi+lo) I) / (hi - lo) )

where ``[lo, hi]`` covers the *unwanted* part of the spectrum. Inside
the interval |T_d| <= 1; outside it grows like cosh(d*acosh(.)) —
exponentially separating the wanted eigenvalues. Eigenvectors are
unchanged, so the true eigenvalues are recovered afterwards as
Rayleigh quotients with the original operator.

One ``perform_op`` costs ``degree`` matvecs of the underlying operator
— pure three-term recurrences over the sharded vectors, an ideal
TPU/bandwidth profile (this is the ChASE / filtered-Lanczos recipe).
"""

import jax
import jax.numpy as jnp

from spectra_tpu.util.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("degree",))
class ChebyshevFilteredOp:
    """``x -> T_degree(L(A)) x`` with L affine mapping [lo, hi] -> [-1, 1]."""

    op: object
    lo: jnp.ndarray
    hi: jnp.ndarray
    degree: int

    @classmethod
    def create(cls, op, lo: float, hi: float, degree: int):
        if degree < 1:
            raise ValueError("degree must be >= 1")
        if not hi > lo:
            raise ValueError("need hi > lo")
        rdtype = jnp.finfo(op.dtype).dtype
        return cls(
            op=op,
            lo=jnp.asarray(lo, rdtype),
            hi=jnp.asarray(hi, rdtype),
            degree=int(degree),
        )

    @property
    def dtype(self):
        return self.op.dtype

    def rows(self) -> int:
        return self.op.rows()

    def cols(self) -> int:
        return self.op.cols()

    def _scaled_matvec(self, x):
        c = 0.5 * (self.hi + self.lo)
        h = 0.5 * (self.hi - self.lo)
        return (self.op.perform_op(x) - c * x) / h

    def perform_op(self, x):
        # T_0 = x, T_1 = L(A) x, T_{k+1} = 2 L(A) T_k - T_{k-1}
        t_prev = x
        t_cur = self._scaled_matvec(x)

        def body(_, carry):
            t_prev, t_cur = carry
            t_next = 2.0 * self._scaled_matvec(t_cur) - t_prev
            return (t_cur, t_next)

        t_prev, t_cur = jax.lax.fori_loop(1, self.degree, body, (t_prev, t_cur))
        return t_cur

    def rayleigh_quotients(self, vecs):
        """True eigenvalues of the ORIGINAL operator for (approximately
        invariant) columns of ``vecs``: lambda_i = v_i^H A v_i / v_i^H v_i."""
        vecs = jnp.asarray(vecs)
        Av = self.op.perform_op(vecs)
        num = jnp.sum(jnp.conj(vecs) * Av, axis=0)
        den = jnp.sum(jnp.conj(vecs) * vecs, axis=0)
        return jnp.real(num / den)


def estimate_spectrum_bounds(op, steps: int = 30, safety: float = 0.05):
    """Cheap Lanczos-based bounds on the spectrum of a symmetric op.

    Runs ``steps`` Lanczos iterations from the deterministic starting
    vector and returns ``(lo, hi)`` — the extreme Ritz values pushed
    outward by ``safety * span`` plus the residual norm (a standard
    guaranteed-enclosure correction).
    """
    import numpy as np

    from spectra_tpu.linalg import krylov
    from spectra_tpu.matop.arnoldi_op import ArnoldiOp
    from spectra_tpu.util.rng import SimpleRandom

    n = op.rows()
    m = min(steps, n)
    arnop = ArnoldiOp.create(op)
    v0 = jnp.asarray(SimpleRandom(0).random_vec(n, op.dtype))
    state = krylov.init(arnop, v0, m, jax.random.PRNGKey(0))
    state = krylov.factorize_from(arnop, state, 1, "lanczos")
    H = np.real(np.asarray(state.H))
    theta, Y = np.linalg.eigh(0.5 * (H + H.T))
    beta = float(state.beta)
    # Per-Ritz-value enclosure: |theta_i - lambda| <= |Y[m-1, i]| * beta
    # (the Kaniel-Paige residual bound) — much tighter than +-||f||.
    err_lo = abs(Y[-1, 0]) * beta
    err_hi = abs(Y[-1, -1]) * beta
    span = float(theta[-1] - theta[0]) or 1.0
    lo = float(theta[0]) - err_lo - safety * span
    hi = float(theta[-1]) + err_hi + safety * span
    return lo, hi
