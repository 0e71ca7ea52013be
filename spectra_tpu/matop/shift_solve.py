"""Shift-solve operators: ``y = (A - sigma I)^{-1} x``.

TPU-native counterparts of the reference's shift-solve wrappers
(reference: include/Spectra/MatOp/DenseSymShiftSolve.h:33-110,
DenseGenRealShiftSolve.h:29-104, SparseSymShiftSolve.h,
SparseGenRealShiftSolve.h, DenseGenComplexShiftSolve.h:30-118,
SparseGenComplexShiftSolve.h:32-124).

Design notes (SURVEY.md section 7, hard part #1):

* Dense symmetric/Hermitian -> our Bunch-Kaufman LDL^H
  (:mod:`spectra_tpu.linalg.bkldlt`): factorize once at ``set_shift``,
  then each ``perform_op`` is two XLA-blocked triangular solves — the
  per-iteration hot path stays on-device.
* Dense general -> partial-pivot LU (``jax.scipy.linalg.lu_factor``),
  the XLA-native equivalent of Eigen's PartialPivLU.
* Sparse -> two interchangeable backends (``method="auto"`` picks
  SuperLU where the runtime supports host callbacks, the on-device
  iterative solve otherwise):
  - ``method="splu"``: one-time host SuperLU factorization of
    ``A - sigma I`` (scipy), with the per-iteration solve bridged into
    the compiled program via ``jax.pure_callback`` — the replicated
    direct-solve analogue of the reference delegating to Eigen's
    SparseLU. The factorization is serial and host-resident; only the
    right-hand sides cross the host boundary.
  - ``method="cg"`` / ``"bicgstab"``: fully on-device Krylov inner
    solve using the ELL SpMV, for problems too large to factor (the
    RegularInverse mode sets precedent for iterative inverse operators,
    reference: MatOp/SparseRegularInverse.h:105-116).
  - ``method="mg"``: geometric-multigrid inner solve for regular-grid
    stencils (:mod:`spectra_tpu.linalg.multigrid`) — O(1) V-cycles per
    solve vs O(sqrt(kappa)) Krylov iterations; build-time
    trial-validated, with MINRES fallback. The callback-free "auto"
    resolution ("minres") tries this upgrade silently.

Following the reference's API, ops are created unshifted and
``set_shift(sigma)`` performs the factorization; in our functional
style it *returns a new operator* carrying the factors.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spectra_tpu.linalg import bkldlt
from spectra_tpu.matop.dense import _symmetrize, _hermitize
from spectra_tpu.sparse.formats import EllMatrix, symmetrize_scipy
from spectra_tpu.util import dtypes
from spectra_tpu.util.pytree import pytree_dataclass


class ShiftFactorizationError(RuntimeError):
    """Raised when ``A - sigma I`` (or ``A - sigma B``) is singular,
    mirroring the reference's std::invalid_argument on factorization
    failure (SymShiftInvert.h:225-226)."""


@pytree_dataclass
class DenseSymShiftSolve:
    """(A - sigma I)^{-1} x for dense real symmetric A via BKLDLT
    (reference: DenseSymShiftSolve.h:13,51,86)."""

    mat: jnp.ndarray
    factors: object  # BKFactors or None before set_shift

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        return cls(mat=_symmetrize(mat, uplo), factors=None)

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def set_shift(self, sigma):
        fac = jax.jit(bkldlt.factorize)(self.mat, sigma)
        if not bool(fac.ok):
            raise ShiftFactorizationError(
                "factorization failed: sigma is an eigenvalue of the matrix"
            )
        return DenseSymShiftSolve(mat=self.mat, factors=fac)

    def perform_op(self, x):
        return bkldlt.solve(self.factors, x)


@pytree_dataclass
class DenseHermShiftSolve:
    """(A - sigma I)^{-1} x for dense complex Hermitian A (sigma real)."""

    mat: jnp.ndarray
    factors: object

    @classmethod
    def create(cls, mat, uplo: str = "L"):
        return cls(mat=_hermitize(mat, uplo), factors=None)

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def set_shift(self, sigma):
        fac = jax.jit(bkldlt.factorize)(self.mat, sigma)
        if not bool(fac.ok):
            raise ShiftFactorizationError(
                "factorization failed: sigma is an eigenvalue of the matrix"
            )
        return DenseHermShiftSolve(mat=self.mat, factors=fac)

    def perform_op(self, x):
        return bkldlt.solve(self.factors, x)


@pytree_dataclass
class DenseGenRealShiftSolve:
    """(A - sigma I)^{-1} x for dense general real A via partial-pivot
    LU (reference: DenseGenRealShiftSolve.h:47)."""

    mat: jnp.ndarray
    lu: object
    piv: object

    @classmethod
    def create(cls, mat):
        return cls(mat=jnp.asarray(mat), lu=None, piv=None)

    @property
    def dtype(self):
        return self.mat.dtype

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def set_shift(self, sigma):
        n = self.mat.shape[0]
        M = self.mat - jnp.asarray(sigma, self.mat.dtype) * jnp.eye(
            n, dtype=self.mat.dtype
        )
        lu, piv = jax.scipy.linalg.lu_factor(M)
        if not bool(jnp.all(jnp.isfinite(lu))) or bool(
            jnp.any(jnp.diagonal(lu) == 0)
        ):
            raise ShiftFactorizationError(
                "factorization failed: sigma is an eigenvalue of the matrix"
            )
        return DenseGenRealShiftSolve(mat=self.mat, lu=lu, piv=piv)

    def perform_op(self, x):
        return jax.scipy.linalg.lu_solve((self.lu, self.piv), x)


@pytree_dataclass
class DenseGenComplexShiftSolve:
    """Re[(A - (sr + si*i) I)^{-1} x] for dense general *real* A — the
    real-part trick of the complex-shift solver
    (reference: DenseGenComplexShiftSolve.h:50-54,108)."""

    mat: jnp.ndarray
    lu: object
    piv: object

    @classmethod
    def create(cls, mat):
        return cls(mat=jnp.asarray(mat), lu=None, piv=None)

    @property
    def dtype(self):
        return self.mat.dtype  # real dtype: output is Re(solve)

    def rows(self) -> int:
        return self.mat.shape[0]

    def cols(self) -> int:
        return self.mat.shape[1]

    def set_shift(self, sigmar, sigmai):
        from spectra_tpu.util.capabilities import complex_supported

        if not complex_supported():
            raise RuntimeError(
                "the complex-shift solve needs complex arithmetic, which "
                "this accelerator does not support; run under the CPU "
                "backend (jax.config.update('jax_platforms', 'cpu'))"
            )
        n = self.mat.shape[0]
        cdtype = dtypes.complex_dtype(self.mat.dtype)
        sigma = jnp.asarray(complex(sigmar, sigmai), cdtype)
        M = self.mat.astype(cdtype) - sigma * jnp.eye(n, dtype=cdtype)
        lu, piv = jax.scipy.linalg.lu_factor(M)
        if bool(jnp.any(jnp.diagonal(lu) == 0)):
            raise ShiftFactorizationError(
                "factorization failed: sigma is an eigenvalue of the matrix"
            )
        return DenseGenComplexShiftSolve(mat=self.mat, lu=lu, piv=piv)

    def perform_op(self, x):
        cdtype = dtypes.complex_dtype(self.mat.dtype)
        y = jax.scipy.linalg.lu_solve((self.lu, self.piv), x.astype(cdtype))
        return jnp.real(y).astype(self.mat.dtype)


# ---------------------------------------------------------------------------
# Sparse shift-solve: host SuperLU (direct) or on-device Krylov (iterative)
# ---------------------------------------------------------------------------


#: Default inner/outer tolerance coupling: the inner solve targets a
#: relative residual two decades below the outer eigenpair tolerance
#: (the eigen-residual error is bounded by the inner residual times the
#: operator norm, so one decade of headroom plus one of safety), floored
#: at 50 eps of the working dtype (tighter is unreachable in finite
#: precision and just burns iterations). SURVEY.md hard part #1
#: ("documented tolerance coupling"); replaces the fixed 1e-12.
INNER_TOL_FACTOR = 1e-2
INNER_TOL_EPS_FLOOR = 50.0


def coupled_inner_rtol(outer_tol: float, work_dtype) -> float:
    eps = float(jnp.finfo(work_dtype).eps)
    return max(INNER_TOL_EPS_FLOOR * eps, INNER_TOL_FACTOR * float(outer_tol))


def couple_inner_tolerance(obj, outer_tol: float):
    """Recursively rebuild any iterative shift-solve operators inside
    ``obj`` (an operator pytree, e.g. an ArnoldiOp) whose inner
    tolerance is uncoupled, pinning it to ``coupled_inner_rtol``.
    Called by the solver drivers once the outer ``tol`` is known."""
    import dataclasses

    if isinstance(obj, SparseShiftSolveBase):
        if obj.method != "splu" and not obj.inner_rtol_user:
            # Re-derive on EVERY compute(): a stale loose coupling from
            # an earlier compute(tol=coarse) would make a later
            # tight-tol solve converge on a perturbed operator and
            # report Successful with wrong eigenvalues.
            work = obj.shifted.dtype
            return dataclasses.replace(
                obj, inner_rtol=coupled_inner_rtol(outer_tol, work)
            )
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        changes = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            nv = couple_inner_tolerance(v, outer_tol)
            if nv is not v:
                changes[f.name] = nv
        if changes:
            return dataclasses.replace(obj, **changes)
    return obj


def _poison_if_unconverged(mv, y, b, op_norm, accept_bw=1e-10):
    """Replace an iterative solve's result with NaN when its
    **backward error** ``|b - A y| / (|A| |y| + |b|)`` exceeds
    ``accept_bw``. A silently failed inner solve would otherwise
    produce plausible-looking but wrong eigenpairs; NaNs propagate to
    the driver, which reports ``CompInfo.NumericalIssue`` — the
    loud-failure analogue of the reference throwing on CG
    non-convergence (SparseRegularInverse.h:114-115).

    Backward error, not the forward relative residual: for an
    ill-conditioned shifted system the *forward* floor is ~kappa*eps
    relative to |b| (e.g. ~1e-8 for the 1M Laplacian at sigma=0 with
    smooth right-hand sides), while a converged Krylov solve still has
    backward error at the eps level — i.e. it solves ``(A + dA) y = b``
    with ``|dA| ~ eps |A|``, exactly the guarantee a direct
    factorization gives. Measured on the v5e (emulated f64, n=250k,
    kappa~1e5): backward errors 9.5e-15..7.1e-13 where forward
    residuals range 2e-10..8.3e-9. ``op_norm`` is any upper bound on
    |A| (Gershgorin)."""
    bnorm = jnp.linalg.norm(b)
    resid = jnp.linalg.norm(mv(y) - b)
    scale = op_norm * jnp.linalg.norm(y) + jnp.maximum(bnorm, 1e-300)
    return jnp.where(resid <= accept_bw * scale, y, jnp.full_like(y, jnp.nan))


class _HostLUSolver:
    """Hashable host-side wrapper around a scipy SuperLU factor."""

    __slots__ = ("splu", "n", "np_dtype")

    def __init__(self, splu, n, np_dtype):
        self.splu = splu
        self.n = n
        self.np_dtype = np_dtype

    def __call__(self, b):
        b = np.asarray(b)
        if b.ndim == 1:
            return self.splu.solve(b.astype(self.np_dtype, copy=False))
        return self.splu.solve(b.astype(self.np_dtype, copy=False))


@pytree_dataclass(
    meta_fields=(
        "solver",
        "n",
        "method",
        "out_real",
        "precond",
        "cheb_degree",
        "cheb_interval",
        "inner_rtol_user",
    )
)
class SparseShiftSolveBase:
    """Shared machinery for the sparse (A - sigma I)^{-1} operators.

    ``method="splu"``: ``solver`` holds the host factorization and
    ``perform_op`` round-trips the RHS via ``pure_callback``.
    ``method="minres"``/``"cg"``/``"bicgstab"``/``"cheb"``: ``shifted``
    holds the on-device matrix of ``A - sigma I`` and the solve is an
    inner iteration compiled into the outer program (``"cheb"`` = the
    reduction-free Chebyshev semi-iteration for SPD shifted systems,
    interval auto-estimated at build time — linalg/cheb_solve.py),
    the Krylov methods optionally
    preconditioned (``precond="jacobi"``/``"cheb"``, see
    :mod:`spectra_tpu.matop.precond`) with its tolerance coupled to the
    outer solver tolerance (``inner_rtol=None`` until the driver calls
    :func:`couple_inner_tolerance`).
    """

    shifted: object  # EllMatrix of A - sigma*I (or None for splu)
    solver: object
    n: int
    method: str
    out_real: bool
    # DATA leaf (traced scalar once coupled), not static metadata: the
    # inner tolerance changes with every outer tol, and a static field
    # would re-pay the minutes-long emulated-f64 compile of the single
    # op-containing stepped program whenever compute(tol=...) differs
    # from the set_shift trial's default coupling (advisor round-3).
    inner_rtol: object = None  # float once coupled
    precond: str = "none"
    cheb_degree: int = 16
    cheb_interval: object = None  # (alpha, beta) floats, or None = auto
    mg: object = None  # MGState when method == "mg"
    # True when inner_rtol was pinned by the USER (ctor arg or
    # with_inner_rtol): couple_inner_tolerance then leaves it alone.
    # Driver-coupled values are re-derived on every compute() — a
    # second compute() with a tighter tol must tighten the inner solve
    # too, or it would converge tightly on a *perturbed* operator and
    # report Successful with wrong eigenvalues.
    inner_rtol_user: bool = False

    def with_inner_rtol(self, rtol: float):
        import dataclasses

        return dataclasses.replace(
            self, inner_rtol=float(rtol), inner_rtol_user=True
        )

    @property
    def dtype(self):
        if self.method == "splu":
            base = jnp.dtype(self.solver.np_dtype)
        else:
            base = self.shifted.dtype
        if self.out_real:
            return jnp.finfo(base).dtype
        return base

    def rows(self) -> int:
        return self.n

    def cols(self) -> int:
        return self.n

    def perform_op(self, x):
        if self.method == "splu":
            work_dtype = jnp.dtype(self.solver.np_dtype)
            out = jax.ShapeDtypeStruct(x.shape, work_dtype)
            y = jax.pure_callback(self.solver, out, x.astype(work_dtype))
        else:
            mv = self.shifted.matvec
            work_dtype = self.shifted.dtype
            b = x.astype(work_dtype)
            rtol = (
                self.inner_rtol
                if self.inner_rtol is not None
                else coupled_inner_rtol(1e-10, work_dtype)
            )
            maxiter = min(10 * self.n, 20000)
            if self.method == "mg":
                # Geometric multigrid: O(1) V-cycles per digit on
                # grid-stencil operators vs O(sqrt(kappa)) Chebyshev/
                # Krylov iterations — see linalg/multigrid.py. Built and
                # trial-validated at set_shift; a hierarchy that stops
                # contracting at run time stalls out and is NaN-poisoned
                # below. A mesh-sharded hierarchy (parallel/mg_sharded)
                # dispatches to the distributed V-cycle.
                if hasattr(self.mg, "s_ops"):
                    from spectra_tpu.parallel.mg_sharded import (
                        mg_solve_sharded,
                    )

                    y, _ = mg_solve_sharded(self.mg, b, rtol=rtol, maxiter=100)
                else:
                    from spectra_tpu.linalg.multigrid import mg_solve

                    y, _ = mg_solve(self.mg, b, rtol=rtol, maxiter=100)
            elif self.method == "cheb":
                # Reduction-free Chebyshev semi-iteration (SPD shifted
                # systems only; interval estimated at build time). ~25x
                # cheaper per iteration than MINRES on runtimes where
                # every reduction is a sequential-latency hit — see
                # linalg/cheb_solve.py for the measured numbers.
                from spectra_tpu.linalg.cheb_solve import chebyshev_solve

                alpha, beta = self.cheb_interval
                y, _ = chebyshev_solve(
                    mv, b, alpha, beta, rtol=rtol, maxiter=min(20 * self.n, 40000)
                )
            elif self.method == "minres":
                from spectra_tpu.linalg.minres import minres
                from spectra_tpu.matop.precond import (
                    gershgorin_upper,
                    preconditioned_system,
                )

                if self.precond == "cheb" and self.cheb_interval is None:
                    beta = gershgorin_upper(self.shifted)
                    alpha = 1e-4 * beta
                elif self.precond == "cheb":
                    alpha, beta = self.cheb_interval
                else:
                    alpha = beta = None
                mv2, b2, recover = preconditioned_system(
                    mv,
                    b,
                    self.precond,
                    diag=(
                        self.shifted.diagonal()
                        if self.precond == "jacobi"
                        else None
                    ),
                    alpha=alpha,
                    beta=beta,
                    degree=self.cheb_degree,
                )
                if self.precond == "cheb":
                    # each transformed matvec costs cheb_degree SpMVs
                    maxiter = max(maxiter // self.cheb_degree, 50)
                y, _ = minres(mv2, b2, rtol=rtol, maxiter=maxiter)
                y = recover(y)
            else:
                solve = (
                    jax.scipy.sparse.linalg.cg
                    if self.method == "cg"
                    else jax.scipy.sparse.linalg.bicgstab
                )
                y, _ = solve(mv, b, tol=rtol, maxiter=maxiter)
            from spectra_tpu.matop.precond import gershgorin_upper

            y = _poison_if_unconverged(
                mv,
                y,
                b,
                gershgorin_upper(self.shifted),
                accept_bw=jnp.maximum(1e2 * rtol, 1e-10),
            )
        if self.out_real:
            return jnp.real(y).astype(self.dtype)
        return y


def _resolve_sparse_method(method: str, symmetric: bool = True) -> str:
    """``"auto"`` -> host SuperLU when the runtime supports callbacks
    (CPU and standard TPU runtimes), otherwise the fully on-device
    iterative solve: MINRES for symmetric shifted systems (indefinite-
    safe), BiCGStab for general ones."""
    if method != "auto":
        return method
    from spectra_tpu.util.capabilities import host_callbacks_supported

    if host_callbacks_supported():
        return "splu"
    return "minres" if symmetric else "bicgstab"


def _build_sparse_shift(
    csr,
    sigma,
    method,
    out_real=False,
    symmetric=True,
    precond="none",
    inner_rtol=None,
    cheb_degree=16,
    cheb_interval=None,
    grid_dims=None,
):
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    method = _resolve_sparse_method(method, symmetric)
    n = csr.shape[0]
    shifted = (csr - sigma * sps.eye(n, dtype=csr.dtype, format="csr")).tocsr()
    if method == "splu":
        try:
            lu = spla.splu(shifted.tocsc())
        except RuntimeError as err:
            raise ShiftFactorizationError(
                f"sparse factorization failed: {err}"
            ) from err
        solver = _HostLUSolver(lu, n, shifted.dtype)
        return SparseShiftSolveBase(
            shifted=None, solver=solver, n=n, method="splu", out_real=out_real
        )
    return build_shifted_iterative(
        shifted,
        method,
        out_real=out_real,
        precond=precond,
        inner_rtol=inner_rtol,
        cheb_degree=cheb_degree,
        cheb_interval=cheb_interval,
        grid_dims=grid_dims,
    )


def _maybe_build_mg(shifted_csr, device_mat, grid_dims=None, op_fields=None):
    """Build + trial-validate a multigrid hierarchy for ``shifted_csr``.
    Returns a validated ``MGState`` or None (not grid-structured, or
    the trial solve did not contract to a direct-solve-grade backward
    error — e.g. sigma inside the spectrum makes the shifted operator
    indefinite).

    The trial runs through the SAME compiled program the stepped
    solver will execute (``solvers._herm_core.stepped_apply`` on a
    candidate operator with the default-coupled inner tolerance): at
    n ~ 1e6 an op-containing program costs minutes of emulated-f64
    compilation and tens of seconds of per-process executable load, so
    a dedicated trial program would double the fixed cost of every
    process. The backward-error check itself runs on the host CSR —
    zero extra device programs."""
    import numpy as np

    from spectra_tpu.linalg.multigrid import MGBuildError, build_mg
    from spectra_tpu.matop.arnoldi_op import ArnoldiOp
    from spectra_tpu.solvers._herm_core import stepped_apply
    from spectra_tpu.util.rng import SimpleRandom

    n = shifted_csr.shape[0]
    b_host = SimpleRandom(1).random_vec(n, device_mat.dtype)
    b = jnp.asarray(b_host)
    # Gershgorin bound on the host matrix (abs row sums).
    scale0 = float(np.abs(shifted_csr).sum(axis=1).max())
    bnorm = float(np.linalg.norm(b_host))
    fields = dict(op_fields or {})
    fields.setdefault("out_real", False)
    fields["inner_rtol"] = coupled_inner_rtol(1e-10, device_mat.dtype)
    fields["inner_rtol_user"] = False

    def trial_ok(mg):
        cand = SparseShiftSolveBase(
            shifted=device_mat, solver=None, n=n, method="mg", mg=mg,
            **fields,
        )
        # The hierarchy reaches jit as an ARGUMENT inside the operator
        # pytree, never a closure: closed-over device arrays are
        # serialized into the compile request, which remote-compile
        # services reject outright at 100M-nnz scale (observed:
        # HTTP 413 at n = 14.3M, ~1.2 GB of level data).
        y = np.asarray(stepped_apply(ArnoldiOp.create(cand), b))
        if not np.all(np.isfinite(y)):
            return False
        resid = float(np.linalg.norm(shifted_csr @ y - b_host))
        scale = scale0 * float(np.linalg.norm(y)) + bnorm
        return resid <= 1e-11 * scale

    import dataclasses

    def share_level0(mg):
        """The finest MG level is the shifted matrix itself; reuse the
        operator's existing device DIA instead of `build_mg`'s second
        copy (0.8 GB at the 100M-nnz north-star — the margin between
        fitting and OOMing the locked rounds)."""
        lvl0 = mg.ops[0]
        # Cheap signature compare (never touch .data: on DiaHiLoMatrix
        # that property materializes a full f64 combine of the planes).
        if (
            type(lvl0) is type(device_mat)
            and getattr(lvl0, "offsets", None) == getattr(
                device_mat, "offsets", object()
            )
            and getattr(lvl0, "n_rows", None) == getattr(
                device_mat, "n_rows", object()
            )
            and lvl0.dtype == device_mat.dtype
        ):
            return dataclasses.replace(
                mg, ops=(device_mat,) + tuple(mg.ops[1:])
            )
        return mg

    try:
        mg = share_level0(build_mg(shifted_csr, dims=grid_dims))
    except MGBuildError:
        return None
    if trial_ok(mg):
        return mg
    # The boundary-weight heuristic (Dirichlet clip vs Neumann const)
    # can misclassify mixed/odd operators — the flipped variant is one
    # cheap rebuild away, and the trial solve is the arbiter.
    try:
        mg2 = share_level0(
            build_mg(
                shifted_csr,
                dims=grid_dims,
                boundary="const" if mg.boundary == "clip" else "clip",
            )
        )
    except MGBuildError:
        return None
    if trial_ok(mg2):
        return mg2
    return None


def build_shifted_iterative(
    shifted,
    method,
    out_real=False,
    precond="none",
    inner_rtol=None,
    cheb_degree=16,
    cheb_interval=None,
    grid_dims=None,
):
    """On-device iterative ``shifted^{-1}`` operator over a PRE-shifted
    host CSR (``A - sigma I`` or ``A - sigma B``): DIA/ELL format
    routing, tolerance coupling, preconditioning, NaN-poisoning —
    shared by the standard sparse shift-solve wrappers and
    :class:`spectra_tpu.matop.sym_shift_invert.SymShiftInvert`.

    ``method="mg"`` builds a geometric-multigrid hierarchy
    (linalg/multigrid.py) when the shifted matrix is a regular-grid
    stencil (``grid_dims`` pins the grid shape; inferred from the
    sparsity otherwise) and the build-time trial solve contracts to a
    direct-solve-grade backward error; otherwise it falls back to
    MINRES with a warning. ``method="minres"`` (the callback-free
    "auto" resolution for symmetric problems) tries the same multigrid
    upgrade silently first — on grid stencils it is the difference
    between O(1) cycles and O(sqrt(kappa)) iterations per inner solve.
    """
    from spectra_tpu.sparse.formats import (
        dia_device_from_scipy,
        dia_suitability,
        ell_from_scipy,
    )

    n = shifted.shape[0]
    # Banded matrices (stencils): the gather-free DIA matvec is the
    # difference between a practical and an impractical inner solve at
    # n ~ 1e6 (~100 us vs several ms per SpMV on a v5e). HBM-resident
    # f64 stencils further route to the fused double-single Pallas
    # kernel (ops/dia_ds.py, 3.3x at 100M nnz).
    if dia_suitability(shifted):
        device_mat = dia_device_from_scipy(shifted)
    else:
        device_mat = ell_from_scipy(shifted)
    mg_state = None
    if method in ("mg", "minres"):
        mg_state = _maybe_build_mg(
            shifted,
            device_mat,
            grid_dims,
            op_fields=dict(
                out_real=out_real,
                precond=precond,
                cheb_degree=cheb_degree,
                cheb_interval=cheb_interval,
            ),
        )
        if mg_state is not None:
            method = "mg"
        elif method == "mg":
            import warnings

            warnings.warn(
                "method='mg' requested but the shifted matrix is not a "
                "validated grid stencil (not grid-structured, or the "
                "trial V-cycle did not contract — e.g. indefinite "
                "shift); falling back to MINRES.",
                stacklevel=3,
            )
            method = "minres"
    if method == "cheb" and cheb_interval is None:
        from spectra_tpu.linalg.cheb_solve import (
            chebyshev_solve_state,
            estimate_spd_interval,
        )
        from spectra_tpu.util.rng import SimpleRandom

        alpha0, beta0 = estimate_spd_interval(shifted)
        # Pre-learn the adaptive lower bound with one on-device solve:
        # the short-Lanczos alpha overestimates lambda_min badly on
        # clustered-bottom spectra, and without this every inner solve
        # would re-pay the stall-detect discovery phase (~45% of a cold
        # solve at n=1e6).
        _, _, alpha_learned = jax.jit(
            lambda dm, b: chebyshev_solve_state(
                dm.matvec, b, alpha0, beta0, rtol=1e-10,
                maxiter=min(20 * n, 40000),
            )
        )(
            device_mat,
            jnp.asarray(SimpleRandom(1).random_vec(n, device_mat.dtype)),
        )
        cheb_interval = (float(alpha_learned), beta0)
    return SparseShiftSolveBase(
        shifted=device_mat,
        solver=None,
        n=n,
        method=method,
        out_real=out_real,
        inner_rtol=inner_rtol,
        precond=precond,
        cheb_degree=cheb_degree,
        cheb_interval=cheb_interval,
        inner_rtol_user=inner_rtol is not None,
        mg=mg_state,
    )


class SparseSymShiftSolve:
    """(A - sigma I)^{-1} x for sparse real symmetric A
    (reference: SparseSymShiftSolve.h:51,85-102 uses Eigen SparseLU).

    Iterative-path knobs (ignored by the SuperLU path): ``precond``
    ("none"/"jacobi"/"cheb"), ``inner_rtol`` (None = couple to the
    outer tol), ``cheb_degree``, ``cheb_interval``; ``method="mg"`` +
    optional ``grid_dims`` select the geometric-multigrid inner solve
    for grid-stencil matrices (linalg/multigrid.py)."""

    def __init__(
        self,
        csr,
        uplo: str = "L",
        method: str = "auto",
        precond: str = "none",
        inner_rtol=None,
        cheb_degree: int = 16,
        cheb_interval=None,
        grid_dims=None,
    ):
        self._csr = symmetrize_scipy(csr, uplo, conjugate=False)
        self._method = method
        self._iter_opts = dict(
            precond=precond,
            inner_rtol=inner_rtol,
            cheb_degree=cheb_degree,
            cheb_interval=cheb_interval,
            grid_dims=grid_dims,
        )
        # (alpha, beta, sigma) of the last Chebyshev interval learned
        # by set_shift — reused across shifts by exact translation (the
        # spectrum-slicing sigma-sweep optimization; see set_shift).
        self._learned_interval = None

    @property
    def dtype(self):
        return jnp.dtype(self._csr.dtype)

    def rows(self) -> int:
        return self._csr.shape[0]

    def cols(self) -> int:
        return self._csr.shape[1]

    @classmethod
    def create(cls, csr, uplo: str = "L", method: str = "auto", **kwargs):
        return cls(csr, uplo, method, **kwargs)

    def set_shift(self, sigma):
        """Build the ``(A - sigma I)^{-1}`` operator for this shift.

        Sigma sweeps (spectrum slicing) reuse the learned Chebyshev
        interval across shifts: ``eig(A - s' I) = eig(A - s I) -
        (s' - s)`` exactly, so a bound ``[alpha, beta]`` learned for
        one shift translates to ``[alpha - d, beta - d]`` for the
        next — skipping the cold discovery solve that re-learning
        pays at every shift (~45% of a cold solve at n = 1e6). The
        translated bound is reused only while its lower edge keeps a
        margin above zero relative to the interval width
        (``alpha - d > c (beta - d)``, c = 1e-3). This is a heuristic,
        not a certificate: the learned ``alpha`` is a rate-adaptive
        estimate, not a proven lower bound on ``lambda_min``
        (cheb_solve.py interval semantics), so a genuinely indefinite
        translation can still slip through — Chebyshev then diverges
        and is NaN-poisoned, a loud failure the caller's backward-error
        guard surfaces. Near-indefinite translations (margin below c)
        fall back to the auto-learning path. A user-pinned
        ``cheb_interval`` is never overridden."""
        opts = dict(self._iter_opts)
        if opts.get("cheb_interval") is None and self._learned_interval:
            a0, b0, s0 = self._learned_interval
            d = float(np.real(sigma)) - s0
            if a0 - d > 1e-3 * (b0 - d):
                opts["cheb_interval"] = (a0 - d, b0 - d)
        op = _build_sparse_shift(self._csr, sigma, self._method, **opts)
        if (
            self._iter_opts.get("cheb_interval") is None
            and getattr(op, "method", None) == "cheb"
            and op.cheb_interval is not None
        ):
            a, b = op.cheb_interval
            self._learned_interval = (
                float(a), float(b), float(np.real(sigma))
            )
        return op


class SparseGenRealShiftSolve:
    """(A - sigma I)^{-1} x for sparse general real A
    (reference: SparseGenRealShiftSolve.h:49)."""

    def __init__(self, csr, method: str = "auto"):
        self._csr = csr.tocsr()
        self._method = method

    @property
    def dtype(self):
        return jnp.dtype(self._csr.dtype)

    def rows(self) -> int:
        return self._csr.shape[0]

    def cols(self) -> int:
        return self._csr.shape[1]

    @classmethod
    def create(cls, csr, method: str = "auto"):
        return cls(csr, method)

    def set_shift(self, sigma):
        return _build_sparse_shift(
            self._csr, sigma, self._method, symmetric=False
        )


class SparseGenComplexShiftSolve:
    """Re[(A - (sr + si*i) I)^{-1} x] for sparse general real A
    (reference: SparseGenComplexShiftSolve.h:52-56,114)."""

    def __init__(self, csr, method: str = "auto"):
        self._csr = csr.tocsr()
        self._method = method

    @property
    def dtype(self):
        return jnp.dtype(self._csr.dtype)

    def rows(self) -> int:
        return self._csr.shape[0]

    def cols(self) -> int:
        return self._csr.shape[1]

    @classmethod
    def create(cls, csr, method: str = "auto"):
        return cls(csr, method)

    def set_shift(self, sigmar, sigmai):
        from spectra_tpu.util.capabilities import (
            complex_supported,
            host_callbacks_supported,
        )

        if not host_callbacks_supported() and not complex_supported():
            raise RuntimeError(
                "the sparse complex-shift solve needs either host "
                "callbacks (SuperLU path) or device complex arithmetic "
                "(iterative path); this accelerator supports neither — "
                "run under the CPU backend"
            )
        cdtype = np.result_type(self._csr.dtype, np.complex64)
        csr_c = self._csr.astype(cdtype)
        return _build_sparse_shift(
            csr_c,
            complex(sigmar, sigmai),
            self._method,
            out_real=True,
            symmetric=False,
        )
