"""Driver base class for symmetric / Hermitian IRLM solvers.

The thin stateful shell around the functional jitted core — it owns
validation, the deterministic starting vector, result extraction and
the Spectra-compatible accessor API
(reference: include/Spectra/HermEigsBase.h:44-479).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectra_tpu.matop.arnoldi_op import ArnoldiOp
from spectra_tpu.solvers._herm_core import (
    irlm_compute,
    irlm_finalize,
    irlm_restarts,
    irlm_start,
)
from spectra_tpu.util import dtypes
from spectra_tpu.util.compinfo import CompInfo
from spectra_tpu.util.rng import SimpleRandom
from spectra_tpu.util.selection import SortRule


#: Leaves above this byte size stay on the device after compute(): at
#: the 100M-nnz scale the final basis is ~4.6 GB and fetching it
#: through a tunneled runtime costs minutes for data most callers
#: never touch (eigenvalues and the ncv-sized Ritz vectors are enough;
#: eigenvectors()/compute_locked() compute with the device copy).
_FETCH_LIMIT_BYTES = 1 << 28


from spectra_tpu.ops.gemv import basis_apply_block as _basis_apply_block

#: Jitted (m, n) x (m, k) -> (k, n) contraction for result-sized
#: blocks: fused multiply+reduce, peak = input + output.
_contract_block = jax.jit(_basis_apply_block)


import functools as _functools


@_functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(dest, block, src, dst):
    """``dest[dst] = block[src]``; ``dest`` donated (scatter aliases
    in place)."""
    return dest.at[dst].set(block[src])


def fetch_result_leaf(x):
    """Bring a result leaf to host numpy. Under multi-process execution
    replicated leaves (eigenvalues, counters) are fetched from the local
    shard; row-sharded leaves (eigenvector blocks) stay as global jax
    Arrays — every process sees the same accessor values either way.
    Very large leaves (the n-sized basis at extreme scale) also stay on
    device; accessors handle both representations."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        return x
    if (
        isinstance(x, jax.Array)
        and x.size * x.dtype.itemsize > _FETCH_LIMIT_BYTES
    ):
        return x
    return np.asarray(x)


class HermEigsBase:
    """Base for all symmetric/Hermitian IRLM solver drivers.

    Subclasses may set ``_ritz_transform`` (a static function
    ``(nu, aux) -> lambda``) and ``_transform_aux`` for eigenvalue
    back-transforms, mirroring the reference's ``sort_ritzpair``
    override seam.
    """

    _mode = "lanczos"
    _ritz_transform = None

    def __init__(self, op, nev: int, ncv: int, bop=None):
        self._op = op
        self._has_bop = bop is not None
        self._arnop = ArnoldiOp.create(op, bop)
        n = op.rows()
        if op.cols() != n:
            raise ValueError("matrix must be square")
        # reference: HermEigsBase.h:267-271
        if nev < 1 or nev > n - 1:
            raise ValueError("nev must satisfy 1 <= nev <= n - 1, n is the size of matrix")
        if ncv <= nev or ncv > n:
            raise ValueError("ncv must satisfy nev < ncv <= n, n is the size of matrix")
        self._n = n
        self._nev = int(nev)
        self._ncv = int(ncv)
        self._dtype = jnp.dtype(op.dtype)
        self._info = CompInfo.NotComputed
        self._niter = 0
        self._nops = 0
        self._v0 = None
        self._result = None
        self._restart_chunk = None
        self._restart_method = "implicit"
        self._reorth = "full"
        self._matvec_granularity = False
        self._carry = None
        self._resume_carry = None

    def set_restart_method(self, method: str):
        """``"implicit"`` (default): ARPACK-style shifted-QR restarts,
        rule-for-rule the reference's behavior. ``"thick"``: thick
        restart (TRLan/Krylov-Schur) — one replicated eigh + one MXU
        matmul per restart instead of O(ncv) sequential Givens sweeps;
        same convergence class, better accelerator latency profile."""
        if method not in ("implicit", "thick"):
            raise ValueError("restart method must be 'implicit' or 'thick'")
        self._restart_method = method

    def set_reorth(self, method: str):
        """``"full"`` (default): always-on DGKS re-orthogonalization —
        rule-for-rule the reference's Lanczos (Lanczos.h:62-187), two
        (n, ncv) projections per step. ``"selective"``: Simon's
        omega-recurrence partial re-orthogonalization — an O(ncv)
        recurrence predicts the orthogonality loss each step and the
        projections are paid only when it crosses sqrt(eps), preserving
        semiorthogonality (Ritz values still accurate to machine
        precision). Cuts the per-step cost to the matvec + two
        n-vector reductions on the vast majority of steps; use when
        the projections dominate (large n, cheap operator — e.g. the
        host-factored 1M-node shift-invert). Honored by both the
        compiled and the matvec-granularity stepped drivers; ignored
        (full reorth) by structured operators and under thick restarts
        (the arrowhead H defeats the omega recurrence — see
        ``_eff_mode``)."""
        if method not in ("full", "selective"):
            raise ValueError("reorth method must be 'full' or 'selective'")
        self._reorth = method

    def set_precision(self, mode: str):
        """``"double"`` (default): everything in the operator dtype.
        ``"mixed"``: run the whole restarted Lanczos in native f32 (the
        ~12x SpMV path on TPU) and refine the converged subspace ONCE
        with an f64 Rayleigh-Ritz against the original operator —
        accepts ``tol >= 1e-6`` (the f32 residual floor), delivers
        1e-9-grade eigenvalues on gapped spectra, and reports
        re-measured f64 residuals via :meth:`mixed_report`. See
        solvers/mixed.py for the error model. Plain symmetric MatProd
        drivers only (no shift/generalized modes)."""
        if mode not in ("double", "mixed"):
            raise ValueError("precision must be 'double' or 'mixed'")
        if mode == "mixed" and (
            self._has_bop or type(self)._ritz_transform is not None
        ):
            raise ValueError(
                "mixed precision applies to the plain symmetric solver "
                "(shift/generalized modes couple inner tolerances in f64)"
            )
        self._precision = mode

    def mixed_report(self) -> dict:
        """After a mixed-precision compute: the re-measured f64
        residual norms per returned eigenpair."""
        vals, _, resid = getattr(
            self, "_mixed", (np.zeros(0), None, np.zeros(0))
        )
        return {"values": vals, "resid_f64": resid}

    def _eff_mode(self) -> str:
        if (
            self._mode == "lanczos"
            and self._reorth == "selective"
            and self._restart_method != "thick"
            # Deflated (locked) rounds run full reorth on every
            # driver: the omega recurrence does not model the
            # deflation projections, so drift toward span(locked)
            # would be invisible to it.
            and getattr(self._arnop, "locked", None) is None
        ):
            # Thick restarts leave H an ARROWHEAD (locked-Ritz couplings
            # in row/col k), but the omega recurrence reads only
            # diag(H)/diag(H,-1) — it would never see orthogonality loss
            # against the locked vectors and silently skip needed
            # re-orthogonalizations (observed: eigenvalues off by 1e6x
            # reported Successful). Fall back to full reorth.
            return "lanczos_selective"
        return self._mode

    def save_checkpoint(self, path: str):
        """Serialize the current iteration state (V, H, f, k + Ritz
        bookkeeping) to ``path`` (npz). Available when running with
        ``set_restart_chunk`` — the state snapshots between segments.
        The reference has no checkpointing; this is the cheap insurance
        SURVEY.md section 5 recommends for preemptible accelerators."""
        if self._carry is None:
            raise RuntimeError(
                "no iteration state to checkpoint: run compute() with "
                "set_restart_chunk() first"
            )
        leaves = jax.tree_util.tree_leaves(self._carry)
        np.savez(
            path, *[np.asarray(leaf) for leaf in leaves], nev=self._nev, ncv=self._ncv
        )

    def load_checkpoint(self, path: str):
        """Restore iteration state saved by :meth:`save_checkpoint`;
        the next ``compute()`` call (with ``set_restart_chunk``)
        continues from it instead of starting over."""
        if self._carry is None and self._v0 is None:
            self.init()
        with np.load(path) as data:
            if int(data["nev"]) != self._nev or int(data["ncv"]) != self._ncv:
                raise ValueError("checkpoint nev/ncv mismatch")
            names = sorted(
                (k for k in data.files if k.startswith("arr_")),
                key=lambda s: int(s[4:]),
            )
            arrays = [data[k] for k in names]
        # Rebuild the carry pytree structure from a template.
        from spectra_tpu.solvers import _herm_core

        template = _herm_core.irlm_start(
            self._arnop,
            self._v0 if self._v0 is not None else jnp.zeros((self._n,), self._dtype),
            jax.random.PRNGKey(0),
            jnp.asarray(1e-10, jnp.finfo(self._dtype).dtype),
            nev=self._nev,
            ncv=self._ncv,
            selection=SortRule.LargestMagn,
            mode=self._eff_mode(),
        )
        treedef = jax.tree_util.tree_structure(template)
        self._resume_carry = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(a) for a in arrays]
        )

    def set_restart_chunk(self, chunk: int | None):
        """Segment the restart loop into device executions of at most
        ``chunk`` restarts each. Results are bitwise identical to the
        single-shot run; use for very large problems to keep individual
        accelerator executions short (watchdogs, preemption) and to
        allow checkpointing between segments."""
        self._restart_chunk = None if chunk is None else int(chunk)

    def set_matvec_granularity(self, on: bool = True):
        """Bound each device execution to at most ONE operator
        application. Restart-level chunking (:meth:`set_restart_chunk`)
        still packs up to ncv operator applications into one execution;
        when ``perform_op`` is itself a long compiled iteration (the
        on-device MINRES shift-solve at n >= 1e6 runs thousands of
        SpMVs per application) that is a minutes-long execution — long
        enough to trip remote-runtime watchdogs. Matvec granularity
        replays the identical iteration with host control flow: one
        step (one inner solve) per execution, with the replicated
        restart algebra as separate millisecond programs. Costs one
        dispatch round-trip per step; use only when a single operator
        application is itself seconds long."""
        self._matvec_granularity = bool(on)

    # -- initialization ------------------------------------------------
    def init(self, init_resid=None):
        """Set the initial residual vector (default: the deterministic
        Uniform(-0.5, 0.5) stream with seed 0, bit-identical to the
        reference's SimpleRandom)."""
        if init_resid is None:
            init_resid = SimpleRandom(0).random_vec(self._n, self._dtype)
        if isinstance(init_resid, jax.Array):
            # Keep device placement/sharding of an already-placed vector.
            v0 = init_resid.astype(self._dtype)
            if v0.shape != (self._n,):
                raise ValueError(f"initial residual must have shape ({self._n},)")
            if float(jnp.linalg.norm(v0)) < np.finfo(np.float64).tiny * 10:
                raise ValueError("initial residual vector cannot be zero")
            self._v0 = v0
            self._v0_host = None
        else:
            v0 = np.asarray(init_resid, dtype=self._dtype)
            if v0.shape != (self._n,):
                raise ValueError(f"initial residual must have shape ({self._n},)")
            if np.linalg.norm(v0) < np.finfo(np.float64).tiny * 10:
                raise ValueError("initial residual vector cannot be zero")
            self._v0 = jnp.asarray(v0)
            # Host copy kept for the native dense driver: avoids a
            # device->host round trip per compute() on remote platforms.
            self._v0_host = v0
        self._info = CompInfo.NotComputed
        self._niter = 0
        self._nops = 0
        self._result = None
        self._mixed = None

    # -- computation -----------------------------------------------------
    def compute(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestAlge,
    ) -> int:
        """Run the solver; returns the number of converged eigenvalues."""
        if self._v0 is None:
            self.init()
        self._mixed = None
        if getattr(self, "_precision", "double") == "mixed":
            from spectra_tpu.solvers.mixed import compute_mixed

            return compute_mixed(self, selection, maxit, tol, sorting)
        from spectra_tpu.matop.shift_solve import couple_inner_tolerance

        self._arnop = couple_inner_tolerance(self._arnop, tol)
        if type(self)._mode == "lanczos":
            from spectra_tpu.solvers import _native_dense

            if _native_dense.eligible(self, sym=True):
                res = _native_dense.compute(
                    self, True, selection, maxit, tol, sorting
                )
                if res is not None:
                    return self._finish_result(res)
        tol_arr = jnp.asarray(tol, jnp.finfo(self._dtype).dtype)
        if self._matvec_granularity:
            res = self._compute_stepped(selection, maxit, tol_arr, sorting)
        elif self._restart_chunk is None:
            res = irlm_compute(
                self._arnop,
                self._v0,
                jax.random.PRNGKey(0),
                jnp.asarray(maxit, jnp.int32),
                tol_arr,
                self._transform_aux(),
                nev=self._nev,
                ncv=self._ncv,
                selection=selection,
                sorting=sorting,
                mode=self._eff_mode(),
                transform=type(self)._ritz_transform,
                restart_method=self._restart_method,
            )
        else:
            fixed = dict(
                nev=self._nev,
                ncv=self._ncv,
                selection=selection,
                mode=self._eff_mode(),
                restart_method=self._restart_method,
            )
            if self._resume_carry is not None:
                carry = self._resume_carry
                self._resume_carry = None
            else:
                carry = irlm_start(
                    self._arnop, self._v0, jax.random.PRNGKey(0), tol_arr, **fixed
                )
            budget = 0
            self._history = []
            while budget < maxit:
                budget = min(budget + self._restart_chunk, maxit)
                carry = irlm_restarts(
                    self._arnop,
                    carry,
                    tol_arr,
                    jnp.asarray(budget, jnp.int32),
                    **fixed,
                )
                nconv, restarts, beta = jax.device_get(
                    (carry.nconv, carry.restarts, carry.state.beta)
                )
                self._history.append(
                    {
                        "restarts": int(restarts),
                        "nconv": int(nconv),
                        "f_norm": float(beta),
                    }
                )
                if int(nconv) >= self._nev or int(restarts) < budget:
                    break
                if not np.isfinite(beta):
                    # A poisoned inner solve (NaN, see shift_solve.
                    # _poison_if_unconverged) contaminates every later
                    # restart identically — fail loud now instead of
                    # burning the remaining budget.
                    break
            self._carry = carry
            res = irlm_finalize(
                carry,
                self._transform_aux(),
                nev=self._nev,
                sorting=sorting,
                transform=type(self)._ritz_transform,
            )
        return self._finish_result(res)

    def _compute_stepped(self, selection, maxit, tol_arr, sorting):
        """Host-driven twin of the compiled restart loop: identical
        primitive sequence, at most one operator application per device
        execution (see :meth:`set_matvec_granularity`). All stepped
        entry points compile once each (step index and restart point are
        traced)."""
        from spectra_tpu.solvers import _herm_core as core

        mode = type(self)._mode
        # Selective reorth in the stepped driver: the omega recurrence
        # is O(ncv) algebra inside the op-free finish program, and the
        # host loop threads the carry. Exactly the regime this mode was
        # built for (n >= 1e6 where the two (ncv, n) DGKS projections
        # rival the operator cost) runs stepped, so honor it here.
        selective = (
            self._eff_mode() == "lanczos_selective"
            and not self._arnop.has_structure
            # Deflated (locked) rounds run full reorth: the omega
            # recurrence does not model the deflation projections.
            and getattr(self._arnop, "locked", None) is None
        )
        fixed = dict(
            nev=self._nev,
            ncv=self._ncv,
            selection=selection,
            restart_method=self._restart_method,
        )
        import os
        import sys
        import time as _time

        step_log = bool(os.environ.get("SPECTRA_TPU_STEP_LOG"))
        t_last = _time.perf_counter()

        def sync(state):
            # JAX dispatch is async: without a true host sync every
            # step of the host loop would enqueue immediately, and the
            # remote worker would see one continuous minutes-deep queue
            # — exactly the condition matvec granularity exists to
            # avoid. A scalar fetch is the only reliable sync on
            # tunneled PJRT runtimes (block_until_ready can acknowledge
            # enqueue only); ~25 ms per step, negligible against a
            # seconds-long inner solve.
            if step_log:
                nonlocal t_last
                beta_nops = jax.device_get((state.beta, state.nops))
                now = _time.perf_counter()
                print(
                    f"[stepped] op {int(beta_nops[1])} "
                    f"+{now - t_last:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
                t_last = now
            else:
                jax.device_get(state.beta)
            return state

        def run_columns(state, from_k):
            """Factorize columns [from_k, ncv) with the active reorth
            policy (full DGKS, or omega-gated selective)."""
            omega = (
                core.stepped_omega_seed(state, from_k) if selective else None
            )
            for i in range(int(from_k), self._ncv):
                idx = jnp.asarray(i, jnp.int32)
                if selective:
                    state, omega = core.stepped_step_split_selective(
                        self._arnop, state, idx, omega
                    )
                else:
                    state = core.stepped_step_split(
                        self._arnop, state, idx, mode=mode
                    )
                state = sync(state)
            return state

        if self._resume_carry is not None:
            # Honor load_checkpoint(): continue from the saved carry
            # instead of refactorizing from v0 (the large-n regime this
            # mode serves is exactly where checkpointing matters).
            carry = self._resume_carry
            self._resume_carry = None
        else:
            state = sync(
                core.stepped_init_split(
                    self._arnop, self._v0, jax.random.PRNGKey(0), m=self._ncv
                )
            )
            state = run_columns(state, 1)
            carry = core.stepped_extract(
                state, tol_arr, jnp.asarray(0, jnp.int32), **fixed
            )
        self._history = []
        restarts = int(jax.device_get(carry.restarts))
        while True:
            nconv, beta = jax.device_get((carry.nconv, carry.state.beta))
            self._history.append(
                {
                    "restarts": restarts,
                    "nconv": int(nconv),
                    "f_norm": float(beta),
                }
            )
            if int(nconv) >= self._nev or restarts >= maxit:
                break
            if not np.isfinite(beta):
                # NaN-poisoned inner solve: fail loud, don't burn budget.
                break
            state, k_resume = core.stepped_restart_compress(
                self._arnop, carry.state, carry.ritz_val, carry.ritz_est,
                carry.nconv, **fixed,
            )
            state = run_columns(state, int(jax.device_get(k_resume)))
            restarts += 1
            carry = core.stepped_extract(
                state, tol_arr, jnp.asarray(restarts, jnp.int32), **fixed
            )
        self._carry = carry
        # Finalize on the SMALL fields only and attach V/f by reference
        # afterwards: irlm_finalize is a separate jit on this path, and
        # an un-donated passthrough of V comes back as a device COPY —
        # a second basis-sized buffer (4.6 GB at the 100M-nnz scale)
        # held for the life of the result.
        small_state = carry.state._replace(
            V=jnp.zeros((0, 0), carry.state.V.dtype),
            f=jnp.zeros((0,), carry.state.f.dtype),
        )
        res = core.irlm_finalize(
            carry._replace(state=small_state),
            self._transform_aux(),
            nev=self._nev,
            sorting=sorting,
            transform=type(self)._ritz_transform,
        )
        return res._replace(V=carry.state.V, f=carry.state.f)

    # -- locking / deflated continuation ---------------------------------
    def _internal_ritz_block(self):
        """Converged internal Ritz vectors of the last compute() as a
        (q, n) row-major, B-orthonormal block (in the Lanczos metric —
        BEFORE any _vector_transform back-solve)."""
        res = self._result
        small = np.asarray(res.vectors_small)[:, np.asarray(res.conv)]
        # Device-side contraction: V may be a (large) device-resident
        # array — never round-trip it through the host. Routed through
        # the VPU sweep (the emulated-f64 MXU dot materializes an
        # f32[8, ncv, n] slice tensor — 18.4 GB at the 100M-nnz scale)
        # and jitted: run eagerly, each row's broadcast-multiply
        # materializes a full (ncv, n) temp before the reduce — another
        # 4.6 GB that OOM'd the same config at runtime.
        return _contract_block(
            jnp.asarray(res.V), jnp.asarray(small).astype(res.V.dtype)
        )

    def compute_locked(
        self,
        selection: SortRule = SortRule.LargestMagn,
        maxit: int = 1000,
        tol: float = 1e-10,
        sorting: SortRule = SortRule.LargestAlge,
        want: SortRule | None = None,
        max_rounds: int = 6,
        ncv_locked: int | None = None,
    ) -> int:
        """The nev most-wanted eigenpairs counted WITH multiplicity.

        A single restarted Krylov sequence resolves at most one
        direction per eigenplane in exact arithmetic; further copies of
        a degenerate eigenvalue emerge only through rounding noise, and
        restart compression routinely truncates them — ARPACK, Spectra
        and this solver's plain ``compute`` all share the limitation
        (reference regression test test/Example1.cpp, issue #144).
        This driver certifies the wanted set: it locks each round's
        converged Ritz vectors (:class:`~spectra_tpu.matop.arnoldi_op.
        LockedArnoldiOp` deflation) and re-runs the identical solver
        from a fresh deterministic random vector in the B-orthogonal
        complement, where the remaining copies are simple eigenvalues.
        Rounds stop when a deflated run finds nothing more wanted than
        the current nev-th value — then the complement provably holds
        no missing member of the wanted set (up to the solver
        tolerance) — or after ``max_rounds``.

        ``want`` ranks FINAL (back-transformed) eigenvalues; default
        ``sorting``. E.g. k-smallest via shift-invert: selection
        LargestMagn (of nu), want/sorting SmallestAlge (of lambda).
        ``certified()`` reports whether the frontier test passed.

        ``ncv_locked`` (optional) runs the deflated continuation
        rounds with a smaller Krylov space than round 0: at extreme
        scale each completed round adds a (nev, n) locked block to the
        HBM residency, and shrinking the continuation basis is what
        keeps rounds 2+ (two+ blocks resident) on a single chip.
        Must exceed nev.
        """
        want = sorting if want is None else want
        if want == SortRule.BothEnds:
            # The frontier certification compares scalar sort keys; the
            # interleaved both-ends order has no single boundary key.
            raise ValueError(
                "compute_locked does not support want=BothEnds; run "
                "two certifications (LargestAlge and SmallestAlge)"
            )
        if ncv_locked is not None and ncv_locked <= self._nev:
            raise ValueError("ncv_locked must exceed nev")
        base_arnop = self._arnop
        base_ncv = self._ncv
        base_v0 = self._v0
        vals: np.ndarray | None = None
        # Per-round locked blocks, kept SEPARATE (see LockedArnoldiOp:
        # a device concatenate at the 100M-nnz scale peaks at ~3x the
        # combined block size and OOM'd the certification).
        blocks: list = []
        niter = nops = 0
        self._locking_certified = False

        from spectra_tpu.matop.arnoldi_op import LockedArnoldiOp
        from spectra_tpu.util.selection import sort_key_np

        import os as _os
        import sys as _sys

        def _memlog(tag):
            if not _os.environ.get("SPECTRA_TPU_STEP_LOG"):
                return
            try:
                ms = jax.devices()[0].memory_stats() or {}
                print(
                    f"[compute_locked] {tag}: "
                    f"in_use={ms.get('bytes_in_use', 0) / 2**30:.2f}G "
                    f"peak={ms.get('peak_bytes_in_use', 0) / 2**30:.2f}G "
                    f"limit={ms.get('bytes_limit', 0) / 2**30:.2f}G",
                    file=_sys.stderr,
                    flush=True,
                )
            except Exception:
                pass

        try:
            for rnd in range(max_rounds):
                _memlog(f"round {rnd} start")
                try:
                    if rnd == 0:
                        self._locking_round = False
                    else:
                        self._locking_round = True
                        if ncv_locked is not None:
                            self._ncv = int(ncv_locked)
                        self._arnop = LockedArnoldiOp(
                            inner=base_arnop, locked=tuple(blocks)
                        )
                        self.init(
                            SimpleRandom(77000 + rnd).random_vec(
                                self._n, self._dtype
                            )
                        )
                    self.compute(selection, maxit, tol, sorting)
                except Exception as err:
                    if rnd == 0:
                        raise
                    # A deflated continuation round died (e.g. HBM
                    # exhaustion once the locked block joined the
                    # residency at extreme scale): keep the pairs
                    # gathered so far and report certified() False.
                    import sys

                    print(
                        f"[compute_locked] round {rnd} failed "
                        f"(uncertified): {err!r:.300}",
                        file=sys.stderr,
                    )
                    self._carry = None
                    self._resume_carry = None
                    break
                niter += self._niter
                nops += self._nops
                new_vals = np.asarray(self.eigenvalues())
                blk = (
                    self._internal_ritz_block() if len(new_vals) else None
                )
                # Free this round's iteration state (the (ncv, n) basis
                # is 4.6 GB at the 100M-nnz scale) before the locked
                # block bookkeeping and the next round's fresh basis:
                # every field of the placeholder is overwritten by the
                # final _replace below.
                self._carry = None
                self._result = self._result._replace(V=None, f=None)
                if self._n >= 1 << 22:
                    # Drop compiled executables between rounds: on the
                    # tunneled runtime each round's locked-op program
                    # set retains device workspace; at the 100M-nnz
                    # scale the accumulated arenas exhausted HBM before
                    # round 2's first upload. Recompiling the next
                    # round's (op-free) programs costs seconds.
                    import gc as _gc

                    jax.clear_caches()
                    _gc.collect()
                _memlog(f"round {rnd} after drop")
                if rnd == 0:
                    vals = new_vals
                    if len(vals) == 0:
                        break
                    blocks.append(blk)
                    continue
                if len(new_vals) == 0:
                    break
                # Frontier certification: nothing in the deflated
                # complement is more wanted than our nev-th value
                # (ties at the boundary are equally-valid copies).
                key_old = np.sort(sort_key_np(want, vals))
                boundary = (
                    key_old[self._nev - 1]
                    if len(vals) >= self._nev
                    else np.inf
                )
                key_new = sort_key_np(want, new_vals)
                scale = max(np.abs(key_old).max(), np.abs(key_new).max(), 1.0)
                slack = max(100.0 * tol, 1e4 * dtypes.eps(self._dtype)) * scale
                entered = key_new < boundary - slack
                vals = np.concatenate([vals, new_vals])
                blocks.append(blk)
                if not np.any(entered):
                    self._locking_certified = True
                    break
        finally:
            self._arnop = base_arnop
            self._ncv = base_ncv
            self._v0 = base_v0
            self._locking_round = False

        if vals is None or len(vals) == 0:
            # The V/f placeholders were nulled between rounds; with
            # nothing converged there is no result to package — reset
            # to the not-computed representation so the accessors'
            # empty-result paths apply.
            self._result = None
            return 0
        # Wanted top-nev (with multiplicity) across all rounds, in
        # ``sorting`` order, packaged as a standard result (V holds the
        # wanted internal vectors; vectors_small = permuted identity).
        from spectra_tpu.util.selection import argsort_np

        take = argsort_np(want, vals)[: self._nev]
        wvals = vals[take]
        # Assemble the wanted rows from the per-round blocks with one
        # jitted gather/scatter per source block (peak = destination +
        # one block), never concatenating the blocks.
        sizes = [int(b.shape[0]) for b in blocks]
        starts = np.concatenate([[0], np.cumsum(sizes)])
        try:
            WX = jnp.zeros((len(take), self._n), self._dtype)
            for b, blk_b in enumerate(blocks):
                sel = [
                    (dst, g - int(starts[b]))
                    for dst, g in enumerate(np.asarray(take))
                    if starts[b] <= g < starts[b + 1]
                ]
                if not sel:
                    continue
                dst = np.asarray([d for d, _ in sel], np.int32)
                src = np.asarray([s for _, s in sel], np.int32)
                WX = _scatter_rows(
                    WX, blk_b, jnp.asarray(src), jnp.asarray(dst)
                )
            jax.block_until_ready(WX)
        except Exception as err:
            # Post-OOM the runtime refuses further allocations: deliver
            # the (host-side) eigenvalues with an empty vector block
            # rather than losing the whole computation.
            import sys as _s

            print(
                f"[compute_locked] vector assembly unavailable: "
                f"{err!r:.200}",
                file=_s.stderr,
            )
            WX = np.zeros((len(take), 0), np.dtype(self._dtype))
        order = argsort_np(sorting, wvals)
        nconv = len(wvals)
        res = self._result._replace(
            values=wvals[order],
            vectors_small=np.eye(nconv, dtype=np.dtype(WX.dtype))[:, order],
            conv=np.ones(nconv, bool),
            nconv=np.int32(nconv),
            niter=np.int32(niter),
            nops=np.int64(nops),
            V=WX,
            f=np.zeros((self._n if WX.shape[-1] else 0,), np.dtype(WX.dtype)),
        )
        return self._finish_result(res)

    def certified(self) -> bool:
        """True when the last :meth:`compute_locked` proved the wanted
        set complete under multiplicity (frontier test passed)."""
        return bool(getattr(self, "_locking_certified", False))

    def _finish_result(self, res) -> int:
        res = jax.tree_util.tree_map(fetch_result_leaf, res)
        self._result = res
        nconv = int(res.nconv)
        self._niter = int(res.niter)
        self._nops = int(res.nops)
        if not np.all(np.isfinite(res.values)):
            # NaN poisoning from a failed inner solve, or breakdown.
            self._info = CompInfo.NumericalIssue
            return 0
        self._info = (
            CompInfo.Successful if nconv >= self._nev else CompInfo.NotConverging
        )
        return min(self._nev, nconv)

    def _transform_aux(self):
        return None

    # -- accessors -------------------------------------------------------
    def info(self) -> CompInfo:
        return self._info

    def num_iterations(self) -> int:
        return self._niter

    def num_operations(self) -> int:
        return self._nops

    def convergence_history(self) -> list:
        """Per-segment (restarts, nconv, ||f||) trajectory; populated
        when running with ``set_restart_chunk`` (observability aid —
        the reference exposes only the final counters,
        HermEigsBase.h:401-406)."""
        return list(getattr(self, "_history", []))

    def eigenvalues(self) -> np.ndarray:
        """Converged eigenvalues (real), in the requested sorting order."""
        if getattr(self, "_mixed", None) is not None:
            return self._mixed[0]
        if self._result is None:
            return np.zeros((0,), jnp.finfo(self._dtype).dtype)
        res = self._result
        return res.values[res.conv]

    def eigenvectors(self, nvec: int | None = None) -> np.ndarray:
        """Eigenvectors of the converged eigenvalues (columns)."""
        if getattr(self, "_mixed", None) is not None:
            V = self._mixed[1]
            return V if nvec is None else V[:, : min(nvec, V.shape[1])]
        if self._result is None:
            return np.zeros((self._n, 0), self._dtype)
        res = self._result
        small = res.vectors_small[:, res.conv]
        if nvec is not None:
            small = small[:, : min(nvec, small.shape[1])]
        out_dtype = np.result_type(res.V.dtype, small.dtype)
        # V is (ncv, n) row-major; eigenvectors are columns of V^T S.
        # Through the VPU sweep when V is device-resident f64 on TPU
        # (the MXU emulation's slice tensor OOMs at extreme n).
        if isinstance(res.V, jax.Array):
            vecs = _contract_block(
                jnp.asarray(res.V).astype(out_dtype),
                jnp.asarray(small).astype(out_dtype),
            ).T
        else:
            vecs = res.V.astype(out_dtype).T @ small.astype(out_dtype)
        return self._vector_transform(vecs)

    def _vector_transform(self, vecs):
        """Hook mapping Ritz vectors of the transformed problem back to
        eigenvectors of the original problem (e.g. the Cholesky-mode
        back-solve, reference: SymGEigsSolver.h:195-207)."""
        return vecs
