"""Communication-optimal halo-exchange SpMV for *general* sparsity.

The reference's per-iteration hot op is a general sparse SpMV
(reference: include/Spectra/MatOp/SparseSymMatProd.h:83-89). Under a
row-partitioned mesh, GSPMD's default lowering all-gathers the whole x
vector (O(n) bytes per device per SpMV). This module moves only the
**halo**: the distinct remote x-entries each shard's columns actually
reference.

Design (TPU-first, static shapes throughout):

* Host-side :func:`plan_halo_partition` analyses the CSR structure once
  and produces a :class:`HaloPlan`: per-shard send gather-lists, a
  local-column-remapped ELL block for the *interior* (columns owned by
  the shard), and a compact COO boundary list (row, halo-position,
  value) for the remote entries.
* Communication is grouped by **shard distance**: for each signed
  distance d with any traffic, one ``lax.ppermute`` ships the padded
  gather of boundary x-entries from shard s to shard s-d. For banded
  matrices this degenerates to the two neighbor exchanges of the
  stencil path; for general sparsity it is a sparse all-to-all with
  per-distance padding — O(sum_d H_d) bytes per device instead of O(n).
* The interior ELL multiply depends only on local x, so XLA's
  latency-hiding scheduler can overlap the ppermutes with it (the
  boundary scatter-add joins afterwards) — comm/compute overlap falls
  out of the dataflow rather than manual scheduling.
* ``perform_op`` accepts both a vector and an (n, k) block; a block
  pays exactly **one** halo exchange per distance (not k), so JD /
  LOBPCG / SVD block products scale.
"""

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectra_tpu.util.pytree import pytree_dataclass


@dataclass(frozen=True)
class HaloPlan:
    """Host-side partition plan (all numpy; built once per matrix)."""

    n: int
    n_parts: int
    rows_per: int
    dists: tuple  # active signed shard distances (owner - dest)
    halo_sizes: tuple  # H_d per distance (padded max over shard pairs)
    send_idx: tuple  # per distance: (n_parts, H_d) int32 local indices
    cols_local: np.ndarray  # (n, L) int32 local column ids
    vals_local: np.ndarray  # (n, L) interior values
    b_rows: np.ndarray  # (n_parts, R) int32 local boundary rows
    b_pos: np.ndarray  # (n_parts, R) int32 positions into the halo
    b_vals: np.ndarray  # (n_parts, R) boundary values

    @property
    def halo_entries_per_device(self) -> int:
        """x-entries moved per device per SpMV (padded)."""
        return int(sum(self.halo_sizes))

    def comm_report(self, itemsize: int = 8) -> dict:
        """Bytes moved per device per SpMV vs the all-gather lowering."""
        return {
            "halo_bytes": self.halo_entries_per_device * itemsize,
            "allgather_bytes": (self.n - self.rows_per) * itemsize,
            "n_distances": len(self.dists),
        }


def plan_halo_partition(csr, n_parts: int, dtype=None) -> HaloPlan:
    """Build the halo plan for an equal row partition of a scipy CSR
    matrix over ``n_parts`` shards.

    Pads every per-(shard, distance) gather to the max over shards at
    that distance, so all shapes are static; pad slots gather x[0] of
    the sender and are never referenced by any boundary entry.
    """
    csr = csr.tocsr()
    csr.sum_duplicates()
    n = csr.shape[0]
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("halo SpMV requires a square matrix")
    if n % n_parts != 0:
        raise ValueError(
            f"n must divide evenly over the shards ({n} rows over "
            f"{n_parts})"
        )
    rows_per = n // n_parts
    indptr = csr.indptr.astype(np.int64)
    indices = csr.indices.astype(np.int64)
    data = csr.data if dtype is None else csr.data.astype(dtype)

    nnz_per_row = np.diff(indptr)
    row_of = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    dest = row_of // rows_per
    owner = indices // rows_per
    remote = owner != dest

    # --- distinct remote columns per (dest, owner) pair -----------------
    rkey = dest[remote] * np.int64(n) + indices[remote]
    uniq = np.unique(rkey)
    u_dest = uniq // n
    u_col = uniq % n
    u_owner = u_col // rows_per
    u_delta = u_owner - u_dest

    dists = tuple(int(d) for d in np.unique(u_delta)) if uniq.size else ()

    # Rank of each unique column within its (dest, distance) group.
    # `uniq` is sorted by (dest, col); within a dest, ascending col means
    # ascending owner (hence distance), so groups are contiguous runs.
    grp = u_dest * np.int64(2 * n_parts + 1) + (u_delta + n_parts)
    if uniq.size:
        change = np.r_[True, grp[1:] != grp[:-1]]
        grp_start = np.flatnonzero(change)
        grp_sizes = np.diff(np.r_[grp_start, len(grp)])
        rank = np.arange(len(grp)) - np.repeat(grp_start, grp_sizes)
    else:
        grp_start = np.zeros(0, dtype=np.int64)
        grp_sizes = np.zeros(0, dtype=np.int64)
        rank = np.zeros(0, dtype=np.int64)

    # Per-distance padded halo width H_d = max group size at distance d,
    # and the sender-side gather lists.
    halo_sizes = []
    send_idx = []
    off_of_dist = {}
    offset = 0
    for d in dists:
        sel = u_delta[grp_start] == d
        H = max(int(grp_sizes[sel].max()) if sel.any() else 1, 1)
        off_of_dist[d] = offset
        offset += H
        halo_sizes.append(H)
        # Owner s ships to dest s-d the columns it owns that the dest
        # needs, ordered by ascending column (matching `rank`).
        sidx = np.zeros((n_parts, H), dtype=np.int32)
        mask = u_delta == d
        s_owner = u_owner[mask]
        sidx[s_owner, rank[mask]] = (
            u_col[mask] - s_owner * rows_per
        ).astype(np.int32)
        send_idx.append(sidx)

    # Position (into the concatenated per-device halo buffer) of every
    # unique remote column, then of every remote nnz entry.
    if uniq.size:
        dist_off = np.array([off_of_dist[int(d)] for d in u_delta])
        pos_of_unique = dist_off + rank
        entry_pos = pos_of_unique[np.searchsorted(uniq, rkey)]
    else:
        entry_pos = np.zeros(0, dtype=np.int64)

    # --- compact boundary COO per shard ----------------------------------
    r_rows = row_of[remote]
    r_dest = dest[remote]
    r_vals = data[remote]
    counts = np.bincount(r_dest, minlength=n_parts)
    R = max(int(counts.max()) if counts.size else 0, 1)
    b_rows = np.zeros((n_parts, R), dtype=np.int32)
    b_pos = np.zeros((n_parts, R), dtype=np.int32)
    b_vals = np.zeros((n_parts, R), dtype=data.dtype)
    order = np.argsort(r_dest, kind="stable")
    starts = np.r_[0, np.cumsum(counts)]
    slot = np.arange(len(order)) - np.repeat(starts[:-1], counts)
    sd = r_dest[order]
    b_rows[sd, slot] = (r_rows[order] - sd * rows_per).astype(np.int32)
    b_pos[sd, slot] = entry_pos[order].astype(np.int32)
    b_vals[sd, slot] = r_vals[order]

    # --- interior ELL with local column ids -------------------------------
    from spectra_tpu.sparse.formats import _ell_arrays_from_csr

    keep = ~remote
    local_nnz_per_row = np.bincount(row_of[keep], minlength=n)
    l_indptr = np.r_[0, np.cumsum(local_nnz_per_row)]
    cols_local, vals_local = _ell_arrays_from_csr(
        l_indptr,
        (indices[keep] - dest[keep] * rows_per).astype(np.int64),
        data[keep],
        n,
    )

    return HaloPlan(
        n=n,
        n_parts=n_parts,
        rows_per=rows_per,
        dists=dists,
        halo_sizes=tuple(halo_sizes),
        send_idx=tuple(send_idx),
        cols_local=cols_local.astype(np.int32),
        vals_local=vals_local,
        b_rows=b_rows,
        b_pos=b_pos,
        b_vals=b_vals,
    )


@functools.lru_cache(maxsize=64)
def _build_halo_matvec(mesh: Mesh, axis: str, dists: tuple, blocked: bool):
    """shard_map'd halo SpMV, cached per (mesh, distances, arity)."""
    n_dev = mesh.shape[axis]

    def local_fn(vals, cols, b_rows, b_pos, b_vals, x, *sends):
        # Kick off every halo exchange first; the interior multiply
        # below depends only on local x, so XLA's scheduler overlaps
        # the collectives with it.
        halos = []
        for d, sidx in zip(dists, sends):
            buf = x[sidx[0]]  # (H_d,) or (H_d, k)
            perm = [(s, s - d) for s in range(n_dev) if 0 <= s - d < n_dev]
            halos.append(jax.lax.ppermute(buf, axis, perm))
        # Interior: local-column ELL multiply (no halo dependency).
        if blocked:
            y = jnp.einsum("rl,rlk->rk", vals, x[cols])
        else:
            y = jnp.sum(vals * x[cols], axis=1)
        if halos:
            halo_cat = jnp.concatenate(halos, axis=0)
            if blocked:
                corr = b_vals[0][:, None] * halo_cat[b_pos[0], :]
            else:
                corr = b_vals[0] * halo_cat[b_pos[0]]
            y = y.at[b_rows[0]].add(corr)
        return y

    vec = P(axis, None) if blocked else P(axis)
    in_specs = (
        P(axis, None),  # vals
        P(axis, None),  # cols
        P(axis, None),  # b_rows
        P(axis, None),  # b_pos
        P(axis, None),  # b_vals
        vec,  # x
    ) + tuple(P(axis, None) for _ in dists)  # send gather lists
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=vec
    )


@pytree_dataclass(meta_fields=("dists", "n_rows", "mesh", "axis"))
class ShardedEllMatProd:
    """General-sparsity MatProd with explicit O(halo) exchange.

    Drop-in for the solver drivers (same duck-typed protocol as
    SparseSymMatProd; reference seam: include/Spectra/MatOp/
    SparseSymMatProd.h:83-89). Block inputs pay one exchange per
    distance, not per column, so JD/SVD/LOBPCG block products scale.
    """

    ell_vals: jnp.ndarray  # (n, L) interior values, P(axis, None)
    ell_cols: jnp.ndarray  # (n, L) int32 local column ids
    b_rows: jnp.ndarray  # (n_parts, R) int32
    b_pos: jnp.ndarray  # (n_parts, R) int32
    b_vals: jnp.ndarray  # (n_parts, R)
    sends: tuple  # one (n_parts, H_d) int32 array per distance
    diag: jnp.ndarray  # (n,) P(axis)
    dists: tuple
    n_rows: int
    mesh: Mesh
    axis: str

    @classmethod
    def create(cls, mat, mesh: Mesh, axis: str = "rows", dtype=None):
        """Partition a scipy sparse matrix over ``mesh``."""
        from spectra_tpu.distributed import global_put

        csr = mat.tocsr()
        plan = plan_halo_partition(csr, mesh.shape[axis], dtype=dtype)
        shard2 = NamedSharding(mesh, P(axis, None))

        def put2(a):
            return global_put(np.asarray(a), shard2)

        diag = np.asarray(csr.diagonal())
        if dtype is not None:
            diag = diag.astype(dtype)
        return cls(
            ell_vals=put2(plan.vals_local),
            ell_cols=put2(plan.cols_local),
            b_rows=put2(plan.b_rows),
            b_pos=put2(plan.b_pos),
            b_vals=put2(plan.b_vals),
            sends=tuple(put2(s) for s in plan.send_idx),
            diag=global_put(diag, NamedSharding(mesh, P(axis))),
            dists=plan.dists,
            n_rows=plan.n,
            mesh=mesh,
            axis=axis,
        )

    @property
    def dtype(self):
        return self.ell_vals.dtype

    def rows(self) -> int:
        return self.n_rows

    def cols(self) -> int:
        return self.n_rows

    def perform_op(self, x):
        mv = _build_halo_matvec(
            self.mesh, self.axis, self.dists, blocked=(x.ndim == 2)
        )
        return mv(
            self.ell_vals,
            self.ell_cols,
            self.b_rows,
            self.b_pos,
            self.b_vals,
            x,
            *self.sends,
        )

    def diagonal(self):
        return self.diag
