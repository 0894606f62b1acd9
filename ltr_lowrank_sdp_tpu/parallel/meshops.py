"""Constraint-sharded conic operators for the PRODUCTION solver phases.

The two hot operators of the solver (``A(sym(UV^T))`` and ``A*(w)·Y``,
``ops/coneops.py``) are re-expressed here as SPMD programs over a
``jax.sharding.Mesh`` axis: the cone's stacked COO entry list is partitioned
across devices *by constraint id* (for the segment reduction) and *by output
row* (for the adjoint SpMM), each shard reduces its local entries with the
same bucketed-ELL gather kernels as the single-chip path (NO scatter-adds —
see ``ops/gatherseg.py`` for why scatter is 10-100x slower on TPU), and one
``psum`` over the mesh axis replicates the result.

Boundary contract: factors and (m,)-vectors enter and leave REPLICATED.
This keeps :class:`~..solver.alm.ALMPhase` / :class:`~..solver.admm.ADMMPhase`
byte-identical — a :class:`MeshConeOps` is a drop-in for ``ConeOps``; the
phases' elementwise (m,)/(n,r) algebra stays untouched and XLA keeps it
replicated.  Communication per operator application is exactly one
all-reduce of the output (m, or n x r), riding ICI.

Shard-uniformity: ``shard_map`` traces ONE program, so per-shard gather
layouts are padded to common shapes at build time (bucket widths unioned
across shards, row counts padded to the max, padding slots pointing at an
appended zero element).  Padding overhead is bounded by the usual 2x
pow2-bucket bound times the shard imbalance, which the nnz-balanced
contiguous partition keeps small.

Dense cones (the presolve picks a dense representation for dim<20 or
spRatio>=0.1 blocks, ``lorads_sdp_conic.c:1185-1392``) are small by
construction — their ops run replicated on every device (delegated to the
wrapped single-chip ``ConeOps``).

No reference equivalent: the reference solver is single-threaded C
(``lorads/CMakeLists.txt:109-114``); this layer is the TPU-native scaling
axis called for by SURVEY.md §5.8/§7.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.coneops import ConeOps
from ..ops.gatherseg import _bucket_layout
from ..problem import ConeData


class ShardTables(NamedTuple):
    """Shard-uniform bucketed-ELL layout for a sharded segment reduction.

    All leading dims are the shard count D; inside ``shard_map`` each device
    sees its slice (leading dim 1).

    * ``slot_*``: per-shard local slot data, padded to the common local
      length L with one trailing zero slot (index L): values 0, ids 0.
    * ``tabs[k]``: (D, n_k, K_k) int32 indices into the local slot vector
      (padding -> L, the zero slot).
    * ``pos``: (D, n_out) int32 gather map output-id -> row of the
      concatenated bucket outputs; non-owned ids -> T (appended zero row).
    """

    slot_rows: jnp.ndarray      # (D, L+1) int32 — factor row ids
    slot_cols: jnp.ndarray      # (D, L+1) int32
    slot_vals: jnp.ndarray      # (D, L+1) dtype — raw coefficient values
    slot_dcoef: jnp.ndarray     # (D, L+1) dtype — vals doubled off-diagonal
    slot_cid: jnp.ndarray       # (D, L+1) int32 — constraint ids
    tabs: tuple                 # tuple of (D, n_k, K_k) int32
    pos: jnp.ndarray            # (D, n_out) int32
    T: int                      # number of concatenated rows (zero row id)
    n_out: int


def _partition_by_id(ids: np.ndarray, n_out: int, D: int):
    """Contiguous output-id ranges per shard, balanced by slot count.

    Returns (ranges, owner) with ranges[s] = (lo, hi) and
    owner[slot] = shard index.
    """
    counts = np.bincount(ids, minlength=n_out).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(counts)])
    total = csum[-1]
    bounds = [0]
    for s in range(1, D):
        target = total * s // D
        bounds.append(int(np.searchsorted(csum, target)))
    bounds.append(n_out)
    bounds = np.maximum.accumulate(np.asarray(bounds))
    ranges = [(int(bounds[s]), int(bounds[s + 1])) for s in range(D)]
    owner_of_id = np.zeros(n_out, np.int64)
    for s, (lo, hi) in enumerate(ranges):
        owner_of_id[lo:hi] = s
    return ranges, owner_of_id[ids]


def build_shard_tables(rows, cols, vals, cid, out_ids, n_out: int, D: int,
                       dtype) -> ShardTables:
    """Build the shard-uniform layout for a reduction over ``out_ids``.

    ``out_ids`` selects the sharding axis: pass ``cid`` to shard the
    constraint-value reduction by constraint, or the (symmetrized) slot row
    to shard the adjoint SpMM by output row.  All slots of one output id
    land on a single shard, so the final ``psum`` merges one owner value
    with D-1 zeros.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float64)
    cid = np.asarray(cid, np.int64)
    out_ids = np.asarray(out_ids, np.int64)
    off = rows != cols
    dcoef = np.where(off, 2.0 * vals, vals)

    ranges, owner = _partition_by_id(out_ids, n_out, D)
    sel = [np.nonzero(owner == s)[0] for s in range(D)]
    L = max((s.size for s in sel), default=0)

    # per-shard padded slot data (+1 trailing zero slot)
    def pack(src, pad_val, dt):
        out = np.full((D, L + 1), pad_val, dt)
        for s in range(D):
            out[s, : sel[s].size] = src[sel[s]]
        return out

    slot_rows = pack(rows, 0, np.int64)
    slot_cols = pack(cols, 0, np.int64)
    slot_vals = pack(vals, 0.0, np.float64)
    slot_dcoef = pack(dcoef, 0.0, np.float64)
    slot_cid = pack(cid, 0, np.int64)

    # per-shard bucket layouts over LOCAL output ids
    per_shard = []
    for s in range(D):
        lo, hi = ranges[s]
        local_ids = out_ids[sel[s]] - lo
        tables, _, pos_local = _bucket_layout(local_ids, L, hi - lo)
        by_width = {}
        for t in tables:
            by_width.setdefault(t.shape[1], []).append(t)
        merged = {k: np.concatenate(ts, axis=0) for k, ts in by_width.items()}
        per_shard.append((ranges[s], merged, pos_local, tables))

    # NOTE: pos_local indexes the shard's OWN concatenation order; rebuild it
    # against the common padded layout below instead.
    widths = sorted({k for _, merged, _, _ in per_shard for k in merged})
    n_max = {k: max(merged.get(k, np.zeros((0, k))).shape[0]
                    for _, merged, _, _ in per_shard) for k in widths}
    offsets = {}
    off_cursor = 0
    for k in widths:
        offsets[k] = off_cursor
        off_cursor += n_max[k]
    T = off_cursor

    tabs = []
    for k in widths:
        tab = np.full((D, n_max[k], k), L, np.int64)   # pad -> zero slot
        for s in range(D):
            m = per_shard[s][1].get(k)
            if m is not None and m.size:
                tab[s, : m.shape[0]] = m
        tabs.append(jnp.asarray(tab, jnp.int32))

    pos = np.full((D, n_out), T, np.int64)             # default: zero row
    for s in range(D):
        (lo, hi), merged, _, tables = per_shard[s]
        # walk this shard's buckets in common width order, tracking the row
        # cursor inside each common bucket
        cursor = {k: 0 for k in widths}
        # recover per-table segment lists by re-running the layout walk:
        # _bucket_layout returns tables in its own order; rebuild pos from
        # counts directly instead (cheap, exact)
        local_ids = out_ids[sel[s]] - lo
        counts = np.bincount(local_ids, minlength=hi - lo).astype(np.int64)
        keys = np.zeros(hi - lo, np.int64)
        nz = counts > 0
        keys[nz] = np.ceil(np.log2(counts[nz])).astype(np.int64) + 1
        keys[nz & (counts == 1)] = 1
        seg_by_key = np.argsort(keys, kind="stable")
        sorted_keys = keys[seg_by_key]
        i = 0
        while i < hi - lo:
            k_exp = sorted_keys[i]
            j = i + np.searchsorted(sorted_keys[i:], k_exp, side="right")
            segs = seg_by_key[i:j]
            K = 0 if k_exp == 0 else 1 << (int(k_exp) - 1)
            if K in offsets:
                base = offsets[K] + cursor[K]
                pos[s, lo + segs] = base + np.arange(segs.size)
                cursor[K] += segs.size
            # K == 0 and 0 not in widths: empty segments stay at T (zero)
            i = j
    return ShardTables(
        slot_rows=jnp.asarray(slot_rows, jnp.int32),
        slot_cols=jnp.asarray(slot_cols, jnp.int32),
        slot_vals=jnp.asarray(slot_vals, dtype),
        slot_dcoef=jnp.asarray(slot_dcoef, dtype),
        slot_cid=jnp.asarray(slot_cid, jnp.int32),
        tabs=tuple(tabs), pos=jnp.asarray(pos, jnp.int32),
        T=T, n_out=n_out,
    )


def _local_reduce(contrib, tabs, pos, T):
    """Bucketed-ELL reduction of local per-slot values -> (n_out, ...) with
    non-owned ids reading the appended zero row."""
    parts = [jnp.sum(contrib[t], axis=1) for t in tabs]
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    zero = jnp.zeros((1,) + cat.shape[1:], cat.dtype)
    return jnp.concatenate([cat, zero], axis=0)[pos]


def _local_spmm(w_tabs, col_tabs, Y, pos):
    parts = []
    for w_tab, col_tab in zip(w_tabs, col_tabs):
        yg = Y[col_tab]                              # (n_k, K, r)
        # explicit multiply-reduce: jnp.einsum lowers to a dot_general the
        # shardy partitioner rejects inside shard_map bodies (operands all
        # derived from gathers of replicated inputs)
        parts.append(jnp.sum(w_tab[:, :, None] * yg, axis=1))
    cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    zero = jnp.zeros((1, Y.shape[1]), Y.dtype)
    return jnp.concatenate([cat, zero], axis=0)[pos]


class MeshConeOps:
    """Drop-in :class:`~..ops.coneops.ConeOps` with mesh-sharded hot ops.

    ``inner`` (a relabel-aware single-chip ConeOps) serves every cold path
    (objective value, C·Y with static values, boundary permutations); the
    two hot m-coupled operators are sharded over ``mesh`` axis ``axis``.
    """

    def __init__(self, cone: ConeData, inner: ConeOps, mesh: Mesh,
                 axis: str = "constr", dtype=jnp.float64):
        self.inner = inner
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        self.n = inner.n
        self.m = inner.m
        self.kind_a = inner.kind_a
        self.kind_c = inner.kind_c
        self.n_active = inner.n_active
        self.rank_max = inner.rank_max
        self.row_order = inner.row_order
        self.constr_order = inner.constr_order
        D = mesh.shape[axis]
        self.D = D

        # dense-A cones keep the replicated dense-materialization path (they
        # are small by presolve construction); everything else shards its
        # sparse slot list.  A dense OBJECTIVE is fine: apply_c stays a
        # replicated dense matmul while A*(w) shards over its sparse slots.
        self.sharded = inner.kind_a != "dense"
        if self.sharded and inner.kind_a != "diag" and (
                inner.a_sparse is None or not inner.a_sparse.nnz):
            self.sharded = False
        if not self.sharded:
            return

        # entry lists in INTERNAL (relabeled) row/constraint order — must
        # match the row order the phases' factors use
        if inner.kind_a == "diag":
            if inner.diag_identity:
                rows = np.arange(self.n)
                vals = np.asarray(inner.diag_val, np.float64)
                cid = np.arange(self.n)
            else:
                rows = np.asarray(inner.diag_idx, np.int64)
                vals = np.asarray(inner.diag_val, np.float64)
                cid = np.asarray(inner.diag_cid, np.int64)
            cols = rows
        else:
            sp = inner.a_sparse
            rows = np.asarray(sp.rows, np.int64)
            cols = np.asarray(sp.cols, np.int64)
            vals = np.asarray(sp.vals, np.float64)
            cid = np.asarray(sp.cid, np.int64)

        # (1) constraint-value reduction sharded by constraint id
        self.cv_tab = build_shard_tables(rows, cols, vals, cid, cid,
                                         self.m, D, dtype)
        # (2) adjoint SpMM sharded by output row over symmetrized slots
        off = rows != cols
        s_rows = np.concatenate([rows, cols[off]])
        s_cols = np.concatenate([cols, rows[off]])
        s_vals = np.concatenate([vals, vals[off]])
        s_cid = np.concatenate([cid, cid[off]])
        self.mm_tab = build_shard_tables(s_rows, s_cols, s_vals, s_cid,
                                         s_rows, self.n, D, dtype)

        t = self.cv_tab

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(axis), P(axis),
                           P(axis), P(), P()),
                 out_specs=P())
        def _cv(dcoef, srows, scols, spos, tabs_flat, U, V):
            dcoef, srows, scols, spos = (
                dcoef[0], srows[0], scols[0], spos[0])
            tabs = [tt[0] for tt in tabs_flat]
            e = 0.5 * (jnp.sum(U[srows] * V[scols], -1)
                       + jnp.sum(U[scols] * V[srows], -1))
            local = _local_reduce(dcoef * e, tabs, spos, t.T)
            return jax.lax.psum(local, axis)

        self._cv = _cv

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(axis), P(axis),
                           P(axis), P(), P()),
                 out_specs=P())
        def _aw(svals, scid, scols, spos, tabs_flat, w, Y):
            svals, scid, scols, spos = (
                svals[0], scid[0], scols[0], spos[0])
            tabs = [tt[0] for tt in tabs_flat]
            # padding slots carry svals == 0, which kills their contribution
            # regardless of the (0-valued) pad cid
            w_ext = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
            wv = svals * w_ext[scid]                     # (L+1,) slot weights
            w_tabs = [wv[tt] for tt in tabs]
            col_tabs = [scols[tt] for tt in tabs]
            local = _local_spmm(w_tabs, col_tabs, Y, spos)
            return jax.lax.psum(local, axis)

        self._aw = _aw

    # ---- boundary conversions ---------------------------------------- #

    def permute_rows_in(self, X):
        return self.inner.permute_rows_in(X)

    def permute_rows_out(self, X):
        return self.inner.permute_rows_out(X)

    # ---- hot ops ------------------------------------------------------ #

    def constr_vals(self, U, V):
        if not self.sharded:
            return self.inner.constr_vals(U, V)
        t = self.cv_tab
        return self._cv(t.slot_dcoef, t.slot_rows, t.slot_cols, t.pos,
                        list(t.tabs), U, V)

    def cg_normal_matvec(self, fixed):
        """ADMM normal-operator matvec (see ``ConeOps.cg_normal_matvec``).
        The sharded path composes the sharded constr_vals/apply_a (no
        fixed-side hoisting yet — each is one shard_map dispatch)."""
        if not self.sharded:
            return self.inner.cg_normal_matvec(fixed)

        def mv(x):
            w = self.constr_vals(x, fixed)
            return x + self.apply_a(w, fixed)

        return mv

    def constr_vals_pair(self, R, D):
        """ALM line-search pair (see ``ConeOps.constr_vals_pair``): the
        sharded path reuses the sharded constr_vals twice (each is one
        shard_map + psum); fusing them is possible but the replicated
        fallback covers the current sharded ALM usage."""
        if not self.sharded:
            return self.inner.constr_vals_pair(R, D)
        rd = self.constr_vals(R, D)
        dr = self.constr_vals(D, R)
        dd = self.constr_vals(D, D)
        return rd + dr, dd

    def apply_a(self, w, Y):
        if not self.sharded:
            return self.inner.apply_a(w, Y)
        t = self.mm_tab
        return self._aw(t.slot_vals, t.slot_cid, t.slot_cols, t.pos,
                        list(t.tabs), w, Y)

    def apply_w(self, w, Y, obj_coef=1.0, include_obj=None):
        if not self.sharded:
            return self.inner.apply_w(w, Y, obj_coef=obj_coef,
                                      include_obj=include_obj)
        if include_obj is None:
            include_obj = not (isinstance(obj_coef, float) and obj_coef == 0.0)
        out = self.apply_a(w, Y)
        if include_obj:
            out = out + obj_coef * self.inner.apply_c(Y)
        return out

    # ---- cold paths (replicated) -------------------------------------- #

    def obj_value(self, U, V):
        return self.inner.obj_value(U, V)

    def apply_c(self, Y):
        return self.inner.apply_c(Y)

    def cid_for_entries(self):
        return self.inner.cid_for_entries()

    def constr_flops(self, rank: int) -> int:
        return self.inner.constr_flops(rank)

    def apply_flops(self, rank: int) -> int:
        return self.inner.apply_flops(rank)

    # diag passthroughs used by a few callers
    @property
    def diag_identity(self):
        return self.inner.diag_identity

    @property
    def diag_val(self):
        return self.inner.diag_val
