"""Gather-based segment reductions (TPU-friendly replacements for scatter).

XLA lowers ``jax.ops.segment_sum`` / ``.at[].add`` to scatter-add, which on
TPU serializes over the updates dimension and is routinely 10-100x slower
than a gather of the same volume.  Every segment reduction in the conic
operators (A(sym(UV^T)) accumulation over constraint ids, the adjoint SpMM
S·Y with S = Sum_i w_i A_i, LP column sums) has a *static* index structure
known at build time, so each can be re-expressed as pure gathers:

1. sort entries by target segment (host-side, once);
2. bucket segments by ceil-pow2 of their entry count;
3. per bucket, pad entries into an ELL table (n_b, K_b) of entry indices
   (padding points at a trailing zero slot), so the reduction is
   ``vals_ext[table].sum(axis=1)`` — one gather + one dense reduction;
4. re-assemble the segment axis with one inverse-permutation gather.

Pow2 bucketing bounds the padding blow-up at 2x per bucket while keeping the
number of launched gathers at O(log(max_degree)); heavily skewed degree
distributions (amazon0302-style power laws) stay nnz-proportional.

Measured cost model (v5e, f32): an XLA gather costs ~7 ns per *index*,
almost independent of the gathered row width up to 128 lanes.  Everything
here is therefore organized to minimize the number of gather indices:

* static matrix values (the objective C, whose values never change across a
  solve) are baked into dense per-bucket ELL *value tables* at build time —
  the weight gather disappears entirely (:meth:`EllSpMM.apply`);
* dynamic constraint weights gather ``w[cid]`` through a precomputed
  slot→constraint-id table (one gather), never via an nnz-sized
  intermediate (two gathers) (:meth:`EllSpMM.apply_constr`);
* the final output permutation is skipped when the caller has relabeled
  the row space to bucket order (``identity_pos``; see
  ``ops/coneops.py`` vertex relabeling).

This is the TPU-native re-design of the reference's per-coefficient BLAS
vtable dispatch (``lorads_sdp_data.c:750-1049``): instead of one small
kernel per constraint matrix, the whole cone becomes a handful of large,
layout-aligned gathers the VPU streams at HBM bandwidth.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Static-table residency policy.  Closure constants can live either in
# host memory (numpy: embedded into the executable at lowering) or on
# the device (jnp: hoisted as hidden executable arguments).  On the
# axon remote-TPU runtime the choice is decisive, in both directions:
#   * device-resident (jnp) closure arrays are kept in memory space
#     S(1) (host-side) and STREAMED into the core at every while-loop
#     iteration that touches them — an A/B on the theta102 ADMM chunk
#     measured 21.8 ms/iter (jnp tables) vs 0.1 ms/iter (embedded);
#     they also forced a device->host value read at trace/lowering
#     that nondeterministically stalled for minutes;
#   * embedded (numpy) tables compile into the executable image and
#     are fetched/prefetched like any other program constant — fast.
# Policy: embed everything up to a very large cap; the cap only guards
# against pathological executable sizes (a 2^26-element int32 table is
# a 256 MB HLO constant) where streaming is the lesser evil.
TAB_EMBED_MAX_ELEMS = 1 << 26


def static_table(arr, dtype):
    """Return ``arr`` as a host-embedded (small) or device-committed
    (huge) static table per the policy above."""
    arr = np.asarray(arr, jnp.dtype(dtype))
    if arr.size <= TAB_EMBED_MAX_ELEMS:
        return arr
    out = jnp.asarray(arr)
    out.block_until_ready()
    return out


def _bucket_layout(ids: np.ndarray, length: int, num: int):
    """Static bucketed-ELL layout for a segment reduction.

    Returns ``(tables, seg_lists, pos)`` where ``tables[b]`` is an
    (n_b, K_b) int32 array of entry indices into the value vector (padding
    = ``length``, a zero slot), ``seg_lists[b]`` the segment ids of its
    rows, and ``pos`` the (num,) gather map from segment id to its row in
    the concatenated bucket outputs.
    """
    ids = np.asarray(ids, np.int64)
    counts = np.bincount(ids, minlength=num).astype(np.int64)
    order = np.argsort(ids, kind="stable")  # entries grouped by segment
    starts = np.zeros(num + 1, np.int64)
    starts[1:] = np.cumsum(counts)

    # bucket key: 0 for empty segments, else ceil-pow2 exponent of count
    keys = np.zeros(num, np.int64)
    nz = counts > 0
    keys[nz] = np.ceil(np.log2(counts[nz])).astype(np.int64) + 1
    keys[nz & (counts == 1)] = 1

    seg_by_key = np.argsort(keys, kind="stable")
    sorted_keys = keys[seg_by_key]

    tables: List[np.ndarray] = []
    seg_lists: List[np.ndarray] = []
    pos = np.zeros(num, np.int64)
    cursor = 0
    out_row = 0
    while cursor < num:
        k = sorted_keys[cursor]
        end = cursor + np.searchsorted(sorted_keys[cursor:], k, side="right")
        segs = seg_by_key[cursor:end]
        pos[segs] = out_row + np.arange(segs.size)
        out_row += segs.size
        if k == 0:
            tables.append(np.zeros((segs.size, 0), np.int64))
        else:
            K = 1 << (int(k) - 1)
            tab = np.full((segs.size, K), length, np.int64)
            csum = counts[segs]
            row = np.repeat(np.arange(segs.size), csum)
            within = np.arange(csum.sum()) - np.repeat(
                np.cumsum(csum) - csum, csum)
            src_pos = np.repeat(starts[segs], csum) + within
            tab[row, within] = order[src_pos]
            tables.append(tab)
        seg_lists.append(segs)
        cursor = end
    return tables, seg_lists, pos


class EllSegSum:
    """Segment sum of per-entry scalars via bucketed-ELL gathers.

    ``__call__(vals)`` with vals of shape (L,) returns the (num,) segment
    sums; trailing dims are supported (vals (L, d) -> (num, d)).
    """

    def __init__(self, ids: np.ndarray, length: int, num: int):
        self.length = int(length)
        self.num = int(num)
        tables, _, pos = _bucket_layout(ids, length, num)
        self.tables = [static_table(t, np.int32) for t in tables]
        self.pos = static_table(pos, np.int32)

    def __call__(self, vals):
        pad_shape = (1,) + vals.shape[1:]
        vals_ext = jnp.concatenate(
            [vals, jnp.zeros(pad_shape, vals.dtype)], axis=0)
        parts = []
        for tab in self.tables:
            if tab.shape[1] == 0:
                parts.append(jnp.zeros((tab.shape[0],) + vals.shape[1:],
                                       vals.dtype))
            else:
                parts.append(jnp.sum(vals_ext[tab], axis=1))
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return cat[self.pos]


class EllSpMM:
    """Y -> S @ Y for a symmetric sparse S, fully gather-based.

    Built from symmetric COO triplets (upper triangle, row <= col).  Three
    application modes, in decreasing specialization / increasing cost:

    * :meth:`apply` — S has the *static* values passed at build time
      (optionally scaled by a traced scalar).  Per-bucket dense value
      tables; the only gathers are the Y-row gathers.
    * :meth:`apply_constr` — S = Sum_i w_i A_i with per-constraint weights
      ``w`` (num_seg,); slot weight = val_tab * w[cid_tab].  One scalar
      gather per slot on top of the Y-row gathers.
    * :meth:`apply_weighted` — legacy per-entry weights (nnz,), two
      gathers per slot.  Kept for callers that precombine weights.

    ``order`` is the original row id at each output position of the
    concatenated buckets; when the caller relabels its row space to this
    order the output permutation becomes the identity and is skipped
    (``identity_pos``).
    """

    def __init__(self, rows: np.ndarray, cols: np.ndarray, n: int,
                 vals: Optional[np.ndarray] = None,
                 cid: Optional[np.ndarray] = None,
                 num_seg: Optional[int] = None,
                 dtype=jnp.float64):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        nnz = rows.size
        self.nnz = int(nnz)
        self.n = int(n)
        off = rows != cols
        slot_row = np.concatenate([rows, cols[off]])
        slot_col = np.concatenate([cols, rows[off]])
        slot_src = np.concatenate([np.arange(nnz), np.arange(nnz)[off]])
        tables, seg_lists, pos = _bucket_layout(slot_row, slot_row.size, n)
        # original row id at each output position (for vertex relabeling)
        self.order = np.concatenate(seg_lists) if seg_lists else \
            np.zeros(0, np.int64)
        self.identity_pos = bool(np.array_equal(pos, np.arange(n)))
        # resolve slot-index tables into (src, col) tables; padding slot
        # maps to src=nnz (zero-extended weight) and col=0 (weight 0 kills it)
        slot_src_ext = np.concatenate([slot_src, [nnz]])
        slot_col_ext = np.concatenate([slot_col, [0]])
        self.src_tabs = [static_table(slot_src_ext[t], np.int32)
                         for t in tables]
        self.col_tabs = [static_table(slot_col_ext[t], np.int32)
                         for t in tables]
        self.pos = static_table(pos, np.int32)
        # total padded slots (for flop/bandwidth accounting)
        self.padded_slots = int(sum(t.size for t in tables))

        # static per-bucket value tables (padding -> 0)
        self.val_tabs = None
        if vals is not None:
            vals_ext = np.concatenate([np.asarray(vals, np.float64), [0.0]])
            self.val_tabs = [static_table(vals_ext[np.asarray(slot_src_ext)[t]],
                                          dtype)
                             for t in tables]
        # slot -> constraint-id tables (padding -> num_seg zero weight slot;
        # num_seg must be the TRUE segment count so the pad index always
        # lands on the appended zero of w_ext, never a live constraint)
        self.cid_tabs = None
        if cid is not None:
            cid = np.asarray(cid, np.int64)
            self.num_seg = (int(num_seg) if num_seg is not None
                            else (int(cid.max()) + 1 if cid.size else 0))
            cid_ext = np.concatenate([cid, [self.num_seg]])
            self.cid_tabs = [
                static_table(cid_ext[np.asarray(slot_src_ext)[t]], np.int32)
                for t in tables]

    # ------------------------------------------------------------------ #

    def _reduce(self, weight_tabs, Y):
        r = Y.shape[1]
        parts = []
        for w_tab, col_tab in zip(weight_tabs, self.col_tabs):
            if col_tab.shape[1] == 0:
                parts.append(jnp.zeros((col_tab.shape[0], r), Y.dtype))
            else:
                yg = Y[col_tab]                              # (n_b, K, r)
                parts.append(jnp.einsum(
                    "bk,bkr->br", w_tab, yg,
                    preferred_element_type=Y.dtype))
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        if self.identity_pos:
            return cat
        return cat[self.pos]

    def apply(self, Y, scale=None):
        """S @ Y with the static build-time values (optionally scaled)."""
        assert self.val_tabs is not None
        out = self._reduce(self.val_tabs, Y)
        if scale is not None:
            out = scale * out
        return out

    def apply_constr(self, w, Y):
        """(Sum_i w_i A_i) @ Y for per-constraint weights w (num_seg,)."""
        assert self.val_tabs is not None and self.cid_tabs is not None
        w_ext = jnp.concatenate([w, jnp.zeros((1,), w.dtype)], axis=0)
        weight_tabs = [w_ext[ct] * vt
                       for ct, vt in zip(self.cid_tabs, self.val_tabs)]
        return self._reduce(weight_tabs, Y)

    def apply_weighted(self, w_entry, Y):
        """S @ Y for per-entry weights w_entry (nnz,) — legacy path."""
        w_ext = jnp.concatenate(
            [w_entry, jnp.zeros((1,), w_entry.dtype)], axis=0)
        weight_tabs = [w_ext[st] for st in self.src_tabs]
        return self._reduce(weight_tabs, Y)

    def __call__(self, w_entry, Y):
        return self.apply_weighted(w_entry, Y)


def spmm_relabel_order(rows: np.ndarray, cols: np.ndarray,
                       n: int) -> np.ndarray:
    """The vertex order (old id per new position) that makes
    :class:`EllSpMM`'s output permutation the identity for this pattern.

    Relabeling rows AND cols of the same symmetric pattern by
    ``new_of_old = argsort-inverse(order)`` and rebuilding the EllSpMM
    yields ``identity_pos == True``: bucket keys become nondecreasing in
    the new row id, so the stable key sort is the identity.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    off = rows != cols
    slot_row = np.concatenate([rows, cols[off]])
    _, seg_lists, _ = _bucket_layout(slot_row, slot_row.size, n)
    return np.concatenate(seg_lists) if seg_lists else np.arange(n)
