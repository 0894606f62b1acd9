"""Standalone constraint-sharded operators (compat layer over meshops).

Historical entry point kept for its simple functional API; the kernels are
the shard-uniform bucketed-ELL gather reductions of
:mod:`~ltr_lowrank_sdp_tpu.parallel.meshops` — NO scatter-adds (XLA lowers
scatter to a serialized per-update loop on TPU; see ``ops/gatherseg.py``).
The production solver integrates sharding through
:class:`~ltr_lowrank_sdp_tpu.parallel.meshops.MeshConeOps` instead (pass a
``mesh`` to :class:`~ltr_lowrank_sdp_tpu.solver.driver.Solver`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..problem import ConeData
from .meshops import ShardTables, build_shard_tables, _local_reduce, \
    _local_spmm


class ShardedConeData(NamedTuple):
    """Gather-ELL shard tables for both hot ops of one cone."""

    cv: ShardTables      # constraint-value reduction, sharded by constraint
    mm: ShardTables      # adjoint SpMM, sharded by output row
    n: int
    m: int


def shard_cone_entries(cone: ConeData, n_shards: int,
                       dtype=jnp.float64) -> ShardedConeData:
    rows = np.asarray(cone.a_rows, np.int64)
    cols = np.asarray(cone.a_cols, np.int64)
    vals = np.asarray(cone.a_vals, np.float64)
    cid = np.asarray(cone.a_cid, np.int64)
    cv = build_shard_tables(rows, cols, vals, cid, cid, cone.m, n_shards,
                            dtype)
    off = rows != cols
    s_rows = np.concatenate([rows, cols[off]])
    s_cols = np.concatenate([cols, rows[off]])
    s_vals = np.concatenate([vals, vals[off]])
    s_cid = np.concatenate([cid, cid[off]])
    mm = build_shard_tables(s_rows, s_cols, s_vals, s_cid, s_rows, cone.n,
                            n_shards, dtype)
    return ShardedConeData(cv=cv, mm=mm, n=cone.n, m=cone.m)


def sharded_constr_vals(mesh: Mesh, data: ShardedConeData, U, V,
                        axis: str = "constr"):
    """A(sym(UV^T)) with entries sharded over ``axis``; result replicated."""
    t = data.cv

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                       P(), P()),
             out_specs=P())
    def f(dcoef, srows, scols, spos, tabs, U, V):
        dcoef, srows, scols, spos = dcoef[0], srows[0], scols[0], spos[0]
        tabs = [tt[0] for tt in tabs]
        e = 0.5 * (jnp.sum(U[srows] * V[scols], -1)
                   + jnp.sum(U[scols] * V[srows], -1))
        return jax.lax.psum(_local_reduce(dcoef * e, tabs, spos, t.T), axis)

    return f(t.slot_dcoef, t.slot_rows, t.slot_cols, t.pos, list(t.tabs),
             U, V)


def sharded_apply_w(mesh: Mesh, data: ShardedConeData, w, Y,
                    axis: str = "constr"):
    """A*(w) @ Y with slots sharded by output row; result replicated."""
    t = data.mm

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                       P(), P()),
             out_specs=P())
    def f(svals, scid, scols, spos, tabs, w, Y):
        svals, scid, scols, spos = svals[0], scid[0], scols[0], spos[0]
        tabs = [tt[0] for tt in tabs]
        w_ext = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        wv = svals * w_ext[scid]
        w_tabs = [wv[tt] for tt in tabs]
        col_tabs = [scols[tt] for tt in tabs]
        return jax.lax.psum(_local_spmm(w_tabs, col_tabs, Y, spos), axis)

    return f(t.slot_vals, t.slot_cid, t.slot_cols, t.pos, list(t.tabs),
             w, Y)
