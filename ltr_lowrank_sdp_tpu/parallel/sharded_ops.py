"""Constraint-sharded conic operators (shard_map + psum over ICI).

Single-huge-instance data layout: the stacked COO entry list of a cone is
padded to a multiple of the ``constr`` mesh axis and split across devices;
the n x r factors stay replicated (for n = 1M, r = 20 a replicated f32
factor is 80 MB — comfortably within HBM).  Then:

* ``A(sym(UV^T))``: each device gathers its local factor rows, reduces its
  local entries into a full (m,) vector, and one ``psum`` over the
  ``constr`` axis produces the replicated result;
* ``A*(w) @ Y``: each device scatter-adds its local weighted entries into a
  full (n, r) output; one ``psum`` completes the adjoint.

Communication per operator application = one all-reduce of the output —
the minimal collective for this decomposition, riding ICI.  This mirrors
"shard the contraction axis, psum the output" from the standard SPMD
recipe; there is no reference equivalent (the reference is single-process C,
SURVEY.md §5.8).
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


class ShardedConeData(NamedTuple):
    """COO entries padded & split along the constr axis; leading dim = shards."""

    rows: jnp.ndarray      # (S, nnz_local)
    cols: jnp.ndarray
    vals: jnp.ndarray      # padded entries have val 0
    cid: jnp.ndarray
    double_coef: jnp.ndarray  # val * (2 - isdiag); 0 on padding
    off_vals: jnp.ndarray     # val on off-diagonal entries, else 0
    n: int
    m: int


def shard_cone_entries(cone: ConeData, n_shards: int, dtype=jnp.float64,
                       include_obj_in_constr: bool = False) -> ShardedConeData:
    rows, cols, vals, cid = (
        cone.a_rows, cone.a_cols, cone.a_vals, cone.a_cid,
    )
    nnz = rows.size
    pad = (-nnz) % n_shards
    rows = np.concatenate([rows, np.zeros(pad, rows.dtype)])
    cols = np.concatenate([cols, np.zeros(pad, cols.dtype)])
    vals = np.concatenate([vals, np.zeros(pad)])
    cid = np.concatenate([cid, np.zeros(pad, cid.dtype)])
    off = rows != cols
    double_coef = np.where(off, 2.0 * vals, vals)
    off_vals = np.where(off, vals, 0.0)
    shape = (n_shards, (nnz + pad) // n_shards)
    return ShardedConeData(
        rows=jnp.asarray(rows.reshape(shape), jnp.int32),
        cols=jnp.asarray(cols.reshape(shape), jnp.int32),
        vals=jnp.asarray(vals.reshape(shape), dtype),
        cid=jnp.asarray(cid.reshape(shape), jnp.int32),
        double_coef=jnp.asarray(double_coef.reshape(shape), dtype),
        off_vals=jnp.asarray(off_vals.reshape(shape), dtype),
        n=cone.n, m=cone.m,
    )


def sharded_constr_vals(mesh: Mesh, data: ShardedConeData, U, V,
                        axis: str = "constr"):
    """A(sym(UV^T)) with entries sharded over ``axis``; result replicated."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def f(dcoef, rows, cols, cid, U, V):
        dcoef, rows, cols, cid = (
            dcoef[0], rows[0], cols[0], cid[0],
        )
        ur = U[rows]
        vc = V[cols]
        uc = U[cols]
        vr = V[rows]
        e = 0.5 * (jnp.sum(ur * vc, -1) + jnp.sum(uc * vr, -1))
        local = jax.ops.segment_sum(dcoef * e, cid, num_segments=data.m)
        return jax.lax.psum(local, axis)

    return f(data.double_coef, data.rows, data.cols, data.cid, U, V)


def sharded_apply_w(mesh: Mesh, data: ShardedConeData, w, Y,
                    axis: str = "constr"):
    """A*(w) @ Y with entries sharded over ``axis``; result replicated."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def f(vals, off_vals, rows, cols, cid, w, Y):
        vals, off_vals, rows, cols, cid = (
            vals[0], off_vals[0], rows[0], cols[0], cid[0],
        )
        wv = vals * w[cid]
        wv_off = off_vals * w[cid]
        out = jnp.zeros((data.n, Y.shape[1]), Y.dtype)
        out = out.at[rows].add(wv[:, None] * Y[cols])
        out = out.at[cols].add(wv_off[:, None] * Y[rows])
        return jax.lax.psum(out, axis)

    return f(data.vals, data.off_vals, data.rows, data.cols, data.cid, w, Y)
