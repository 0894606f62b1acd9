"""TPU-native conic operators.

The two hot operations of a Burer-Monteiro low-rank SDP solver are

* ``A(sym(UV^T))`` — constraint values: for every constraint matrix A_i,
  the inner product <A_i, (UV^T + VU^T)/2>;
* ``(c0·C + A*(w))·Y`` — apply the weighted coefficient sum to a factor.

The reference implements them per-coefficient through a vtable
(``lorads_sdp_data.c:750-1049``: ``mul_inner_rk_double`` / ``mul_rk`` /
``sdpDataWSum``) with BLAS calls per constraint.  Here they are re-designed as
*whole-cone* vectorized kernels over stacked COO triplets:

* constraint values  = gather factor rows -> fused multiply -> bucketed-ELL
  gather reduction over constraint ids (``ops/gatherseg.py``);
* adjoint application = gather-based SpMM over the symmetrized static
  pattern (:class:`EllSpMM`), or a dense n x n materialization followed by
  an MXU matmul when the union pattern is dense (mirroring the reference
  presolve decision, ``lorads_sdp_conic.c:1185-1392``).

No scatter-adds appear anywhere on the iteration path — XLA lowers scatter
to a serialized per-update loop on TPU, so every segment reduction is
re-expressed as static gathers (see ``gatherseg.py``).

Because an XLA gather costs ~7 ns per index regardless of row width, the
layout is chosen once at build time to *minimize gather indices* on the
iteration path:

* the objective C's values are static across a solve, so they are baked
  into dense ELL value tables — ``apply_c`` gathers only Y rows;
* with ``relabel=True`` the cone renumbers its vertex space to the SpMM
  bucket order (``spmm_relabel_order``) so the SpMM's output permutation
  is the identity.  Callers then hold factors in *internal* row order and
  convert at the problem boundary (``row_order`` / ``permute_rows_in`` /
  ``permute_rows_out``);
* for single-cone problems the constraint space can be relabeled too
  (``constr_order``): a MaxCut-family diag cone (every constraint one
  diagonal entry, cf. ``detectMaxCutProb``, ``lorads_solver.c:472-497``)
  then runs both hot ops with ZERO gathers — constraint values are
  ``diag_val * rowsum(U*V)`` and the adjoint is a row scale.

All index arrays are device-resident and sorted at build time so XLA can use
`indices_are_sorted` segment reductions.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import ConeData, LPConeData, SDPProblem
from .compsum import csum, cvdot
from .gatherseg import (EllSegSum, EllSpMM, spmm_relabel_order,
                        static_table)


class _SparseSym:
    """A stack of symmetric sparse matrices sharing one COO layout.

    Entries are the upper triangle (row <= col); symmetric completion is
    implicit.  Supports <.,sym(UV^T)> contraction and weighted S@Y where
    S = sum_i w_i A_i.
    """

    def __init__(self, rows, cols, vals, cid, n, num_seg, dtype):
        self.n = n
        self.num_seg = num_seg
        self.nnz = int(rows.size)
        # static_table: small tables embed into the HLO (host memory),
        # large ones are device-committed — see ops/gatherseg.py
        self.rows = static_table(rows, np.int32)
        self.cols = static_table(cols, np.int32)
        self.vals = static_table(vals, dtype)
        self.cid = static_table(cid, np.int32) if cid is not None else None
        off = rows != cols
        # off-diagonal entries count twice in <A, X> for symmetric X
        self.double_coef = static_table(np.where(off, 2.0 * vals, vals),
                                        dtype)
        self.spmm = (EllSpMM(rows, cols, n, vals=vals, cid=cid,
                             num_seg=num_seg, dtype=dtype)
                     if self.nnz else None)

    def contract(self, U, V):
        """Per-entry e = <sym(UV^T)>[row, col] * val * (2 if offdiag else 1).

        Returns the (nnz,) vector of contributions (segment-sum separately).
        When ``U is V`` the symmetric average is exact with half the
        gathers (gathers dominate: ~7ns/index on the VPU).
        """
        ur = U[self.rows]
        uc = U[self.cols]
        if U is V:
            e = jnp.sum(ur * uc, axis=-1)
        else:
            vc = V[self.cols]
            vr = V[self.rows]
            e = 0.5 * (jnp.sum(ur * vc, axis=-1) + jnp.sum(uc * vr, axis=-1))
        return self.double_coef * e

    def apply_static(self, Y, scale=None):
        """S @ Y with the static build-time values (e.g. the objective C)."""
        return self.spmm.apply(Y, scale=scale)

    def apply_constr(self, w, Y):
        """(Sum_i w_i A_i) @ Y for per-constraint weights w."""
        return self.spmm.apply_constr(w, Y)

    def apply_weighted(self, w_entry, Y):
        """S @ Y for per-entry weights (legacy path)."""
        return self.spmm.apply_weighted(w_entry, Y)


class ConeOps:
    """Device-resident operator bundle for one SDP cone.

    With ``relabel=True`` the vertex space is renumbered at build time so
    the hot SpMM writes its output in natural order (no final permutation
    gather); ``row_order[j]`` is the ORIGINAL row id at internal position
    ``j``.  With ``constr_relabel=True`` (granted by
    :func:`build_cone_ops_internal` for single-cone problems) a qualifying
    diag cone additionally renumbers the constraint space to match —
    ``constr_order[i]`` is the original constraint id at internal position
    ``i`` — making both hot ops fully elementwise.
    """

    def __init__(self, cone: ConeData, dtype=jnp.float64,
                 relabel: bool = False, constr_relabel: bool = False):
        self.n = cone.n
        self.m = cone.m
        self.dtype = dtype
        self.kind_a = cone.kind_a
        self.kind_c = cone.kind_c
        self.n_active = cone.n_active
        self.rank_max = cone.rank_max
        n = cone.n

        # ---- vertex relabeling (internal row order) ----
        self.row_order = None        # old row id per internal position
        new_of_old = None
        c_rows, c_cols, c_vals = cone.c_rows, cone.c_cols, cone.c_vals
        if relabel and c_rows.size:
            order = spmm_relabel_order(c_rows, c_cols, n)
            new_of_old = np.empty(n, np.int64)
            new_of_old[order] = np.arange(n)
            self.row_order = order
            r_new = new_of_old[c_rows]
            c_new = new_of_old[c_cols]
            # keep upper-triangle convention (row <= col) in the new ids
            swap = r_new > c_new
            c_rows = np.where(swap, c_new, r_new)
            c_cols = np.where(swap, r_new, c_new)

        # ---- objective C ----
        self.c_sparse = _SparseSym(
            c_rows, c_cols, c_vals, None, n, n, dtype
        )
        self.c_dense = None
        # materialize dense C whenever any dense compute path will need it
        if cone.kind_c == "dense" or cone.kind_a == "dense":
            C = np.zeros((n, n))
            np.add.at(C, (c_rows, c_cols), c_vals)
            off = c_rows != c_cols
            np.add.at(C, (c_cols[off], c_rows[off]), c_vals[off])
            self.c_dense = static_table(C, dtype)

        # ---- constraints ----
        self.a_sparse = None
        self.diag_idx = self.diag_val = self.diag_cid = None
        self.diag_identity = False   # zero-gather MaxCut fast path
        self.constr_order = None     # old constraint id per internal position
        if cone.kind_a == "diag":
            didx = (new_of_old[cone.diag_idx]
                    if new_of_old is not None else
                    np.asarray(cone.diag_idx, np.int64))
            dval = np.asarray(cone.diag_val)
            dcid = np.asarray(cone.diag_cid, np.int64)
            if (constr_relabel and didx.size == n and cone.m == n
                    and np.unique(didx).size == n
                    and np.unique(dcid).size == n):
                # every row carries exactly one constraint: renumber the
                # constraint space so constraint i == internal row i
                by_row = np.argsort(didx)
                self.constr_order = dcid[by_row]
                self.diag_identity = True
                self.diag_val = static_table(dval[by_row], dtype)
            else:
                self.diag_idx = static_table(didx, np.int32)
                self.diag_val = static_table(dval, dtype)
                self.diag_cid = static_table(dcid, np.int32)
                self.diag_seg = EllSegSum(dcid, int(dcid.size), cone.m)
                self.diag_row_seg = EllSegSum(didx, int(didx.size), n)
        else:
            a_rows, a_cols = cone.a_rows, cone.a_cols
            if new_of_old is not None and a_rows.size:
                r_new = new_of_old[a_rows]
                c_new = new_of_old[a_cols]
                swap = r_new > c_new
                a_rows = np.where(swap, c_new, r_new)
                a_cols = np.where(swap, r_new, c_new)
            self.a_sparse = _SparseSym(
                a_rows, a_cols, cone.a_vals, cone.a_cid,
                n, cone.m, dtype,
            )
            self.a_cid = static_table(cone.a_cid, np.int32)
            self.a_seg = EllSegSum(cone.a_cid, int(cone.a_cid.size), cone.m)

    # ------------------------------------------------------------------ #
    # boundary conversions (no-ops when relabel was off)
    # ------------------------------------------------------------------ #

    def permute_rows_in(self, X):
        """Original row order -> internal row order (host or device array)."""
        if self.row_order is None:
            return X
        return X[np.asarray(self.row_order)]

    def permute_rows_out(self, X):
        """Internal row order -> original row order."""
        if self.row_order is None:
            return X
        out = np.empty_like(np.asarray(X))
        out[np.asarray(self.row_order)] = np.asarray(X)
        return out

    # ------------------------------------------------------------------ #

    def constr_vals(self, U, V):
        """A(sym(UV^T)) over this cone's constraints -> (m,) vector (zeros
        off-cone).  Under ``diag_identity`` the result is in the INTERNAL
        (relabeled) constraint order — valid because constraint relabeling
        is only granted single-cone, where the caller permutes ``b`` and
        duals at the problem boundary (see ``build_cone_ops_internal``)."""
        if self.diag_identity:
            return self.diag_val * jnp.sum(U * V, axis=-1)
        if self.kind_a == "diag":
            e = jnp.sum(U[self.diag_idx] * V[self.diag_idx], axis=-1)
            return self.diag_seg(self.diag_val * e)
        contrib = self.a_sparse.contract(U, V)
        return self.a_seg(contrib)

    def constr_vals_pair(self, R, D):
        """(A(2 sym(RD^T)), A(DD^T)) — the ALM line-search pair q1-half/q2
        in ONE pass: the R/D row gathers are shared and the two segment
        sums ride a single batched (nnz, 2) reduction.  Equals
        ``(constr_vals(R, D) + constr_vals(D, R), constr_vals(D, D))``
        up to the symmetric-average algebra (identical in exact
        arithmetic; gathers dominate the cost at ~7ns/index)."""
        if self.diag_identity:
            rd = jnp.sum(R * D, axis=-1)
            dd = jnp.sum(D * D, axis=-1)
            return 2.0 * self.diag_val * rd, self.diag_val * dd
        if self.kind_a == "diag":
            Rg = R[self.diag_idx]
            Dg = D[self.diag_idx]
            rd = self.diag_val * jnp.sum(Rg * Dg, axis=-1)
            dd = self.diag_val * jnp.sum(Dg * Dg, axis=-1)
            both = self.diag_seg(jnp.stack([2.0 * rd, dd], axis=-1))
            return both[:, 0], both[:, 1]
        sp = self.a_sparse
        Rr, Rc = R[sp.rows], R[sp.cols]
        Dr, Dc = D[sp.rows], D[sp.cols]
        e_rd = jnp.sum(Rr * Dc, axis=-1) + jnp.sum(Rc * Dr, axis=-1)
        e_dd = jnp.sum(Dr * Dc, axis=-1)
        both = self.a_seg(jnp.stack(
            [sp.double_coef * e_rd, sp.double_coef * e_dd], axis=-1))
        return both[:, 0], both[:, 1]

    def cg_normal_matvec(self, fixed):
        """Matvec ``x -> x + A*(A(sym(x fixed^T))) fixed`` for the ADMM
        normal equations (``linSysProduct``, ``lorads_admm.c:471-486``),
        with every fixed-side gather hoisted OUT of the CG loop.

        ``fixed`` is constant across one CG solve, so its row gathers
        (contract side) and its bucket-table gathers (adjoint side) are
        precomputed here; each CG iteration then performs only the
        x-row gathers and the weight gather.  Gathers dominate this
        operator's cost (~0.36 ms per 126k-slot gather on the tunnel
        runtime), so halving the per-iteration gather count nearly
        halves the ADMM CG time.
        """
        if self.diag_identity:
            dv = self.diag_val

            def mv(x):
                w = dv * jnp.sum(x * fixed, axis=-1)
                return x + (dv * w)[:, None] * fixed

            return mv
        if self.kind_a == "diag":
            idx, dv, cid = self.diag_idx, self.diag_val, self.diag_cid
            Fg = fixed[idx]

            def mv(x):
                e = jnp.sum(x[idx] * Fg, axis=-1)
                w = self.diag_seg(dv * e)
                d = self.diag_row_seg(dv * w[cid])
                return x + d[:, None] * fixed

            return mv
        sp = self.a_sparse
        if sp is None or not sp.nnz:
            return lambda x: x
        spmm = sp.spmm
        Fr, Fc = fixed[sp.rows], fixed[sp.cols]
        Fg = [fixed[ct] for ct in spmm.col_tabs]   # (n_b, K, r) per bucket

        def mv(x):
            e = 0.5 * (jnp.sum(x[sp.rows] * Fc, axis=-1)
                       + jnp.sum(x[sp.cols] * Fr, axis=-1))
            w = self.a_seg(sp.double_coef * e)
            w_ext = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
            parts = []
            for ct, vt, fg in zip(spmm.cid_tabs, spmm.val_tabs, Fg):
                if ct.shape[1] == 0:
                    parts.append(jnp.zeros((ct.shape[0], x.shape[1]),
                                           x.dtype))
                    continue
                wt = w_ext[ct] * vt
                parts.append(jnp.einsum("bk,bkr->br", wt, fg,
                                        preferred_element_type=x.dtype))
            cat = (parts[0] if len(parts) == 1
                   else jnp.concatenate(parts, axis=0))
            out = cat if spmm.identity_pos else cat[spmm.pos]
            return x + out

        return mv

    def obj_value(self, U, V):
        """<C, sym(UV^T)> with a compensated final reduction (the duality
        gap must resolve 1e-5 relative on million-term f32 sums; see
        ``ops/compsum.py``)."""
        if self.kind_c == "dense" and self.c_dense is not None:
            # C symmetric => tr(C sym(UV^T)) = vdot(U, C @ V) averaged with
            # its transpose-pair; both are equal for symmetric C.
            CV = jnp.dot(self.c_dense, V, preferred_element_type=self.dtype)
            return 0.5 * (cvdot(U, CV) + cvdot(V, jnp.dot(
                self.c_dense, U, preferred_element_type=self.dtype)))
        return csum(self.c_sparse.contract(U, V))

    def apply_c(self, Y):
        """C @ Y (C symmetric) — the objective-only half of ``apply_w``.

        Used by the ALM inner loop to carry C·R across iterations: with the
        line-search direction D, one C·D gives both line-search objective
        coefficients (<C,sym(RDᵀ)> = <R, C·D>, <C,sym(DDᵀ)> = <D, C·D>) and
        the incremental gradient update C·(R+τD) = C·R + τ·C·D, removing
        the per-iteration objective gathers/SpMM entirely.

        C's values are static across a solve, so the SpMM uses dense ELL
        value tables — no weight gathers at all.
        """
        if self.c_dense is not None:
            return jnp.dot(self.c_dense, Y, preferred_element_type=self.dtype)
        if self.c_sparse.nnz:
            return self.c_sparse.apply_static(Y)
        return jnp.zeros_like(Y)

    def apply_a(self, w, Y):
        """A*(w) @ Y — the adjoint-only half of ``apply_w``.

        Always the sparse gather path: even when the presolve marks the
        w_sum representation dense (the reference materializes
        S = C + A*(w) once per gradient and calls BLAS dsymm,
        ``lorads_sdp_conic.c:608-616``), densifying S on TPU costs a
        full n^2 position gather PER CALL — measured 1.7 ms vs 0.23 ms
        for the direct slot-gather SpMM on theta102 (n=500, m=37k).
        The static objective C keeps its dense matmul separately in
        :meth:`apply_w`/:meth:`apply_c`.
        """
        if self.diag_identity:
            return (self.diag_val * w)[:, None] * Y
        if self.kind_a == "diag":
            d = self.diag_row_seg(self.diag_val * w[self.diag_cid])
            return d[:, None] * Y
        if self.a_sparse is not None and self.a_sparse.nnz:
            return self.a_sparse.apply_constr(w, Y)
        return jnp.zeros_like(Y)

    def apply_w(self, w, Y, obj_coef=1.0, include_obj=None):
        """(obj_coef*C + A*(w)) @ Y  — the ``mul_rk`` hot kernel.

        ``include_obj`` is the *static* switch (whether C participates at
        all); ``obj_coef`` may be a traced scalar (objective rescaling
        during reopt, cf. ``objScale_dualvar``, ``lorads_solver.c:1437-1452``).
        When ``include_obj`` is None it is inferred from a literal
        ``obj_coef == 0.0``.
        """
        if include_obj is None:
            include_obj = not (isinstance(obj_coef, float) and obj_coef == 0.0)
        out = self.apply_a(w, Y)
        if include_obj:
            if self.c_dense is not None:
                out = out + obj_coef * jnp.dot(
                    self.c_dense, Y, preferred_element_type=self.dtype
                )
            elif self.c_sparse.nnz:
                out = out + self.c_sparse.apply_static(Y, scale=obj_coef)
        return out

    def cid_for_entries(self):
        return self.a_cid

    # flops of one constr_vals evaluation (for speed-of-light accounting)
    def constr_flops(self, rank: int) -> int:
        if self.kind_a == "diag":
            return 2 * self.n_active * rank
        return 6 * self.a_sparse.nnz * rank

    def apply_flops(self, rank: int) -> int:
        nnz_a = 0 if self.a_sparse is None else self.a_sparse.nnz
        obj = (2 * self.n * self.n * rank if self.c_dense is not None
               else 4 * self.c_sparse.nnz * rank)
        return 4 * nnz_a * rank + obj + 2 * self.n * rank


class LPOps:
    """LP cone operators: x_j = u_j v_j over nonnegative columns."""

    def __init__(self, lp: LPConeData, dtype=jnp.float64):
        self.n_cols = lp.n_cols
        self.m = lp.m
        self.dtype = dtype
        self.c = static_table(lp.c, dtype)
        self.col = static_table(lp.col, np.int32)
        self.cid = static_table(lp.cid, np.int32)
        self.vals = static_table(lp.vals, dtype)
        self.nrm2sq = static_table(lp.nrm2sq, dtype)
        self.cid_seg = EllSegSum(lp.cid, int(lp.cid.size), lp.m)
        self.col_seg = EllSegSum(lp.col, int(lp.col.size), lp.n_cols)

    def constr_vals(self, u, v):
        """A_lp(diag(u v)) as a global (m,) vector."""
        x = u * v
        return self.cid_seg(self.vals * x[self.col])

    def obj_value(self, u, v):
        return cvdot(self.c, u * v)

    def weighted_col_sums(self, w, obj_coef=1.0):
        """Per-column (obj_coef*c_j + sum_i w_i A_ij) — the LP analog of
        C + A*(w)."""
        return obj_coef * self.c + self.col_seg(self.vals * w[self.cid])


def build_cone_ops(prob: SDPProblem, dtype=jnp.float64):
    """Original-order operator bundles (no relabeling) — public helper."""
    cones = [ConeOps(c, dtype) for c in prob.cones]
    lp = LPOps(prob.lp, dtype) if prob.lp is not None else None
    return cones, lp


def build_cone_ops_internal(prob: SDPProblem, dtype=jnp.float64):
    """Relabel-optimized operator bundles for the solver's internal state.

    Returns ``(cones, lp, constr_order)`` where ``constr_order`` is either
    None (constraint space in original order) or the (m,) map internal->
    original constraint id; the caller must then permute ``b`` by it and
    un-permute duals at egress.  Constraint relabeling is only granted for
    single-SDP-cone problems without an LP cone (the constraint space is
    shared across cones).
    """
    allow_constr = len(prob.cones) == 1 and prob.lp is None
    cones = [ConeOps(c, dtype, relabel=True, constr_relabel=allow_constr)
             for c in prob.cones]
    lp = LPOps(prob.lp, dtype) if prob.lp is not None else None
    constr_order = cones[0].constr_order if allow_constr and cones else None
    return cones, lp, constr_order


# --------------------------------------------------------------------------- #
# Whole-problem helpers (used by both solver phases)
# --------------------------------------------------------------------------- #


def all_constr_vals(cones: List[ConeOps], lp: Optional[LPOps], U, V, ulp=None,
                    vlp=None):
    """Sum of per-cone A(sym(U_k V_k^T)) (+ LP part) -> (m,)."""
    m = cones[0].m if cones else lp.m
    dtype = cones[0].dtype if cones else lp.dtype
    out = jnp.zeros(m, dtype)
    for ops, u, v in zip(cones, U, V):
        out = out + ops.constr_vals(u, v)
    if lp is not None and ulp is not None:
        out = out + lp.constr_vals(ulp, vlp)
    return out


def all_obj_value(cones: List[ConeOps], lp: Optional[LPOps], U, V, ulp=None,
                  vlp=None):
    total = jnp.asarray(0.0, cones[0].dtype if cones else lp.dtype)
    for ops, u, v in zip(cones, U, V):
        total = total + ops.obj_value(u, v)
    if lp is not None and ulp is not None:
        total = total + lp.obj_value(ulp, vlp)
    return total


def all_obj_and_constr(cones, lp, U, V, ulp=None, vlp=None):
    return (
        all_obj_value(cones, lp, U, V, ulp, vlp),
        all_constr_vals(cones, lp, U, V, ulp, vlp),
    )


# --------------------------------------------------------------------------- #
# Dense reference implementations (tests / tiny problems only)
# --------------------------------------------------------------------------- #


def dense_constraint_matrices(cone: ConeData) -> np.ndarray:
    """(m, n, n) dense symmetric stack — for unit tests only."""
    A = np.zeros((cone.m, cone.n, cone.n))
    np.add.at(A, (cone.a_cid, cone.a_rows, cone.a_cols), cone.a_vals)
    off = cone.a_rows != cone.a_cols
    np.add.at(
        A, (cone.a_cid[off], cone.a_cols[off], cone.a_rows[off]),
        cone.a_vals[off],
    )
    return A


def dense_objective_matrix(cone: ConeData) -> np.ndarray:
    C = np.zeros((cone.n, cone.n))
    np.add.at(C, (cone.c_rows, cone.c_cols), cone.c_vals)
    off = cone.c_rows != cone.c_cols
    np.add.at(C, (cone.c_cols[off], cone.c_rows[off]), cone.c_vals[off])
    return C
