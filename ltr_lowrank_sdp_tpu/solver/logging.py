"""Trajectory recording, oracle rank, and schema-compatible JSON output.

The JSON schema matches the reference's ``lorads_write_json_output``
(``lorads_logging.c:618-712``) byte-for-byte in structure, because that JSON
is the *training-label interface* consumed by the dataset loader
(``dataset/loader.py:18-45``): ``{"problem_id", "file_path",
"metrics": {oracle_rank, primal_obj, ...}, "trajectory": {"phase_1":
{"curr_rank": [...], "oracle_rank": [...]}, "phase_2": {...}}}``.

Oracle rank = number of eigenvalues of the factor Gram matrix above
``eps * lambda_max`` (``count_significant_from_matrix``,
``lorads_logging.c:272-366``), computed with an r x r ``eigh`` on device —
tiny compared to the solve.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import OracleRankMethod, SolverParams
from ..ops.lanczos import oracle_rank_gram, oracle_rank_naive


@dataclasses.dataclass
class TrajectoryLogger:
    params: SolverParams
    problem_name: str = ""
    file_path: str = ""
    log_file: Optional[str] = None
    verbose: bool = True
    phase1_curr: List[int] = dataclasses.field(default_factory=list)
    phase1_oracle: List[int] = dataclasses.field(default_factory=list)
    phase2_curr: List[int] = dataclasses.field(default_factory=list)
    phase2_oracle: List[int] = dataclasses.field(default_factory=list)
    solve_start: float = 0.0
    _fh: Optional[object] = None

    def open(self):
        self.solve_start = time.time()
        if self.log_file:
            self._fh = open(self.log_file, "a")
        return self

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def log(self, msg: str):
        if self.verbose:
            sys.stdout.write(msg)
        if self._fh:
            self._fh.write(msg)
            self._fh.flush()

    # ------------------------------------------------------------------ #

    def oracle_rank(self, factors, phase: int, avg_with=None) -> int:
        """Total oracle rank across cones (phase 1: R; phase 2: (U+V)/2)."""
        if self.params.disable_oracle:
            return 0
        eps = self.params.oracle_eps
        total = 0
        for i, f in enumerate(factors):
            g = f if avg_with is None else 0.5 * (f + avg_with[i])
            if self.params.oracle_rank_method == OracleRankMethod.NAIVE:
                total += int(oracle_rank_naive(g, eps))
            else:
                total += int(oracle_rank_gram(g, eps))
        return total

    def record_alm(self, carry, outer_iter, inner_iter, phase_time):
        curr = sum(int(r.shape[1]) for r in carry.R)
        oracle = self.oracle_rank(carry.R, 1)
        self.phase1_curr.append(curr)
        self.phase1_oracle.append(oracle)
        self.log(
            "ALM OuterIter:%d InnerIter:%d pObj:%5.5e dObj:%5.5e "
            "pInfea(1):%5.5e pInfea(Inf):%5.5e pdGap:%5.5e rho:%3.2f "
            "CurrRank:%d OracleRank:%d Time:%3.2f\n"
            % (
                outer_iter, inner_iter, float(carry.pobj), float(carry.dobj),
                float(carry.pinf_l1), float(carry.pinf_inf),
                float(carry.gap), float(carry.rho), curr, oracle, phase_time,
            )
        )

    def record_admm(self, carry, it, cg_iter, rho, phase_time):
        curr = sum(int(u.shape[1]) for u in carry.U)
        oracle = self.oracle_rank(carry.U, 2, avg_with=carry.V)
        self.phase2_curr.append(curr)
        self.phase2_oracle.append(oracle)
        nblk = max(1, len(carry.U))
        self.log(
            "ADMM Iter:%d pObj:%5.5e dObj:%5.5e pInfea(1):%5.5e "
            "pInfea(Inf):%5.5e pdGap:%5.5e rho:%3.2f cgIter:%d CurrRank:%d "
            "OracleRank:%d Time:%3.2f\n"
            % (
                it, float(carry.pobj), float(carry.dobj),
                float(carry.pinf_l1), float(carry.pinf_inf), float(carry.gap),
                rho, cg_iter // nblk, curr, oracle, phase_time,
            )
        )

    # ------------------------------------------------------------------ #

    def write_json(self, path, final_oracle_rank, pobj, dobj, pinf_l1,
                   pinf_inf, gap, solve_time, rho_max, heuristic_factor):
        payload = {
            "problem_id": self.problem_name,
            "file_path": self.file_path,
            "metrics": {
                "oracle_rank": int(final_oracle_rank),
                "primal_obj": float(pobj),
                "dual_obj": float(dobj),
                "constr_violation_l1": float(pinf_l1),
                "constr_violation_inf": float(pinf_inf),
                "primal_dual_gap": float(gap),
                "solve_time_sec": float(solve_time),
                "rho_max": float(rho_max),
                "heuristic_factor": float(heuristic_factor),
            },
            "trajectory": {
                "phase_1": {
                    "curr_rank": self.phase1_curr,
                    "oracle_rank": self.phase1_oracle,
                },
                "phase_2": {
                    "curr_rank": self.phase2_curr,
                    "oracle_rank": self.phase2_oracle,
                },
            },
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        self.log(f"JSON output written to: {path}\n")
