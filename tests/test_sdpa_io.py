import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.io.sdpa import read_sdpa
from ltr_lowrank_sdp_tpu.problem import canonicalize, initial_ranks


def _write(tmp_path, text, name="toy.dat-s"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


TOY = """\
* toy problem
2
2
2 2
1.0 2.0
0 1 1 1 1.0
0 1 1 2 2.0
0 2 1 1 3.0
1 1 1 1 1.0
1 2 2 2 1.0
2 1 1 2 0.5
2 2 1 1 1.0
"""


def test_parse_toy(tmp_path):
    data = read_sdpa(_write(tmp_path, TOY))
    assert data.n_constrs == 2
    assert data.block_dims == [2, 2]
    np.testing.assert_allclose(data.b, [1.0, 2.0])
    blk0 = data.blocks[0]
    # objective negated
    i = np.lexsort((blk0.c_cols, blk0.c_rows))
    assert blk0.c_vals[i].tolist() == [-1.0, -2.0]
    # constraint 1 entry in block 0 at (0,0)
    assert blk0.a_cid.tolist().count(0) == 1


def test_parse_lp_block(tmp_path):
    text = """\
2
2
2 -3
1.0 2.0
0 1 1 1 1.0
0 2 1 1 5.0
1 1 1 1 1.0
1 2 2 2 2.0
2 2 3 3 1.0
"""
    data = read_sdpa(_write(tmp_path, text))
    assert data.n_lp_cols == 3
    assert len(data.blocks) == 1
    np.testing.assert_allclose(data.lp_c, [-5.0, 0.0, 0.0])
    # LP constraint entries: constraint 1 touches LP col 2 (0-based 1)
    assert data.lp_col.tolist() == [1, 2]
    assert data.lp_cid.tolist() == [0, 1]


def test_duplicates_sum(tmp_path):
    text = """\
1
1
2
1.0
1 1 1 2 1.0
1 1 2 1 2.0
"""
    data = read_sdpa(_write(tmp_path, text))
    blk = data.blocks[0]
    assert blk.a_vals.tolist() == [3.0]
    assert blk.a_rows.tolist() == [0]
    assert blk.a_cols.tolist() == [1]


def test_g11(g11_path):
    data = read_sdpa(g11_path)
    assert data.n_constrs == 800
    assert data.block_dims == [800]
    prob = canonicalize(data, name="G11")
    cone = prob.cones[0]
    assert cone.kind_a == "diag"
    assert cone.n_active == 800
    # rank heuristic: min(ceil(2*log(800)), sqrt(1600)+1)
    ranks, caps = initial_ranks(prob, times_log_rank=2.0)
    assert caps[0] == int(np.sqrt(1600)) + 1
    assert ranks[0] == int(np.ceil(2 * np.log(800)))
    # MaxCut: b = all ones, C = L/4 has negative off-diagonals after negation
    np.testing.assert_allclose(prob.b, np.ones(800))


def test_theta102(theta102_path):
    prob = canonicalize(read_sdpa(theta102_path), name="theta102")
    assert prob.m == 37467
    assert prob.cones[0].n == 500
    # dense C (all-ones-like), sparse-but-many constraints
    assert prob.cones[0].kind_c == "dense"
