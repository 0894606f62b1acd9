"""End-to-end ML pipeline test: generate -> solve+harvest -> process ->
train a few steps -> predict -> inject schedule into the solver."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def harvest_root(tmp_path_factory):
    """Generate tiny instances, solve them with trajectory logging, and
    process graphs — a miniature of scripts/harvest.py."""
    root = tmp_path_factory.mktemp("ds")
    (root / "instances").mkdir()
    (root / "sol_json").mkdir()
    (root / "proc").mkdir()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.gen_instances import gen_maxcut
    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import solve
    from ltr_lowrank_sdp_tpu.data.processor import process_sdpa_to_graph

    names = []
    for i in range(4):
        name = f"mc_{i}"
        path = str(root / "instances" / f"{name}.dat-s")
        gen_maxcut(24 + 4 * i, 4, seed=i, out=path)
        prob = load_problem(path)
        params = SolverParams(phase1_tol=1e-2, heuristic_factor=10.0,
                              reopt_level=1)
        solve(prob, params, json_path=str(root / "sol_json" / f"{name}.json"))
        process_sdpa_to_graph(path, str(root / "proc" / f"{name}.npz"))
        names.append(name)
    return root, names


def test_harvested_labels(harvest_root):
    root, names = harvest_root
    from ltr_lowrank_sdp_tpu.data.loader import SDPDataset

    ds = SDPDataset(str(root))
    assert len(ds) == 4
    s = ds.get(0)
    assert s is not None
    assert s.x.shape[1] == 16
    assert s.edge_attr.shape[1] == 5
    assert s.global_attr.shape == (17,)
    assert s.length >= 1
    assert s.schedule[0] >= 1


def test_train_steps_and_inject(harvest_root, tmp_path):
    root, names = harvest_root
    import jax
    import jax.numpy as jnp
    import optax

    from ltr_lowrank_sdp_tpu.data.loader import SDPDataset, collate
    from ltr_lowrank_sdp_tpu.models.net import ModelConfig, RankSchedulePredictor
    from ltr_lowrank_sdp_tpu.models.loss import rank_schedule_loss
    from ltr_lowrank_sdp_tpu.models.checkpoint import (
        save_checkpoint, load_model, predict_schedule_for_graph,
    )

    ds = SDPDataset(str(root))
    batch = collate([ds.get(i) for i in range(len(ds))], node_mult=32,
                    edge_mult=64)
    cfg = ModelConfig(hidden_dim=16, edge_dim=8, global_dim=8,
                      num_gnn_layers=1, num_heads=2, decoder_hidden_dim=16,
                      decoder_num_layers=1)
    model = RankSchedulePredictor(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.array(batch.x), jnp.array(batch.edge_index),
        jnp.array(batch.edge_attr), jnp.array(batch.batch),
        jnp.array(batch.global_attr), batch.num_graphs,
    )
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p):
        preds, ll, ir = model.apply(
            p, jnp.array(batch.x), jnp.array(batch.edge_index),
            jnp.array(batch.edge_attr), jnp.array(batch.batch),
            jnp.array(batch.global_attr), batch.num_graphs,
            target_schedule=jnp.array(batch.schedule),
            teacher_forcing_ratio=1.0)
        total, _ = rank_schedule_loss(
            preds, jnp.array(batch.schedule), ll, jnp.array(batch.length),
            jnp.array(batch.mask), ir)
        return total

    l0 = float(loss_fn(params))
    step = jax.jit(lambda p, o: _update(p, o))

    def _update(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    for _ in range(20):
        params, opt, l = _update(params, opt)
    assert float(l) < l0  # optimizing

    # checkpoint round-trip + prediction
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, params, cfg)
    model2, params2, cfg2 = load_model(ckpt)
    s = ds.get(0)
    graph = {"x": s.x, "edge_index": s.edge_index, "edge_attr": s.edge_attr,
             "global_attr": s.global_attr}
    sched, L = predict_schedule_for_graph(model2, params2, graph)
    assert len(sched) == L >= 1
    assert all(r >= 1 for r in sched)

    # inject the predicted schedule into the solver
    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import solve

    inst = str(root / "instances" / f"{names[0]}.dat-s")
    prob = load_problem(inst)
    res = solve(prob, SolverParams(
        rank_schedule=sched, near_stall_factor=0.7, phase1_tol=1e-2,
        heuristic_factor=10.0, reopt_level=1))
    assert res.pinf_l1 < 1e-4
