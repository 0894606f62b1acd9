import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.models.net import (
    ModelConfig, RankSchedulePredictor, count_parameters, get_valid_schedule,
)
from ltr_lowrank_sdp_tpu.models.loss import rank_schedule_loss, LossWeights
from ltr_lowrank_sdp_tpu.data.loader import (
    GraphSample, collate, extract_rank_schedule, pad_schedule,
    classify_schedule_type,
)


def make_batch(rng, B=3, nodes=10, edges=20):
    samples = []
    for i in range(B):
        m = nodes + i
        e = edges
        ei = rng.integers(0, m, size=(2, e)).astype(np.int64)
        samples.append(GraphSample(
            name=f"g{i}",
            x=rng.normal(size=(m, 16)).astype(np.float32),
            edge_index=ei,
            edge_attr=rng.normal(size=(e, 5)).astype(np.float32),
            global_attr=rng.normal(size=(17,)).astype(np.float32),
            schedule=np.array([3, 5, 8] + [0] * 13, np.float32),
            mask=np.array([1, 1, 1] + [0] * 13, np.float32),
            length=3,
        ))
    return collate(samples, node_mult=64, edge_mult=64)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(hidden_dim=32, edge_dim=16, global_dim=16,
                      num_gnn_layers=2, decoder_hidden_dim=32)
    model = RankSchedulePredictor(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.array(batch.x), jnp.array(batch.edge_index),
        jnp.array(batch.edge_attr), jnp.array(batch.batch),
        jnp.array(batch.global_attr), batch.num_graphs,
    )
    return cfg, model, params, batch


def test_forward_shapes(model_and_params):
    cfg, model, params, batch = model_and_params
    preds, length_logits, init_rank = model.apply(
        params, jnp.array(batch.x), jnp.array(batch.edge_index),
        jnp.array(batch.edge_attr), jnp.array(batch.batch),
        jnp.array(batch.global_attr), batch.num_graphs,
    )
    B = batch.num_graphs
    assert preds.shape == (B, cfg.max_seq_len)
    assert length_logits.shape == (B, cfg.max_seq_len)
    assert init_rank.shape == (B, 1)
    assert np.all(np.asarray(preds) > 0)  # exp of clamped log-rank
    assert np.all(np.asarray(preds) <= np.exp(10.0) + 1)
    assert np.all(np.asarray(init_rank) >= 1.0)  # softplus + min_rank


def test_predict_and_valid_schedule(model_and_params):
    cfg, model, params, batch = model_and_params
    schedule, lengths = model.apply(
        params, jnp.array(batch.x), jnp.array(batch.edge_index),
        jnp.array(batch.edge_attr), jnp.array(batch.batch),
        jnp.array(batch.global_attr), batch.num_graphs,
        method=RankSchedulePredictor.predict,
    )
    assert schedule.shape == (batch.num_graphs, cfg.max_seq_len)
    valid = get_valid_schedule(schedule, lengths)
    assert len(valid) == batch.num_graphs
    for v, L in zip(valid, np.asarray(lengths)):
        assert len(v) == int(L)
        assert all(r >= 1 for r in v)


def test_loss_components(model_and_params):
    cfg, model, params, batch = model_and_params
    preds, length_logits, init_rank = model.apply(
        params, jnp.array(batch.x), jnp.array(batch.edge_index),
        jnp.array(batch.edge_attr), jnp.array(batch.batch),
        jnp.array(batch.global_attr), batch.num_graphs,
        target_schedule=jnp.array(batch.schedule),
        teacher_forcing_ratio=1.0,
    )
    total, comps = rank_schedule_loss(
        preds, jnp.array(batch.schedule), length_logits,
        jnp.array(batch.length), jnp.array(batch.mask), init_rank,
    )
    assert np.isfinite(float(total))
    for k in ("schedule_loss", "length_loss", "mono_loss", "init_loss",
              "final_loss"):
        assert float(comps[k]) >= 0.0

    # perfect predictions drive schedule/init/final terms to ~0
    perfect = jnp.array(batch.schedule).clip(min=1e-6)
    total_p, comps_p = rank_schedule_loss(
        perfect, jnp.array(batch.schedule), length_logits,
        jnp.array(batch.length), jnp.array(batch.mask),
        perfect[:, :1],
    )
    assert float(comps_p["schedule_loss"]) < 1e-8
    assert float(comps_p["final_loss"]) < 1e-8


def test_gradients_flow(model_and_params):
    cfg, model, params, batch = model_and_params

    def loss_fn(p):
        preds, ll, ir = model.apply(
            p, jnp.array(batch.x), jnp.array(batch.edge_index),
            jnp.array(batch.edge_attr), jnp.array(batch.batch),
            jnp.array(batch.global_attr), batch.num_graphs,
            target_schedule=jnp.array(batch.schedule),
            teacher_forcing_ratio=1.0,
        )
        total, _ = rank_schedule_loss(
            preds, jnp.array(batch.schedule), ll,
            jnp.array(batch.length), jnp.array(batch.mask), ir,
        )
        return total

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(x))
             for x in jax.tree_util.tree_leaves(g)]
    assert sum(norms) > 0
    assert all(np.isfinite(n) for n in norms)
    assert count_parameters(params) > 1000


def test_schedule_utils():
    traj = {
        "phase_1": {"oracle_rank": [5, 5, 7, 7, 7]},
        "phase_2": {"oracle_rank": [7, 9, 9]},
    }
    assert extract_rank_schedule(traj) == [5, 7, 9]
    assert classify_schedule_type([5, 7, 9]) == "increasing"
    assert classify_schedule_type([9, 7]) == "decreasing"
    assert classify_schedule_type([5, 7, 6]) == "mixed"
    padded, L = pad_schedule([5, 7, 9], 6)
    assert padded == [5, 7, 9, 0, 0, 0] and L == 3
