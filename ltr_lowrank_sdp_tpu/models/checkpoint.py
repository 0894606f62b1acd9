"""Checkpoint save/load for the rank predictor (Flax msgpack + config.json).

Loading tolerates a missing/partial config by falling back to defaults and a
sibling ``config.json``, mirroring the reference loaders
(``infer.py:27-83``, ``benchmark.py:48-73``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .net import ModelConfig, RankSchedulePredictor


def save_checkpoint(path_dir: str, params, cfg: ModelConfig, extra=None):
    os.makedirs(path_dir, exist_ok=True)
    with open(os.path.join(path_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    payload = {"model_config": cfg.to_dict()}
    if extra:
        payload.update(extra)
    with open(os.path.join(path_dir, "config.json"), "w") as f:
        json.dump(payload, f, indent=2)


def load_model(ckpt: str) -> Tuple[RankSchedulePredictor, dict, ModelConfig]:
    """ckpt: directory containing model.msgpack (+config.json), or the
    msgpack file itself."""
    if os.path.isdir(ckpt):
        msgpack_path = os.path.join(ckpt, "model.msgpack")
        cfg_path = os.path.join(ckpt, "config.json")
    else:
        msgpack_path = ckpt
        cfg_path = os.path.join(os.path.dirname(ckpt), "config.json")

    cfg = ModelConfig()
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            payload = json.load(f)
        cfg = ModelConfig.from_dict(payload.get("model_config", payload))

    model = RankSchedulePredictor(cfg)
    # build a params template with a tiny dummy graph, then overwrite
    dummy_n, dummy_e, B = 4, 6, 1
    rng = jax.random.PRNGKey(0)
    template = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((dummy_n, cfg.node_in_dim)),
        jnp.zeros((2, dummy_e), jnp.int32),
        jnp.zeros((dummy_e, cfg.edge_in_dim)),
        jnp.zeros((dummy_n,), jnp.int32),
        jnp.zeros((B, cfg.global_in_dim)),
        B,
    )
    with open(msgpack_path, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    # from_bytes keeps the SAVED dtypes: checkpoints written under x64
    # restore float64 leaves, which poison downstream jit carries (the
    # lax.scan decoder requires a dtype-stable carry) — normalize every
    # leaf to the template's dtype
    params = jax.tree.map(
        lambda t, p: jnp.asarray(p, t.dtype), template, params)
    return model, params, cfg


def predict_schedule_for_graph(model, params, graph: dict,
                               min_rank: int = 1):
    """Run the predictor on one graph dict (processor output).

    Returns (schedule list[int], length int).
    """
    x = jnp.asarray(graph["x"], jnp.float32)
    ei = jnp.asarray(graph["edge_index"], jnp.int32)
    ea = jnp.asarray(graph["edge_attr"], jnp.float32)
    g = jnp.asarray(graph["global_attr"], jnp.float32).reshape(1, -1)
    batch = jnp.zeros((x.shape[0],), jnp.int32)
    sched, lengths = model.apply(
        params, x, ei, ea, batch, g, 1,
        method=RankSchedulePredictor.predict,
    )
    L = int(np.asarray(lengths)[0])
    s = np.maximum(np.round(np.asarray(sched)[0, :L]), min_rank).astype(int)
    return s.tolist(), L
