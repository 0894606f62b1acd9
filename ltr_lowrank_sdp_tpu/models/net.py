"""GNN encoder + rank-schedule predictor (Flax).

Architecture contract matches the reference (``model/net.py``):
encoders for the 16/5/17 feature sets, ``num_gnn_layers`` x GATv2
(heads x (hidden/heads), concat, edge features, residual + LayerNorm +
LeakyReLU(0.2) + dropout), graph embedding = concat[mean-pool, max-pool,
attention-pool, encoded-global] of dim 3*hidden + global_dim, and the
autoregressive LSTM sequence decoder.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .gatv2 import GATv2Conv
from .layers import (
    AttentionPooling,
    EdgeEncoder,
    GlobalEncoder,
    NodeEncoder,
    SequenceDecoder,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    node_in_dim: int = 16
    edge_in_dim: int = 5
    global_in_dim: int = 17
    hidden_dim: int = 128
    edge_dim: int = 64
    global_dim: int = 64
    num_gnn_layers: int = 4
    num_heads: int = 4
    decoder_hidden_dim: int = 128
    decoder_num_layers: int = 2
    max_seq_len: int = 16
    dropout: float = 0.1
    norm_type: str = "layer"

    def to_dict(self):
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d):
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        return ModelConfig(**{k: v for k, v in d.items() if k in known})


class GNNEncoder(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, batch, global_attr,
                 num_graphs, *, deterministic=True):
        cfg = self.cfg
        x = NodeEncoder(cfg.hidden_dim, cfg.dropout, cfg.norm_type)(
            x, deterministic=deterministic)
        e = EdgeEncoder(cfg.edge_dim, cfg.dropout, cfg.norm_type)(
            edge_attr, deterministic=deterministic)
        g = GlobalEncoder(cfg.global_dim, cfg.dropout, cfg.norm_type)(
            global_attr, deterministic=deterministic)

        # rematerialize each GAT layer in the backward pass: per-EDGE
        # activations dominate training memory (MC_600x600_r5 alone is
        # 2.5M edges -> the un-rematted 16-graph batch needed 16.5G HBM
        # and OOM'd the 15.75G chip); recomputing them costs one extra
        # forward per layer and caps live memory at ~one layer's edges
        RematGAT = nn.remat(GATv2Conv, static_argnums=(4,))
        for li in range(cfg.num_gnn_layers):
            x_res = x
            x = RematGAT(
                out_channels=cfg.hidden_dim // cfg.num_heads,
                heads=cfg.num_heads,
                edge_dim=cfg.edge_dim,
                dropout=cfg.dropout,
                name=f"GATv2Conv_{li}",   # keep pre-remat param paths
            )(x, edge_index, e, deterministic)
            x = nn.LayerNorm()(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
            x = x + x_res

        ones = jnp.ones((x.shape[0],), x.dtype)
        counts = jax.ops.segment_sum(ones, batch, num_graphs)
        x_sum = jax.ops.segment_sum(x, batch, num_graphs)
        x_mean = x_sum / jnp.maximum(counts, 1.0)[:, None]
        x_max = jax.ops.segment_max(x, batch, num_graphs)
        x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
        x_attn = AttentionPooling(cfg.hidden_dim // 2, cfg.dropout)(
            x, batch, num_graphs, deterministic=deterministic)

        return jnp.concatenate([x_mean, x_max, x_attn, g], axis=-1)


class RankSchedulePredictor(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        cfg = self.cfg
        self.encoder = GNNEncoder(cfg)
        context_dim = 3 * cfg.hidden_dim + cfg.global_dim
        self.decoder = SequenceDecoder(
            context_dim=context_dim,
            hidden_dim=cfg.decoder_hidden_dim,
            num_layers=cfg.decoder_num_layers,
            dropout=cfg.dropout,
            max_seq_len=cfg.max_seq_len,
            min_rank=1.0,
        )

    def __call__(self, x, edge_index, edge_attr, batch, global_attr,
                 num_graphs, target_schedule=None, target_mask=None,
                 teacher_forcing_ratio=0.5, *, deterministic=True,
                 tf_rng=None):
        context = self.encoder(
            x, edge_index, edge_attr, batch, global_attr, num_graphs,
            deterministic=deterministic,
        )
        return self.decoder(
            context, target_schedule=target_schedule, target_mask=target_mask,
            teacher_forcing_ratio=teacher_forcing_ratio,
            deterministic=deterministic, tf_rng=tf_rng,
        )

    def predict(self, x, edge_index, edge_attr, batch, global_attr,
                num_graphs, min_rank=1.0):
        """Inference: (schedule (B, T) floats, lengths (B,))."""
        context = self.encoder(
            x, edge_index, edge_attr, batch, global_attr, num_graphs,
            deterministic=True,
        )
        schedule, lengths, _ = self.decoder.generate(context,
                                                     min_rank=min_rank)
        return schedule, lengths


RankPredictor = RankSchedulePredictor


def get_valid_schedule(schedule, lengths, min_rank: int = 1):
    """Round + clamp + cut to predicted length (reference
    ``predict``/``get_valid_schedule``, ``model/net.py:286-343``)."""
    import numpy as np

    schedule = np.maximum(np.round(np.asarray(schedule)), min_rank).astype(int)
    lengths = np.asarray(lengths)
    return [
        schedule[i, : int(lengths[i])].tolist()
        for i in range(schedule.shape[0])
    ]


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
