"""GATv2 graph attention convolution with edge features (Flax).

From-scratch implementation of the GATv2 operator (Brody et al. 2022) with
the same semantics as the layer used by the reference encoder
(``model/net.py:100-112``: heads=4, concat, edge_dim, add_self_loops,
share_weights=False): per directed edge j->i,

    e_ij   = a_h^T LeakyReLU(W_t x_i + W_s x_j + W_e e_feat)
    alpha  = segment-softmax of e over incoming edges of i
    out_i  = concat_h sum_j alpha_ij (W_s x_j)_h

Self-loops are appended with mean edge features (PyG's fill_value="mean").
Implemented with gather + sorted segment ops so it compiles to the same
kernel family as the solver's conic operators.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def segment_softmax(scores, segment_ids, num_segments):
    """Numerically stable softmax over segments (per target node)."""
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    scores = scores - seg_max[segment_ids]
    ex = jnp.exp(scores)
    seg_sum = jax.ops.segment_sum(ex, segment_ids, num_segments)
    return ex / (seg_sum[segment_ids] + 1e-16)


class GATv2Conv(nn.Module):
    out_channels: int           # per-head output dim
    heads: int = 4
    edge_dim: Optional[int] = None
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, edge_index, edge_attr=None, deterministic=True):
        n = x.shape[0]
        H, Cd = self.heads, self.out_channels

        src, dst = edge_index[0], edge_index[1]
        if self.add_self_loops:
            loop = jnp.arange(n, dtype=src.dtype)
            src = jnp.concatenate([src, loop])
            dst = jnp.concatenate([dst, loop])
            if edge_attr is not None:
                fill = (
                    jnp.mean(edge_attr, axis=0, keepdims=True)
                    if edge_attr.shape[0] > 0
                    else jnp.zeros((1, edge_attr.shape[1]), edge_attr.dtype)
                )
                edge_attr = jnp.concatenate(
                    [edge_attr, jnp.broadcast_to(fill, (n, edge_attr.shape[1]))]
                )

        w_src = nn.Dense(H * Cd, name="lin_src")(x)
        w_dst = nn.Dense(H * Cd, name="lin_dst")(x)
        w_src = w_src.reshape(n, H, Cd)
        w_dst = w_dst.reshape(n, H, Cd)

        msg = w_src[src] + w_dst[dst]            # (E, H, C)
        if edge_attr is not None and self.edge_dim is not None:
            we = nn.Dense(H * Cd, name="lin_edge")(edge_attr)
            msg = msg + we.reshape(-1, H, Cd)

        act = nn.leaky_relu(msg, negative_slope=self.negative_slope)
        # explicit f32: a bare self.param defaults to float64 under
        # jax_enable_x64 (the solver package enables it), which would
        # promote every downstream activation and break the decoder's
        # scan carry dtype invariance
        att = self.param(
            "att", nn.initializers.glorot_uniform(), (1, H, Cd),
            jnp.float32,
        )
        scores = jnp.sum(act * att, axis=-1)     # (E, H)

        alpha = jax.vmap(
            lambda s: segment_softmax(s, dst, n), in_axes=1, out_axes=1
        )(scores)
        if self.dropout > 0 and not deterministic:
            alpha = nn.Dropout(rate=self.dropout)(
                alpha, deterministic=deterministic
            )

        weighted = w_src[src] * alpha[..., None]   # (E, H, C)
        out = jax.ops.segment_sum(
            weighted.reshape(-1, H * Cd), dst, num_segments=n
        )
        return out
