"""Model building blocks (Flax): MLP encoders, attention pooling, and the
autoregressive LSTM sequence decoder.

Contract matches ``model/layers.py`` of the reference:

* ``MLPBlock``: Linear -> Norm -> Act -> Dropout -> Linear (``:13-56``);
* Node/Edge/Global encoders project the 16/5/17 raw features (``:59-187``);
* ``AttentionPooling``: tanh-MLP scores + masked segment softmax (``:189-262``);
* ``SequenceDecoder`` (``:265-485``): LSTM whose input at every step is
  [rank-embedding, context]; rank head predicts log-rank clamped to
  [-2, 10] then exponentiated; length head is a max_seq_len-way classifier;
  initial-rank prior head is softplus + min_rank; per-step teacher forcing;
  autoregressive ``generate``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.1
    norm_type: str = "layer"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        x = nn.Dense(self.hidden_dim)(x)
        if self.norm_type == "layer":
            x = nn.LayerNorm()(x)
        elif self.norm_type == "batch":
            x = nn.BatchNorm(use_running_average=deterministic)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=0.2)
        else:
            x = nn.gelu(x)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_dim)(x)


class NodeEncoder(nn.Module):
    out_dim: int
    dropout: float = 0.1
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        return MLPBlock(self.out_dim, self.out_dim, self.dropout,
                        self.norm_type)(x, deterministic=deterministic)


class EdgeEncoder(nn.Module):
    out_dim: int
    dropout: float = 0.1
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, e, *, deterministic=True):
        return MLPBlock(self.out_dim, self.out_dim, self.dropout,
                        self.norm_type)(e, deterministic=deterministic)


class GlobalEncoder(nn.Module):
    out_dim: int
    dropout: float = 0.1
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, g, *, deterministic=True):
        return MLPBlock(self.out_dim, self.out_dim, self.dropout,
                        self.norm_type)(g, deterministic=deterministic)


class AttentionPooling(nn.Module):
    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, batch, num_graphs, *, deterministic=True):
        """x: (N, D) node embeddings, batch: (N,) graph ids -> (B, D)."""
        score = nn.Dense(self.hidden_dim)(x)
        score = nn.tanh(score)
        score = nn.Dense(1)(score)[:, 0]                 # (N,)
        smax = jax.ops.segment_max(score, batch, num_graphs)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.exp(score - smax[batch])
        ssum = jax.ops.segment_sum(ex, batch, num_graphs)
        w = ex / (ssum[batch] + 1e-16)
        w = nn.Dropout(rate=self.dropout)(w, deterministic=deterministic)
        return jax.ops.segment_sum(w[:, None] * x, batch, num_graphs)


class _LSTMStack(nn.Module):
    hidden_dim: int
    num_layers: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, carry, x, *, deterministic=True):
        """carry: tuple of (c, h) per layer; x: (B, in); returns new carry."""
        new_carry = []
        inp = x
        for layer in range(self.num_layers):
            cell = nn.LSTMCell(features=self.hidden_dim,
                               name=f"lstm_{layer}")
            (c, h), out = cell(carry[layer], inp)
            new_carry.append((c, h))
            inp = out
            if layer + 1 < self.num_layers:
                inp = nn.Dropout(rate=self.dropout)(
                    inp, deterministic=deterministic
                )
        return tuple(new_carry), inp


class SequenceDecoder(nn.Module):
    context_dim: int
    hidden_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.1
    max_seq_len: int = 16
    min_rank: float = 1.0

    def setup(self):
        h = self.hidden_dim
        self.embed_rank = nn.Sequential([
            nn.Dense(h // 2), nn.relu, nn.Dense(h),
        ])
        self.lstm = _LSTMStack(h, self.num_layers, self.dropout)
        self.context_to_h = nn.Dense(h * self.num_layers)
        self.context_to_c = nn.Dense(h * self.num_layers)
        self.out_dense1 = nn.Dense(h // 2)
        self.out_drop = nn.Dropout(rate=self.dropout)
        self.out_dense2 = nn.Dense(1)
        self.len_dense1 = nn.Dense(h)
        self.len_drop = nn.Dropout(rate=self.dropout)
        self.len_dense2 = nn.Dense(self.max_seq_len)
        self.init_dense1 = nn.Dense(h)
        self.init_drop = nn.Dropout(rate=self.dropout)
        self.init_dense2 = nn.Dense(1)

    def _init_carry(self, context):
        B = context.shape[0]
        h = self.context_to_h(context).reshape(B, self.num_layers,
                                               self.hidden_dim)
        c = self.context_to_c(context).reshape(B, self.num_layers,
                                               self.hidden_dim)
        return tuple(
            (c[:, l, :], h[:, l, :]) for l in range(self.num_layers)
        )

    def _rank_head(self, out, deterministic):
        y = nn.relu(self.out_dense1(out))
        y = self.out_drop(y, deterministic=deterministic)
        log_rank = jnp.clip(self.out_dense2(y), -2.0, 10.0)
        return jnp.exp(log_rank)[:, 0]

    def _length_head(self, context, deterministic):
        y = nn.relu(self.len_dense1(context))
        y = self.len_drop(y, deterministic=deterministic)
        return self.len_dense2(y)

    def _initial_head(self, context, deterministic):
        y = nn.relu(self.init_dense1(context))
        y = self.init_drop(y, deterministic=deterministic)
        return nn.softplus(self.init_dense2(y)) + self.min_rank

    def _step(self, carry, xs, *, context, mode, tf_ratio, deterministic):
        """One decode step, shaped for ``nn.scan`` (16x smaller XLA
        program than the Python-unrolled loop — the unrolled backward
        took >15 min to compile).  ``mode`` is a trace-time constant:
        'coin' (per-step teacher-forcing coin), 'teacher', 'free'."""
        lstm_carry, cur = carry
        tgt_t, coin = xs
        emb = self.embed_rank(cur[:, None])
        step_in = jnp.concatenate([emb, context], axis=-1)
        lstm_carry, out = self.lstm(lstm_carry, step_in,
                                    deterministic=deterministic)
        rank_pred = self._rank_head(out, deterministic)
        if mode == "coin":
            cur = jnp.where(coin < tf_ratio, tgt_t,
                            jax.lax.stop_gradient(rank_pred))
        elif mode == "teacher":
            cur = tgt_t
        else:
            cur = jax.lax.stop_gradient(rank_pred)
        return (lstm_carry, cur), rank_pred

    def _decode(self, context, cur0, tgt_T, coins, mode, tf_ratio,
                deterministic):
        """Scan the decode step over the T axis; returns preds (B, T)."""
        step = partial(type(self)._step, context=context, mode=mode,
                       tf_ratio=tf_ratio, deterministic=deterministic)
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0, length=self.max_seq_len,
        )
        (_, _), preds_T = scan(self, (self._init_carry(context), cur0),
                               (tgt_T, coins))
        return preds_T.T    # (T, B) -> (B, T)

    def __call__(self, context, target_schedule=None, target_mask=None,
                 teacher_forcing_ratio=0.5, use_target_init=True, *,
                 deterministic=True, tf_rng=None):
        """Teacher-forced decode.  Returns (predictions (B, T),
        length_logits (B, T), init_rank (B, 1))."""
        B = context.shape[0]
        T = self.max_seq_len
        length_logits = self._length_head(context, deterministic)
        init_rank = self._initial_head(context, deterministic)

        if use_target_init and target_schedule is not None:
            cur = target_schedule[:, 0]
        else:
            cur = init_rank[:, 0]

        if target_schedule is not None and tf_rng is not None:
            mode = "coin"
            coins = jax.vmap(
                lambda t: jax.random.uniform(jax.random.fold_in(tf_rng, t))
            )(jnp.arange(T))
            tgt_T = target_schedule.T
        elif target_schedule is not None:
            mode = "teacher"
            coins = jnp.zeros((T,), context.dtype)
            tgt_T = target_schedule.T
        else:
            mode = "free"
            coins = jnp.zeros((T,), context.dtype)
            tgt_T = jnp.zeros((T, B), context.dtype)
        predictions = self._decode(context, cur, tgt_T, coins, mode,
                                   teacher_forcing_ratio, deterministic)
        return predictions, length_logits, init_rank

    def generate(self, context, min_rank=1.0):
        """Autoregressive decode: (schedule (B, T), lengths (B,), init)."""
        B = context.shape[0]
        T = self.max_seq_len
        length_logits = self._length_head(context, True)
        lengths = jnp.clip(jnp.argmax(length_logits, axis=-1) + 1, 1, T)
        init_rank = self._initial_head(context, True)
        preds = self._decode(
            context, init_rank[:, 0], jnp.zeros((T, B), context.dtype),
            jnp.zeros((T,), context.dtype), "free", 0.0, True)
        schedule = jnp.maximum(preds, min_rank)
        return schedule, lengths, init_rank
