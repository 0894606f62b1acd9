"""Multi-objective rank-schedule loss (reference ``train.py:34-184``).

Five terms:
1. masked log-space MSE on rank values with under-prediction up-weighting,
2. cross-entropy with label smoothing on the schedule length class,
3. monotonicity penalty ReLU(-(r_{t+1} - r_t)) over valid adjacent pairs,
4. auxiliary initial-rank log-L1,
5. auxiliary final-rank log-L1 with under-prediction up-weighting.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    schedule_weight: float = 1.0
    length_weight: float = 0.5
    mono_weight: float = 0.1
    initial_weight: float = 0.25
    final_weight: float = 0.25
    under_weight: float = 2.5
    label_smoothing: float = 0.1
    eps: float = 1e-6


def rank_schedule_loss(
    pred_schedule, target_schedule, pred_length_logits, target_length,
    mask, pred_initial=None, w: LossWeights = LossWeights(),
):
    """Returns (total_loss, dict of components)."""
    eps = w.eps
    pred_log = jnp.log(jnp.maximum(pred_schedule, eps))
    target_log = jnp.log(jnp.maximum(target_schedule, eps))
    sq = (pred_log - target_log) ** 2
    under = (pred_schedule < target_schedule).astype(pred_schedule.dtype)
    weights = jnp.where(under > 0, w.under_weight, 1.0)
    masked = sq * mask * weights
    num_valid = jnp.sum(mask * weights) + eps
    schedule_loss = jnp.sum(masked) / num_valid

    T = pred_length_logits.shape[-1]
    tl = jnp.clip(target_length.reshape(-1) - 1, 0, T - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(tl, T)
    smooth = onehot * (1 - w.label_smoothing) + w.label_smoothing / T
    logp = jax.nn.log_softmax(pred_length_logits, axis=-1)
    length_loss = -jnp.mean(jnp.sum(smooth * logp, axis=-1))

    if w.mono_weight > 0:
        diff = pred_schedule[:, 1:] - pred_schedule[:, :-1]
        pen = jax.nn.relu(-diff)
        mm = mask[:, 1:] * mask[:, :-1]
        mono_loss = jnp.sum(pen * mm) / (jnp.sum(mm) + eps)
    else:
        mono_loss = jnp.asarray(0.0, pred_schedule.dtype)

    if pred_initial is not None:
        init_t = target_schedule[:, :1]
        init_m = mask[:, :1]
        d = jnp.abs(
            jnp.log(jnp.maximum(pred_initial, eps))
            - jnp.log(jnp.maximum(init_t, eps))
        )
        init_loss = jnp.sum(d * init_m) / (jnp.sum(init_m) + eps)
    else:
        init_loss = jnp.asarray(0.0, pred_schedule.dtype)

    B = target_length.shape[0]
    final_pos = jnp.clip(target_length.reshape(-1) - 1, 0,
                         pred_schedule.shape[1] - 1).astype(jnp.int32)
    idx = jnp.arange(B)
    pf = pred_schedule[idx, final_pos]
    tf_ = target_schedule[idx, final_pos]
    f_under = (pf < tf_).astype(pf.dtype) * (w.under_weight - 1.0) + 1.0
    f_diff = jnp.abs(
        jnp.log(jnp.maximum(pf, eps)) - jnp.log(jnp.maximum(tf_, eps))
    )
    final_loss = jnp.mean(f_diff * f_under)

    total = (
        w.schedule_weight * schedule_loss
        + w.length_weight * length_loss
        + w.mono_weight * mono_loss
        + w.initial_weight * init_loss
        + w.final_weight * final_loss
    )
    return total, {
        "schedule_loss": schedule_loss,
        "length_loss": length_loss,
        "mono_loss": mono_loss,
        "init_loss": init_loss,
        "final_loss": final_loss,
        "total_loss": total,
    }
