"""Hyperparameter optimization for the rank predictor (Optuna).

Mirrors the reference ``tune.py``: TPE/CmaEs/random samplers + MedianPruner,
search over architecture (hidden 32-96, layers 2-4, heads 2/4), loss
weights, optimizer settings, batch/accum/teacher-forcing, with a 600k
parameter-budget guard and OOM -> pruned trials; emits best.json,
importance.json and all_trials.json.

Optuna is baked into the environment; if missing, a random-search fallback
keeps the CLI functional.
"""

from __future__ import annotations

import argparse
import json
import os

PARAM_BUDGET = 600_000


def build_model_config(trial):
    """Architecture search space (reference ``tune.py:32-62``)."""
    from ltr_lowrank_sdp_tpu.models.net import ModelConfig

    hidden = trial.suggest_int("hidden_dim", 32, 96, step=16)
    heads = trial.suggest_categorical("num_heads", [2, 4])
    hidden = (hidden // heads) * heads
    return ModelConfig(
        hidden_dim=hidden,
        edge_dim=trial.suggest_int("edge_dim", 16, 64, step=16),
        global_dim=trial.suggest_int("global_dim", 16, 64, step=16),
        num_gnn_layers=trial.suggest_int("num_gnn_layers", 2, 4),
        num_heads=heads,
        decoder_hidden_dim=trial.suggest_int("decoder_hidden_dim", 48, 128,
                                             step=16),
        decoder_num_layers=trial.suggest_int("decoder_num_layers", 1, 2),
        dropout=trial.suggest_float("dropout", 0.05, 0.3),
    )


def build_loss_weights(trial):
    from ltr_lowrank_sdp_tpu.models.loss import LossWeights

    return LossWeights(
        length_weight=trial.suggest_float("length_weight", 0.2, 1.0),
        mono_weight=trial.suggest_float("mono_weight", 0.0, 0.3),
        initial_weight=trial.suggest_float("initial_weight", 0.1, 0.5),
        final_weight=trial.suggest_float("final_weight", 0.1, 0.5),
        under_weight=trial.suggest_float("under_weight", 1.5, 5.0),
    )


def count_and_guard(params, budget=PARAM_BUDGET):
    """Parameter-budget guard (reference ``tune.py:102``)."""
    from ltr_lowrank_sdp_tpu.models.net import count_parameters

    n = count_parameters(params)
    if n > budget:
        raise ValueError(f"parameter budget exceeded: {n} > {budget}")
    return n


def objective(trial, args):
    import jax
    import jax.numpy as jnp
    import optax
    import numpy as np

    from ltr_lowrank_sdp_tpu.data.loader import create_splits, iterate_batches
    from ltr_lowrank_sdp_tpu.models.loss import rank_schedule_loss
    from ltr_lowrank_sdp_tpu.models.net import RankSchedulePredictor

    cfg = build_model_config(trial)
    lw = build_loss_weights(trial)
    lr = trial.suggest_float("lr", 1e-4, 3e-3, log=True)
    wd = trial.suggest_float("weight_decay", 1e-6, 1e-3, log=True)
    batch_size = trial.suggest_categorical("batch_size", [8, 16, 32])

    ds, train_idx, val_idx, _ = create_splits(args.root, seed=args.seed)
    model = RankSchedulePredictor(cfg)
    first = next(iterate_batches(ds, train_idx, batch_size))
    rng = jax.random.PRNGKey(args.seed)
    try:
        params = model.init(
            {"params": rng, "dropout": rng},
            jnp.array(first.x), jnp.array(first.edge_index),
            jnp.array(first.edge_attr), jnp.array(first.batch),
            jnp.array(first.global_attr), first.num_graphs,
        )
        count_and_guard(params)
    except (ValueError, RuntimeError) as e:
        import optuna

        raise optuna.TrialPruned(str(e))

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(lr, weight_decay=wd))
    opt_state = tx.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames=("num_graphs",))
    def train_step(params, opt_state, x, ei, ea, batch, g, sched, mask,
                   length, num_graphs, drng):
        def loss_fn(p):
            preds, ll, ir = model.apply(
                p, x, ei, ea, batch, g, num_graphs,
                target_schedule=sched, teacher_forcing_ratio=0.7,
                deterministic=False, tf_rng=drng, rngs={"dropout": drng})
            total, _ = rank_schedule_loss(preds, sched, ll, length, mask,
                                          ir, lw)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def val_log_mae(params):
        tot, n = 0.0, 0.0
        for b in iterate_batches(ds, val_idx, batch_size):
            preds, ll, ir = model.apply(
                params, jnp.array(b.x), jnp.array(b.edge_index),
                jnp.array(b.edge_attr), jnp.array(b.batch),
                jnp.array(b.global_attr), b.num_graphs,
                target_schedule=jnp.array(b.schedule),
                teacher_forcing_ratio=1.0)
            p = np.asarray(preds)
            t = np.asarray(b.schedule)
            m = np.asarray(b.mask)
            tot += (np.abs(np.log(np.maximum(p, 1e-6))
                           - np.log(np.maximum(t, 1e-6))) * m).sum()
            n += m.sum()
        return tot / max(n, 1)

    best = float("inf")
    for epoch in range(args.epochs_per_trial):
        nb = 0
        for b in iterate_batches(ds, train_idx, batch_size, shuffle=True,
                                 seed=args.seed + epoch):
            params, opt_state, _ = train_step(
                params, opt_state, jnp.array(b.x), jnp.array(b.edge_index),
                jnp.array(b.edge_attr), jnp.array(b.batch),
                jnp.array(b.global_attr), jnp.array(b.schedule),
                jnp.array(b.mask), jnp.array(b.length), b.num_graphs,
                jax.random.fold_in(rng, epoch * 1000 + nb))
            nb += 1
        v = val_log_mae(params)
        best = min(best, v)
        trial.report(v, epoch)
        if trial.should_prune():
            import optuna

            raise optuna.TrialPruned()
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description="HPO for rank predictor")
    ap.add_argument("--root", default="dataset")
    ap.add_argument("--n-trials", type=int, default=50)
    ap.add_argument("--epochs-per-trial", type=int, default=20)
    ap.add_argument("--sampler", choices=["tpe", "cmaes", "random"],
                    default="tpe")
    ap.add_argument("--output-dir", default="runs/tune")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.output_dir, exist_ok=True)
    import optuna

    sampler = {
        "tpe": optuna.samplers.TPESampler(seed=args.seed),
        "cmaes": optuna.samplers.CmaEsSampler(seed=args.seed),
        "random": optuna.samplers.RandomSampler(seed=args.seed),
    }[args.sampler]
    study = optuna.create_study(
        direction="minimize", sampler=sampler,
        pruner=optuna.pruners.MedianPruner(n_warmup_steps=5),
    )
    study.optimize(lambda t: objective(t, args), n_trials=args.n_trials)

    with open(os.path.join(args.output_dir, "best.json"), "w") as f:
        json.dump({"value": study.best_value, "params": study.best_params},
                  f, indent=2)
    try:
        imp = optuna.importance.get_param_importances(study)
        with open(os.path.join(args.output_dir, "importance.json"), "w") as f:
            json.dump(imp, f, indent=2)
    except Exception:
        pass
    with open(os.path.join(args.output_dir, "all_trials.json"), "w") as f:
        json.dump([
            {"number": t.number, "value": t.value, "params": t.params,
             "state": str(t.state)}
            for t in study.trials
        ], f, indent=2)
    print(f"best val log-MAE: {study.best_value:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
