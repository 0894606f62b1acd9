"""Train the GATv2+LSTM rank-schedule predictor (JAX/Flax/optax).

Mirrors the reference training pipeline (``train.py``): 5-term
RankScheduleLoss, linear teacher-forcing decay 0.9 -> 0.2, AdamW with cosine
warmup (or plateau) schedule, gradient clipping, best-checkpoint selection by
validation log-MAE, eval report with per-position errors, and the
``default``/``prac`` modes (prac excludes benchmark instances from training).

Checkpoints are Flax msgpack (``model.msgpack``) + ``config.json`` — the
loading side (infer/benchmark) tolerates a missing config via defaults, like
the reference loaders.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from functools import partial

import numpy as np


def get_teacher_forcing_ratio(epoch: int, total_epochs: int,
                              start: float = 0.9, end: float = 0.2) -> float:
    """Linear decay (reference ``train.py:202-217``)."""
    if total_epochs <= 1:
        return end
    frac = min(epoch / (total_epochs - 1), 1.0)
    return start + (end - start) * frac


def eval_report(test: dict) -> str:
    """Text report over free-running test predictions.

    Same sections as the reference report (``train.py:529-595``): headline
    metrics, length distribution, per-position errors (first 5 positions),
    and sample prediction/target pairs.
    """
    lines = ["[eval report]"]
    lines.append(f"  total loss: {test['loss']:.4f}")
    lines.append(f"  log mae: {test['log_mae']:.4f}")
    lines.append(f"  mae: {test['mae']:.4f}")
    lines.append(f"  length accuracy: {test['length_acc']:.2%}")
    lines.append(f"  exact length matches: {test['exact_length_count']}")
    lines.append("")

    preds, targets = test["predictions"], test["targets"]
    pred_lens = np.array(test["pred_lengths"])
    tgt_lens = np.array(test["target_lengths"])
    if preds and targets:
        lines.append("[length distribution]")
        len_err = pred_lens - tgt_lens
        lines.append(
            f"  target lengths: mean={tgt_lens.mean():.2f}, "
            f"std={tgt_lens.std():.2f}, min={tgt_lens.min()}, "
            f"max={tgt_lens.max()}")
        lines.append(
            f"  pred lengths: mean={pred_lens.mean():.2f}, "
            f"std={pred_lens.std():.2f}, min={pred_lens.min()}, "
            f"max={pred_lens.max()}")
        lines.append(f"  length error: mean={len_err.mean():.2f}, "
                     f"std={len_err.std():.2f}")
        lines.append("")

        lines.append("[per-position error]")
        max_pos = min(5, max(len(t) for t in targets))
        for pos in range(max_pos):
            errs = np.array([p[pos] - t[pos] for p, t in zip(preds, targets)
                             if pos < len(p) and pos < len(t)])
            if errs.size:
                lines.append(
                    f"  position {pos + 1}: mean_err={errs.mean():.2f}, "
                    f"std={errs.std():.2f}, "
                    f"|mean_err|={np.abs(errs).mean():.2f}")
        lines.append("")

        lines.append("[sample predictions]")
        for i in range(min(10, len(preds))):
            ell = "..." if len(preds[i]) > 8 else ""
            lines.append(f"  [{i + 1}] pred: {preds[i][:8]}{ell}")
            ell = "..." if len(targets[i]) > 8 else ""
            lines.append(f"       true: {targets[i][:8]}{ell}")
    return "\n".join(lines) + "\n"


def build_argparser():
    ap = argparse.ArgumentParser(description="train rank-schedule predictor")
    ap.add_argument("--root", default="dataset", help="dir with proc/ + sol_json/")
    ap.add_argument("--output-dir", default="runs/rank_predictor")
    ap.add_argument("--mode", choices=["default", "prac"], default="default")
    ap.add_argument("--benchmark-dir", default="benchmark")
    # architecture (reference Optuna-tuned defaults, train.py:661-750)
    ap.add_argument("--hidden-dim", type=int, default=64)
    ap.add_argument("--edge-dim", type=int, default=32)
    ap.add_argument("--global-dim", type=int, default=32)
    ap.add_argument("--num-gnn-layers", type=int, default=3)
    ap.add_argument("--num-heads", type=int, default=4)
    ap.add_argument("--decoder-hidden-dim", type=int, default=96)
    ap.add_argument("--decoder-num-layers", type=int, default=2)
    ap.add_argument("--max-seq-len", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.15)
    # loss
    ap.add_argument("--schedule-weight", type=float, default=1.0)
    ap.add_argument("--length-weight", type=float, default=0.5)
    ap.add_argument("--mono-weight", type=float, default=0.1)
    ap.add_argument("--initial-weight", type=float, default=0.25)
    ap.add_argument("--final-weight", type=float, default=0.25)
    ap.add_argument("--under-weight", type=float, default=3.67)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    # optimization
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--warmup-epochs", type=int, default=10)
    ap.add_argument("--scheduler", choices=["cosine", "plateau"],
                    default="cosine")
    ap.add_argument("--clip-norm", type=float, default=1.0)
    ap.add_argument("--tf-start", type=float, default=0.9)
    ap.add_argument("--tf-end", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--init-from", default=None,
                    help="checkpoint dir to warm-start parameters from")
    ap.add_argument("--name-prefix", nargs="*", default=None,
                    help="restrict the dataset to instances with these "
                         "name prefixes (family-specialist fine-tune)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from ltr_lowrank_sdp_tpu.data.loader import (
        create_splits, iterate_batches, get_benchmark_names,
    )
    from ltr_lowrank_sdp_tpu.models.loss import LossWeights, rank_schedule_loss
    from ltr_lowrank_sdp_tpu.models.net import (
        ModelConfig, RankSchedulePredictor, count_parameters,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    exclude = None
    if args.mode == "prac":
        exclude = get_benchmark_names(args.benchmark_dir)
        print(f"prac mode: excluding {len(exclude)} benchmark instances")

    ds, train_idx, val_idx, test_idx = create_splits(
        args.root, seed=args.seed, max_schedule_length=args.max_seq_len,
        exclude_names=exclude,
    )
    if args.name_prefix:
        # family-specialist fine-tune: restrict every split to instances
        # whose name starts with one of the given prefixes
        keep = lambda i: ds.samples[i][0].startswith(
            tuple(args.name_prefix))  # noqa: E731
        train_idx = [i for i in train_idx if keep(i)]
        val_idx = [i for i in val_idx if keep(i)]
        test_idx = [i for i in test_idx if keep(i)]
        print(f"name-prefix filter {args.name_prefix}: "
              f"train {len(train_idx)} / val {len(val_idx)} / "
              f"test {len(test_idx)}")
    print(f"dataset: {len(ds)} samples "
          f"(train {len(train_idx)} / val {len(val_idx)} / test {len(test_idx)})")

    cfg = ModelConfig(
        hidden_dim=args.hidden_dim, edge_dim=args.edge_dim,
        global_dim=args.global_dim, num_gnn_layers=args.num_gnn_layers,
        num_heads=args.num_heads, decoder_hidden_dim=args.decoder_hidden_dim,
        decoder_num_layers=args.decoder_num_layers,
        max_seq_len=args.max_seq_len, dropout=args.dropout,
    )
    model = RankSchedulePredictor(cfg)
    lw = LossWeights(
        schedule_weight=args.schedule_weight, length_weight=args.length_weight,
        mono_weight=args.mono_weight, initial_weight=args.initial_weight,
        final_weight=args.final_weight, under_weight=args.under_weight,
        label_smoothing=args.label_smoothing,
    )

    # init from the first batch
    first = next(iterate_batches(ds, train_idx or val_idx or test_idx,
                                 args.batch_size))
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.array(first.x), jnp.array(first.edge_index),
        jnp.array(first.edge_attr), jnp.array(first.batch),
        jnp.array(first.global_attr), first.num_graphs,
    )
    if args.init_from:
        # warm start / fine-tune: overwrite the freshly-initialised params
        # with a compatible checkpoint (reference train.py resumes from
        # checkpoints the same way via load_state_dict)
        from ltr_lowrank_sdp_tpu.models.checkpoint import load_model as _lm

        _, params, _ = _lm(args.init_from)
        print(f"warm start from {args.init_from}")
    print(f"model parameters: {count_parameters(params):,}")

    steps_per_epoch = max(1, (len(train_idx) + args.batch_size - 1)
                          // args.batch_size)
    if args.scheduler == "cosine":
        # clamp warmup below the run length (short smoke runs would
        # otherwise produce negative decay_steps)
        warmup_epochs = min(args.warmup_epochs, max(args.epochs - 1, 0))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_epochs * steps_per_epoch,
            args.epochs * steps_per_epoch, end_value=args.lr * 1e-2,
        )
    else:
        sched = args.lr
    tx = optax.chain(
        optax.clip_by_global_norm(args.clip_norm),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    if args.grad_accum > 1:
        tx = optax.MultiSteps(tx, args.grad_accum)
    opt_state = tx.init(params)

    # tf_ratio is TRACED (the decoder's per-step coin test is a jnp.where):
    # making it static recompiled train_step every epoch of the teacher-
    # forcing decay — hundreds of XLA CPU compilations exhausted the LLVM
    # JIT section memory mid-run
    @partial(jax.jit, static_argnames=("num_graphs",))
    def train_step(params, opt_state, x, ei, ea, batch, g, sched_t, mask,
                   length, num_graphs, tf_ratio, drng):
        def loss_fn(p):
            preds, ll, ir = model.apply(
                p, x, ei, ea, batch, g, num_graphs,
                target_schedule=sched_t, target_mask=mask,
                teacher_forcing_ratio=tf_ratio, deterministic=False,
                tf_rng=jax.random.fold_in(drng, 17),
                rngs={"dropout": drng},
            )
            return rank_schedule_loss(preds, sched_t, ll, length, mask, ir, lw)

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, comps

    @partial(jax.jit, static_argnames=("num_graphs",))
    def eval_step(params, x, ei, ea, batch, g, sched_t, mask, length,
                  num_graphs):
        # teacher-forced loss
        preds, ll, ir = model.apply(
            params, x, ei, ea, batch, g, num_graphs,
            target_schedule=sched_t, teacher_forcing_ratio=1.0,
        )
        loss, comps = rank_schedule_loss(preds, sched_t, ll, length, mask,
                                         ir, lw)
        # free-running predictions
        fr_sched, fr_len = model.apply(
            params, x, ei, ea, batch, g, num_graphs,
            method=RankSchedulePredictor.predict,
        )
        return loss, comps, preds, ll, fr_sched, fr_len

    def evaluate(params, indices, collect=False):
        tot_loss, n_batches = 0.0, 0
        log_mae_sum, mae_sum, n_valid = 0.0, 0.0, 0.0
        len_correct, len_total = 0, 0
        # free-running per-instance predictions (reference train.py:529-595
        # builds its eval report / eval_predictions.json from these)
        preds_out, targets_out = [], []
        pred_lens_out, target_lens_out, names_out = [], [], []
        for b in iterate_batches(ds, indices, args.batch_size):
            loss, comps, preds, ll, frs, frl = eval_step(
                params, jnp.array(b.x), jnp.array(b.edge_index),
                jnp.array(b.edge_attr), jnp.array(b.batch),
                jnp.array(b.global_attr), jnp.array(b.schedule),
                jnp.array(b.mask), jnp.array(b.length), b.num_graphs,
            )
            tot_loss += float(loss)
            n_batches += 1
            p = np.asarray(preds)
            t = np.asarray(b.schedule)
            m = np.asarray(b.mask)
            log_err = np.abs(np.log(np.maximum(p, 1e-6))
                             - np.log(np.maximum(t, 1e-6))) * m
            log_mae_sum += log_err.sum()
            mae_sum += (np.abs(p - t) * m).sum()
            n_valid += m.sum()
            pred_len = np.argmax(np.asarray(ll), axis=-1) + 1
            true_len = np.asarray(b.length)
            len_correct += int(np.sum(pred_len == true_len))
            len_total += b.num_graphs
            if collect:
                fr_s = np.asarray(frs)
                fr_l = np.asarray(frl)
                for i in range(b.num_graphs):
                    pl, tl = int(fr_l[i]), int(true_len[i])
                    preds_out.append(
                        [int(round(v)) for v in fr_s[i, :pl]])
                    targets_out.append([int(round(v)) for v in t[i, :tl]])
                    pred_lens_out.append(pl)
                    target_lens_out.append(tl)
                    bnames = getattr(b, "names", None) or []
                    names_out.append(bnames[i] if i < len(bnames) else None)
        out = {
            "loss": tot_loss / max(n_batches, 1),
            "log_mae": log_mae_sum / max(n_valid, 1),
            "mae": mae_sum / max(n_valid, 1),
            "length_acc": len_correct / max(len_total, 1),
        }
        if collect:
            out["predictions"] = preds_out
            out["targets"] = targets_out
            out["pred_lengths"] = pred_lens_out
            out["target_lengths"] = target_lens_out
            out["names"] = names_out
            out["exact_length_count"] = int(sum(
                pl == tl for pl, tl in zip(pred_lens_out, target_lens_out)))
        return out

    best_val = float("inf")
    history = []
    t_start = time.time()
    plateau_bad = 0
    lr_scale = 1.0
    for epoch in range(args.epochs):
        tf_ratio = get_teacher_forcing_ratio(
            epoch, args.epochs, args.tf_start, args.tf_end
        )
        ep_loss, nb = 0.0, 0
        for b in iterate_batches(ds, train_idx, args.batch_size,
                                 shuffle=True, seed=args.seed + epoch):
            drng = jax.random.fold_in(rng, epoch * 10000 + nb)
            params, opt_state, loss, comps = train_step(
                params, opt_state, jnp.array(b.x), jnp.array(b.edge_index),
                jnp.array(b.edge_attr), jnp.array(b.batch),
                jnp.array(b.global_attr), jnp.array(b.schedule),
                jnp.array(b.mask), jnp.array(b.length), b.num_graphs,
                jnp.asarray(float(tf_ratio), jnp.float32), drng,
            )
            ep_loss += float(loss)
            nb += 1
        val = evaluate(params, val_idx) if val_idx else {"log_mae": ep_loss}
        # np.float32 scalars are not JSON-serializable — coerce
        val = {k: (float(v) if isinstance(v, (int, float, np.floating))
                   else v) for k, v in val.items()}
        history.append({
            "epoch": epoch, "train_loss": ep_loss / max(nb, 1),
            "tf_ratio": tf_ratio, **{f"val_{k}": v for k, v in val.items()},
        })
        print(f"epoch {epoch:3d} train_loss {ep_loss / max(nb, 1):.4f} "
              f"val_log_mae {val.get('log_mae', float('nan')):.4f} "
              f"tf {tf_ratio:.2f} ({time.time() - t_start:.0f}s)")
        if val.get("log_mae", float("inf")) < best_val:
            best_val = val["log_mae"]
            plateau_bad = 0
            with open(os.path.join(args.output_dir, "model.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(params))
            with open(os.path.join(args.output_dir, "config.json"), "w") as f:
                json.dump({"model_config": cfg.to_dict(),
                           "best_val_log_mae": float(best_val),
                           "epoch": epoch}, f, indent=2)
        elif args.scheduler == "plateau":
            plateau_bad += 1
            if plateau_bad >= 10:
                lr_scale *= 0.5
                plateau_bad = 0

    test = evaluate(params, test_idx, collect=True) if test_idx else {}
    if test:
        # per-position eval report + raw predictions
        # (reference train.py:529-595 eval_report / eval_predictions.json)
        with open(os.path.join(args.output_dir, "eval_report.txt"), "w") as f:
            f.write(eval_report(test))
        with open(os.path.join(args.output_dir,
                               "eval_predictions.json"), "w") as f:
            json.dump({
                "predictions": test["predictions"],
                "targets": test["targets"],
                "pred_lengths": test["pred_lengths"],
                "target_lengths": test["target_lengths"],
                "names": test["names"],
            }, f, indent=2)
    test_scalars = {k: v for k, v in test.items()
                    if not isinstance(v, list)}
    report = {
        "best_val_log_mae": best_val,
        "test": test_scalars,
        "history": history,
        "params": vars(args),
    }
    with open(os.path.join(args.output_dir, "training_log.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"done. best val log-MAE {best_val:.4f}; test: {test_scalars}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
