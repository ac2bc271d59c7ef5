"""Jitted train/eval steps and the epoch driver.

TPU-native orchestration layer (the counterpart of
/root/reference/train.py:18-415 + utils.py:171-219): one jit-compiled train
step per padded shape, Adam via optax with host-injected learning rate,
masked MSE so pad nodes never contaminate the loss, ReduceLROnPlateau +
early stopping stepped per epoch on host, artifact saving with the same
contract as the reference (weights / norm stats / params json / losses json
/ summary / loss plot) plus mid-training checkpoint+resume (absent in the
reference).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aero_gnn_tpu.data.batching import Loader
from aero_gnn_tpu.graph.padded import GraphBatch
from aero_gnn_tpu.training.schedulers import EarlyStopping, ReduceLROnPlateau


def masked_mse(pred: jax.Array, target: jax.Array,
               node_mask: jax.Array) -> jax.Array:
    """MSE over real nodes only == nn.MSELoss on the unpadded batch."""
    m = node_mask[:, None]
    se = jnp.square(pred - target) * m
    return jnp.sum(se) / (jnp.sum(m) * target.shape[-1])


def make_optimizer(learning_rate: float, weight_decay: float = 0.0):
    """Adam (+ optional additive L2, matching torch Adam weight_decay
    semantics of adding wd*p to the gradient, not AdamW)."""
    def make(learning_rate):
        if weight_decay and weight_decay > 0.0:
            # torch Adam folds wd*p into the gradient BEFORE the Adam update
            return optax.chain(optax.add_decayed_weights(weight_decay),
                               optax.adam(learning_rate))
        return optax.adam(learning_rate)

    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@dataclasses.dataclass
class StepFns:
    train_step: Callable
    eval_step: Callable
    predict: Callable


def make_step_fns(model_cfg, optimizer, *, needs_hierarchy: bool = False,
                  donate: bool = True) -> StepFns:
    """Build jitted (train_step, eval_step, predict) for a model config."""

    def _apply(params, graph: GraphBatch, hierarchy, rng):
        if needs_hierarchy:
            return model_cfg.apply(params, graph, hierarchy=hierarchy,
                                   rng=rng)
        return model_cfg.apply(params, graph, rng=rng)

    def train_step(params, opt_state, graph: GraphBatch, hierarchy, rng):
        def loss_fn(p):
            pred = _apply(p, graph, hierarchy, rng)
            return masked_mse(pred, graph.y, graph.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def eval_step(params, graph: GraphBatch, hierarchy):
        pred = _apply(params, graph, hierarchy, None)
        return masked_mse(pred, graph.y, graph.node_mask)

    def predict(params, graph: GraphBatch, hierarchy):
        return _apply(params, graph, hierarchy, None)

    donate_argnums = (0, 1) if donate else ()
    return StepFns(
        train_step=jax.jit(train_step, donate_argnums=donate_argnums),
        eval_step=jax.jit(eval_step),
        predict=jax.jit(predict),
    )


def run_epoch_train(fns: StepFns, params, opt_state, loader: Loader,
                    rng: jax.Array) -> Tuple[Any, Any, float]:
    total, count = 0.0, 0
    for i, (graph, aux) in enumerate(loader):
        step_rng = jax.random.fold_in(rng, i)
        params, opt_state, loss = fns.train_step(
            params, opt_state, graph, aux.get("hierarchy"), step_rng)
        total += float(loss)
        count += 1
    return params, opt_state, total / max(count, 1)


def run_epoch_eval(fns: StepFns, params, loader: Loader) -> float:
    total, count = 0.0, 0
    for graph, aux in loader:
        total += float(fns.eval_step(params, graph, aux.get("hierarchy")))
        count += 1
    return total / max(count, 1)


@dataclasses.dataclass
class FitResult:
    params: Any
    opt_state: Any
    train_losses: List[float]
    val_losses: List[float]
    epochs_run: int
    stopped_early: bool
    wall_time_s: float


def fit(
    *,
    model_cfg,
    params,
    train_loader: Loader,
    val_loader: Loader,
    training_config: Dict[str, Any],
    needs_hierarchy: bool = False,
    seed: int = 0,
    log_every: int = 1,
    checkpoint_dir: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
) -> FitResult:
    """The epoch loop: train, eval, plateau-LR, early stop, checkpoints."""
    lr = training_config.get("learning_rate", 1e-3)
    optimizer = make_optimizer(lr, training_config.get("weight_decay", 0.0))
    opt_state = optimizer.init(params)
    fns = make_step_fns(model_cfg, optimizer,
                        needs_hierarchy=needs_hierarchy)

    plateau = ReduceLROnPlateau(
        lr=lr,
        factor=training_config.get("lr_scheduler_gamma", 0.8),
        patience=training_config.get("lr_scheduler_step_size", 50),
        min_lr=1e-7)
    early = EarlyStopping(
        patience=training_config.get("patience", 200))
    use_early = bool(training_config.get("early_stopping", True))

    epochs = int(training_config.get("epochs", 0))
    ckpt_every = int(training_config.get("checkpoint_every", 0) or 0)
    rng = jax.random.PRNGKey(seed)

    train_losses: List[float] = []
    val_losses: List[float] = []
    t0 = time.time()
    stopped = False
    start_epoch = 0

    from aero_gnn_tpu.utils.logging import MetricLogger
    metrics = MetricLogger(
        os.path.join(checkpoint_dir, "..", "metrics.jsonl")
        if checkpoint_dir else None)

    if checkpoint_dir and training_config.get("resume"):
        from aero_gnn_tpu.training import checkpoint as C
        restored = C.restore_latest(checkpoint_dir, params, opt_state)
        if restored is not None:
            params, opt_state, start_epoch, hist = restored
            train_losses = list(hist.get("train_losses", []))
            val_losses = list(hist.get("val_losses", []))
            log_fn(f"resumed from checkpoint at epoch {start_epoch}")

    for epoch in range(start_epoch, epochs):
        epoch_rng = jax.random.fold_in(rng, epoch)
        params, opt_state, train_loss = run_epoch_train(
            fns, params, opt_state, train_loader, epoch_rng)
        val_loss = run_epoch_eval(fns, params, val_loader)
        new_lr = plateau.step(val_loss)
        opt_state = set_learning_rate(opt_state, new_lr)
        train_losses.append(train_loss)
        val_losses.append(val_loss)
        if log_every and epoch % log_every == 0:
            log_fn(f"epoch {epoch:4d}  loss {train_loss:.6f}  "
                   f"val {val_loss:.6f}  lr {new_lr:.2e}")
        metrics.log(epoch, train_loss=train_loss, val_loss=val_loss,
                    lr=new_lr)
        if checkpoint_dir and ckpt_every and (epoch + 1) % ckpt_every == 0:
            from aero_gnn_tpu.training import checkpoint as C
            C.save(checkpoint_dir, params, opt_state, epoch + 1,
                   {"train_losses": train_losses, "val_losses": val_losses})
        if use_early and early.step(val_loss):
            log_fn(f"early stopping at epoch {epoch}")
            stopped = True
            break

    metrics.close()
    return FitResult(
        params=params, opt_state=opt_state,
        train_losses=train_losses, val_losses=val_losses,
        epochs_run=len(train_losses), stopped_early=stopped,
        wall_time_s=time.time() - t0)
