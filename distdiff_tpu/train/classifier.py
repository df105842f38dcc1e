"""Data-parallel classifier training (the reference's ``train.py`` engine).

Optimization recipe parity (``train.py:155-158``): SGD momentum 0.9
nesterov + cosine-annealed LR, weight decay, cross-entropy. TPU-native
execution: one jitted train step with the batch axis sharded over the mesh
and parameters replicated — XLA inserts the gradient all-reduce over ICI
(replacing ``nn.DataParallel``'s scatter/gather, ``train.py:145``).

Padded-tail batches are handled by a boolean mask weighting the loss and
metrics (static shapes everywhere).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from distdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicated


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class TrainConfig:
    lr: float = 0.1
    epochs: int = 100
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 5e-4
    label_smoothing: float = 0.0
    train_fc_only: bool = False   # --train_fc linear probe (train.py:150-155)
    accumulate: int = 1           # --accumulate grad accumulation


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr, decay_steps=max(cfg.epochs * steps_per_epoch, 1)
    )
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum, nesterov=cfg.nesterov),
    )
    if cfg.train_fc_only:
        def fc_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    getattr(k, "key", None) in ("fc", "classifier")
                    for k in path
                ),
                params,
            )
        tx = optax.chain(optax.masked(tx, fc_mask), )
    if cfg.accumulate > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate)
    return tx


def create_train_state(module, variables, tx) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def cross_entropy(logits, targets, mask, label_smoothing=0.0):
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n_cls)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / n_cls
    ll = jnp.sum(onehot * jax.nn.log_softmax(logits.astype(jnp.float32)), -1)
    w = mask.astype(jnp.float32)
    return -(ll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_train_step(
    module,
    tx,
    mesh=None,
    label_smoothing: float = 0.0,
    loss_fn: Optional[Callable] = None,
    state_shardings=None,
):
    """Returns jitted step(state, images, targets, mask) -> (state, metrics).

    ``loss_fn(logits, targets, mask) -> scalar`` overrides cross-entropy
    (used by the cutmix/augmix/mixup trainer variants).

    ``state_shardings`` (a NamedSharding pytree matching TrainState, e.g.
    from ``parallel.fsdp.fsdp_sharding``) switches the step from replicated
    params + all-reduced grads to FSDP: params enter/leave sharded, GSPMD
    all-gathers them at use and reduce-scatters the gradients.
    """
    mesh = mesh if mesh is not None else make_mesh()
    shard = data_sharding(mesh)
    repl = replicated(mesh)
    state_io = state_shardings if state_shardings is not None else repl
    _loss = loss_fn or (
        lambda lg, tg, mk: cross_entropy(lg, tg, mk, label_smoothing)
    )

    def step(state: TrainState, images, targets, mask):
        def objective(params):
            out, mut = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            return _loss(out, targets, mask), (out, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=state.step + 1,
        )
        w = mask.astype(jnp.float32)
        acc = (
            ((jnp.argmax(logits, -1) == targets) * w).sum()
            / jnp.maximum(w.sum(), 1.0)
        )
        return new_state, {"loss": loss, "acc": acc * 100.0}

    return jax.jit(
        step,
        in_shardings=(state_io, shard, shard, shard),
        out_shardings=(state_io, repl),
        donate_argnums=(0,),
    )


def make_eval_step(module, mesh=None):
    """jitted eval(params, batch_stats, images, targets, mask) ->
    (correct_top1, correct_top5, n)."""
    mesh = mesh if mesh is not None else make_mesh()
    shard = data_sharding(mesh)
    repl = replicated(mesh)

    def step(params, batch_stats, images, targets, mask):
        logits = module.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        w = mask.astype(jnp.float32)
        k = min(5, logits.shape[-1])
        topk = jnp.argsort(-logits, axis=-1)[:, :k]
        hit = topk == targets[:, None]
        c1 = (hit[:, :1].any(-1) * w).sum()
        c5 = (hit.any(-1) * w).sum()
        loss = cross_entropy(logits, targets, mask)
        return c1, c5, w.sum(), loss * w.sum()

    return jax.jit(
        step,
        in_shardings=(repl, repl, shard, shard, shard),
        out_shardings=(repl, repl, repl, repl),
    )
