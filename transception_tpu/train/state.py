"""Train state + optimizer construction.

Optimizer matches the reference recipe exactly (trainer.py:125-157):
SGD momentum 0.9, coupled weight decay 1e-4 (torch semantics: decay added
to the gradient before the momentum buffer), cosine annealing stepped per
iteration to T_max = epochs * steps_per_epoch (or the (1 - t/T)^0.9 poly
fallback when the scheduler is disabled). Gradient accumulation is a real
feature here (optax.MultiSteps), not the reference's dead flag
(train_MSTransception.py:67).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from transception_tpu.core.config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    total = cfg.max_epochs * steps_per_epoch
    base = cfg.scaled_lr()
    if cfg.use_scheduler:
        # CosineAnnealingLR, eta_min=0, per-iteration (trainer.py:126-127).
        return optax.cosine_decay_schedule(base, decay_steps=total, alpha=0.0)
    # Poly decay (1 - t/T)^0.9 (trainer.py:155-157).
    return optax.polynomial_schedule(init_value=base, end_value=0.0,
                                     power=0.9, transition_steps=total)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    parts = []
    if cfg.grad_clipping:
        # clip_grad_norm max_norm=5 (trainer.py:147-148).
        parts.append(optax.clip_by_global_norm(5.0))
    parts += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*parts)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx, schedule


def create_train_state(model, cfg: TrainConfig, steps_per_epoch: int,
                       sample_batch, rng) -> TrainState:
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, sample_batch, train=False)
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
