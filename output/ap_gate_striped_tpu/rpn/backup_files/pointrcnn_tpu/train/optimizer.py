"""Optimizers and schedules (reference tools/train_utils/fastai_optim.py,
learning_schedules_fastai.py, train_rcnn.py:88-143).

``adam_onecycle`` reproduces the fastai OptimWrapper + OneCycle combination:
Adam(b2=0.99) with cosine-annealed lr (lr_max/div -> lr_max -> lr_max/div/1e4)
and cosine-cycled b1 (moms[0] -> moms[1] -> moms[0]), true decoupled weight
decay applied to *all* params (the reference passes bn_wd=True,
train_rcnn.py:106-107), and global-norm gradient clipping
(train_utils.py:135).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import optax


def annealing_cos(start: float, end: float, pct):
    """Cosine anneal (reference learning_schedules_fastai.py:49-52)."""
    cos_out = jnp.cos(np.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_schedule(total_steps: int, peak: float, div_factor: float, pct_start: float):
    a1 = int(total_steps * pct_start)
    a2 = max(total_steps - a1, 1)
    low = peak / div_factor

    def schedule(step):
        step = jnp.minimum(step, total_steps)
        up = annealing_cos(low, peak, step / max(a1, 1))
        down = annealing_cos(peak, low / 1e4, (step - a1) / a2)
        return jnp.where(step < a1, up, down)

    return schedule


def onecycle_momentum_schedule(total_steps: int, moms, pct_start: float):
    a1 = int(total_steps * pct_start)
    a2 = max(total_steps - a1, 1)

    def schedule(step):
        step = jnp.minimum(step, total_steps)
        down = annealing_cos(moms[0], moms[1], step / max(a1, 1))
        up = annealing_cos(moms[1], moms[0], (step - a1) / a2)
        return jnp.where(step < a1, down, up)

    return schedule


def epoch_decay_schedule(base_lr: float, decay_list, lr_decay: float, lr_clip: float,
                         steps_per_epoch: int):
    """LambdaLR-style per-epoch decay (reference train_rcnn.py:121-126)."""
    boundaries = np.asarray(decay_list) * steps_per_epoch

    def schedule(step):
        decay = jnp.ones_like(step, jnp.float32)
        for b in boundaries:
            decay = jnp.where(step >= b, decay * lr_decay, decay)
        return base_lr * jnp.maximum(decay, lr_clip / base_lr)

    return schedule


def bn_momentum_for_epoch(cfg, epoch: int) -> float:
    """BNMomentumScheduler value (reference train_utils.py:24-45,
    train_rcnn.py:128-133); torch-convention momentum."""
    decay = 1.0
    for step in cfg.TRAIN.BN_DECAY_STEP_LIST:
        if epoch >= step:
            decay *= cfg.TRAIN.BN_DECAY
    return max(cfg.TRAIN.BN_MOMENTUM * decay, cfg.TRAIN.BNM_CLIP)


def build_optimizer(cfg, total_steps: int, steps_per_epoch: int) -> optax.GradientTransformation:
    t = cfg.TRAIN
    clip = optax.clip_by_global_norm(t.GRAD_NORM_CLIP)

    if t.OPTIMIZER == "adam_onecycle":
        lr = onecycle_schedule(total_steps, t.LR, t.DIV_FACTOR, t.PCT_START)
        b1 = onecycle_momentum_schedule(total_steps, tuple(t.MOMS), t.PCT_START)
        opt = optax.chain(
            clip,
            optax.inject_hyperparams(
                lambda b1, b2: optax.scale_by_adam(b1=b1, b2=b2)
            )(b1=b1, b2=0.99),
            optax.add_decayed_weights(t.WEIGHT_DECAY),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(-learning_rate))(
                learning_rate=lr
            ),
        )
        return opt

    lr = epoch_decay_schedule(t.LR, t.DECAY_STEP_LIST, t.LR_DECAY, t.LR_CLIP, steps_per_epoch)
    if t.OPTIMIZER == "adam":
        # torch Adam weight_decay is L2 (coupled) — matches optax.adamw? no:
        # coupled L2 adds wd*p to the gradient before the adam transform
        return optax.chain(
            clip,
            optax.add_decayed_weights(t.WEIGHT_DECAY) if t.WEIGHT_DECAY else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(-learning_rate))(
                learning_rate=lr
            ),
        )
    if t.OPTIMIZER == "sgd":
        return optax.chain(
            clip,
            optax.add_decayed_weights(t.WEIGHT_DECAY) if t.WEIGHT_DECAY else optax.identity(),
            optax.trace(decay=t.MOMENTUM),
            optax.inject_hyperparams(lambda learning_rate: optax.scale(-learning_rate))(
                learning_rate=lr
            ),
        )
    raise NotImplementedError(t.OPTIMIZER)
