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

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


class ClipRecordState(NamedTuple):
    grad_norm: jnp.ndarray  # pre-clip global norm of the last update


def clip_by_global_norm_recording(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with the pre-clip norm kept in state.

    Bit-identical update math to optax 0.2.6's clip_by_global_norm (same
    global_norm, same trigger/select form); the recorded norm lets the train
    step log ``grad_norm`` without a second global_norm pass — on this
    backend the 106-leaf norm reduction costs ~7.5 ms (tools/probe_loss_opt
    .py), so computing it once instead of twice is a real step-time win.
    """

    def init_fn(params):
        del params
        return ClipRecordState(grad_norm=jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        trigger = jnp.squeeze(g_norm < max_norm)

        def clip_fn(t):
            return jax.lax.select(trigger, t, (t / g_norm.astype(t.dtype)) * max_norm)

        updates = jax.tree_util.tree_map(clip_fn, updates)
        return updates, ClipRecordState(grad_norm=g_norm.astype(jnp.float32))

    return optax.GradientTransformation(init_fn, update_fn)


def recorded_grad_norm(opt_state) -> jnp.ndarray | None:
    """Pull the pre-clip grad norm recorded by clip_by_global_norm_recording
    out of a (possibly chained) optax state; None if no recording clip."""
    for leaf in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, ClipRecordState)
    ):
        if isinstance(leaf, ClipRecordState):
            return leaf.grad_norm
    return None


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
    clip = clip_by_global_norm_recording(t.GRAD_NORM_CLIP)

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
