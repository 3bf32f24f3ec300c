"""Training loop (reference tools/train_utils/train_utils.py:114-240).

Epoch/iteration loop over the prefetching DataLoader, one fused jitted
train step per batch (forward + loss + backward + clip + optimizer update),
BN-momentum scheduling per epoch, tensorboard scalars, periodic checkpoints,
and loss-only validation epochs.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from pointrcnn_tpu.parallel.mesh import shard_batch
from pointrcnn_tpu.train.checkpoint import save_checkpoint
from pointrcnn_tpu.train.loss import model_loss
from pointrcnn_tpu.train.optimizer import bn_momentum_for_epoch
from pointrcnn_tpu.train.state import make_train_step


def _batch_to_device(batch: dict, mesh=None) -> dict:
    arrays = {
        k: v for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype != object
    }
    if mesh is not None:
        return shard_batch(arrays, mesh)
    return arrays


class Trainer:
    def __init__(
        self,
        model,
        cfg,
        tx,
        ckpt_dir: str,
        mesh=None,
        eval_frequency: int = 1,
        ckpt_save_interval: int = 5,
        tb_log=None,
        logger: logging.Logger | None = None,
        rng_seed: int = 0,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (10, 15),
    ):
        self.model = model
        self.cfg = cfg
        self.tx = tx
        self.ckpt_dir = ckpt_dir
        self.mesh = mesh
        self.eval_frequency = eval_frequency
        self.ckpt_save_interval = ckpt_save_interval
        self.tb_log = tb_log
        self.logger = logger or logging.getLogger(__name__)
        self.rng = jax.random.PRNGKey(rng_seed)
        self.train_step = make_train_step(model, cfg, tx)
        # jitted ONCE here: a fresh closure per eval_epoch call would retrace
        # + recompile the full joint graph (~50 s on TPU) every val epoch
        self._eval_loss = jax.jit(self._val_loss_fn)
        # optional jax.profiler trace window (the reference has no tracing;
        # SURVEY §5 calls for jax.profiler hooks in the rebuild)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

    def train(self, state, start_epoch: int, n_epochs: int, train_loader,
              val_loader=None, start_it: int = 0):
        it = start_it
        os.makedirs(self.ckpt_dir, exist_ok=True)
        for epoch in range(start_epoch, n_epochs):
            train_loader.set_epoch(epoch)
            bn_momentum = bn_momentum_for_epoch(self.cfg, epoch)
            if self.tb_log is not None:
                self.tb_log.add_scalar("bn_momentum", bn_momentum, it)

            t0 = time.time()
            n_batches = 0
            for batch in train_loader:
                if self.profile_dir and it == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                device_batch = _batch_to_device(batch, self.mesh)
                state, tb = self.train_step(state, device_batch, self.rng, bn_momentum)
                it += 1
                n_batches += 1
                if self.profile_dir and it == self.profile_steps[1]:
                    jax.device_get(tb["loss"])
                    jax.profiler.stop_trace()
                if self.tb_log is not None and it % 10 == 0:
                    for k, v in tb.items():
                        self.tb_log.add_scalar(f"train_{k}", float(v), it)
            dt = time.time() - t0
            loss = float(tb["loss"]) if n_batches else float("nan")
            self.logger.info(
                "epoch %d: %d its in %.1fs (%.2f it/s), last loss %.4f",
                epoch, n_batches, dt, n_batches / max(dt, 1e-6), loss,
            )

            trained_epoch = epoch + 1
            if trained_epoch % self.ckpt_save_interval == 0:
                path = save_checkpoint(self.ckpt_dir, state, trained_epoch, it)
                self.logger.info("saved checkpoint %s", path)

            if (
                val_loader is not None
                and trained_epoch % self.eval_frequency == 0
            ):
                val_loss = self.eval_epoch(state, val_loader)
                self.logger.info("epoch %d: val loss %.4f", epoch, val_loss)
                if self.tb_log is not None:
                    self.tb_log.add_scalar("val_loss", val_loss, it)
        return state, it

    def _val_loss_fn(self, state, batch, rng):
        out, _ = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=True, bn_momentum=0.0,
            rngs={"dropout": rng, "target": rng}, mutable=["batch_stats"],
        )
        loss, _ = model_loss(self.cfg, out, batch)
        return loss

    def eval_epoch(self, state, val_loader) -> float:
        """Loss-only validation (reference train_utils.py:140-168)."""
        total, count = 0.0, 0
        for batch in val_loader:
            device_batch = _batch_to_device(batch, self.mesh)
            total += float(self._eval_loss(state, device_batch, self.rng))
            count += 1
        return total / max(count, 1)
