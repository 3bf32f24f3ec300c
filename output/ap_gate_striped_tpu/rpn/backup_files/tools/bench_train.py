"""Training-step throughput on TPU.

Modes (arg 2, default ``rpn``):

- ``rpn``:  BASELINE.json config #3 workload — RPN-only training step,
  batch 16, 16384 points, bin-based loss (reference train_rcnn.py
  ``--train_mode rpn``).
- ``rcnn``: stage-2 training with a fixed RPN and online proposal + target
  sampling (reference ``--train_mode rcnn`` w/ RPN.FIXED) — full two-stage
  graph incl. proposal layer, roipool and per-roi augmentation, at the
  reference's rcnn batch size 4.

Usage: python tools/bench_train.py [batch_size] [rpn|rcnn]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.config import merge_from_list
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state, make_train_step

    mode = sys.argv[2] if len(sys.argv) > 2 else "rpn"
    batch_size = (
        int(sys.argv[1]) if len(sys.argv) > 1 else (16 if mode == "rpn" else 4)
    )
    if mode == "rpn":
        cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])
    else:
        cfg = merge_from_list(
            _flagship_cfg(),
            ["RPN.ENABLED", "True", "RPN.FIXED", "True", "RCNN.ENABLED", "True"],
        )

    n = cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(0)
    batch = {
        "pts_input": jnp.asarray(_synthetic_cloud(batch_size, n)),
        "rpn_cls_label": jnp.asarray(
            rng.choice([-1, 0, 1], size=(batch_size, n), p=[0.05, 0.85, 0.1]).astype(np.int32)
        ),
        "rpn_reg_label": jnp.asarray(rng.randn(batch_size, n, 7).astype(np.float32)),
    }
    if mode == "rcnn":
        # online proposal->target sampling needs gt boxes for assignment
        G = cfg.RCNN.MAX_GT_BOXES
        gt = np.zeros((batch_size, G, 7), np.float32)
        gt[..., 0] = rng.uniform(-30, 30, (batch_size, G))
        gt[..., 1] = rng.uniform(0, 2, (batch_size, G))
        gt[..., 2] = rng.uniform(5, 60, (batch_size, G))
        gt[..., 3:6] = [1.5, 1.6, 3.9]
        gt[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, G))
        batch["gt_boxes3d"] = jnp.asarray(gt)
        batch["gt_valid"] = jnp.asarray(rng.rand(batch_size, G) < 0.6)
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=100, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    # donate like the real Trainer does (train/trainer.py) — the benched
    # step should be the production step
    step = make_train_step(model, cfg, tx)

    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, tb = step(state, batch, key, 0.1)
    jax.device_get(tb["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tb = step(state, batch, key, 0.1)
    jax.device_get(tb["loss"])
    dt = time.perf_counter() - t0
    print(
        f"{mode} train: batch {batch_size}, {dt / iters * 1000:.1f} ms/step, "
        f"{batch_size * iters / dt:.2f} frames/sec/chip"
    )


if __name__ == "__main__":
    main()
