"""RPN training-step throughput on TPU (BASELINE.json config #3 workload:
batch 16, 16384 points, gt-aug labels, bin-based loss)."""

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

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])

    n = cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(0)
    batch = {
        "pts_input": jnp.asarray(_synthetic_cloud(batch_size, n)),
        "rpn_cls_label": jnp.asarray(
            rng.choice([-1, 0, 1], size=(batch_size, n), p=[0.05, 0.85, 0.1]).astype(np.int32)
        ),
        "rpn_reg_label": jnp.asarray(rng.randn(batch_size, n, 7).astype(np.float32)),
    }
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=100, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    step = make_train_step(model, cfg, tx, donate=False)

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
        f"rpn train: batch {batch_size}, {dt / iters * 1000:.1f} ms/step, "
        f"{batch_size * iters / dt:.2f} frames/sec/chip"
    )


if __name__ == "__main__":
    main()
