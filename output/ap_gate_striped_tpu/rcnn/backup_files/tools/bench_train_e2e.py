"""System-level RPN training throughput: loader + gt-aug + device step.

Measures what `tools/train.py --train_mode rpn` actually sustains — the
host data pipeline (gt-paste augmentation, scene augmentation, label
generation) feeding the jitted train step through the prefetching loader —
over a synthetic train split.  Compare against the device-only step rate
(tools/bench_train.py, ~110 fps/chip at batch 16) to see whether the host
feeds the chip.

Usage: python tools/bench_train_e2e.py [num_scenes] [batch_size]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    num_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import logging
    from kitti_fixture import make_mini_kitti
    from __graft_entry__ import _flagship_cfg
    from pointrcnn_tpu.config import merge_from_list
    from pointrcnn_tpu.data.loader import DataLoader
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.data.gt_database import GTDatabaseGenerator
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state, make_train_step

    logging.basicConfig(level=logging.WARNING)
    logger = logging.getLogger("bench_train_e2e")

    root = "/tmp/bench_kitti_train"
    shutil.rmtree(root, ignore_errors=True)
    make_mini_kitti(root, num_samples=num_scenes, n_points=16384, split="train",
                    classes=("Car", "Car", "Car"))

    cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])

    gt_db_path = os.path.join(root, "gt_database.pkl")
    builder = GTDatabaseGenerator(root, split="train", classes="Car")
    builder.generate_gt_database()
    builder.save(gt_db_path)

    dataset = KittiRCNNDataset(
        root, cfg, npoints=cfg.RPN.NUM_POINTS, split="train", mode="TRAIN",
        classes=cfg.CLASSES, logger=logger, gt_database_path=gt_db_path,
    )
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, seed=0,
                        num_workers=4, drop_last=True)

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    loader.set_epoch(0)
    batch0 = next(iter(loader))
    sample = {k: v for k, v in batch0.items()
              if isinstance(v, np.ndarray) and v.dtype != object}
    steps_per_epoch = num_scenes // batch_size
    tx = build_optimizer(cfg, total_steps=steps_per_epoch * 3,
                         steps_per_epoch=steps_per_epoch)
    state = create_train_state(model, cfg, sample, tx)
    step = make_train_step(model, cfg, tx, donate=False)

    key = jax.random.PRNGKey(0)
    for tag in ("warmup", "timed"):
        t0 = time.perf_counter()
        n = 0
        loader.set_epoch(1 if tag == "warmup" else 2)
        for batch in loader:
            b = {k: v for k, v in batch.items()
                 if isinstance(v, np.ndarray) and v.dtype != object}
            state, tb = step(state, b, key, 0.1)
            n += 1
        jax.device_get(tb["loss"])
        dt = time.perf_counter() - t0
        print(f"{tag}: {n} steps ({n * batch_size} scenes) in {dt:.2f}s = "
              f"{n * batch_size / dt:.1f} scenes/sec end-to-end "
              f"(batch {batch_size}, gt-aug + scene-aug on host, labels on device)",
              flush=True)


if __name__ == "__main__":
    main()
