"""System-level eval throughput: loader -> device forward -> KITTI dumps.

Measures what a user actually gets from `tools/eval.py --eval_mode rcnn`
(reference eval_rcnn.py's tqdm loop): the host data pipeline, the jitted
two-stage forward, recall accounting, and per-sample KITTI result files —
end to end over a synthetic val split, with the evaluator's one-batch-deep
pipelining (device compute overlaps host decode + IO).

Usage: python tools/bench_eval_e2e.py [num_scenes] [batch_size]
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
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    from kitti_fixture import make_mini_kitti
    from __graft_entry__ import _flagship_cfg
    from pointrcnn_tpu.data.loader import DataLoader
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.eval.evaluator import eval_one_epoch_joint
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state

    root = "/tmp/bench_kitti_e2e"
    shutil.rmtree(root, ignore_errors=True)
    make_mini_kitti(root, num_samples=num_scenes, n_points=16384, split="val",
                    classes=("Car", "Car", "Car"))

    cfg = _flagship_cfg()
    import logging

    logging.basicConfig(level=logging.WARNING)
    logger = logging.getLogger("bench_e2e")
    logger.setLevel(logging.WARNING)
    dataset = KittiRCNNDataset(
        root, cfg, npoints=cfg.RPN.NUM_POINTS, split="val", mode="EVAL",
        classes=cfg.CLASSES, logger=logger, random_select=True,
        rpn_eval_labels=False,  # joint eval never reads them
    )
    loader = DataLoader(dataset, batch_size=batch_size, num_workers=4)

    model = PointRCNN(cfg=cfg, mode="TEST")
    batch = dataset.collate_batch(
        [dataset.getitem(i, np.random.RandomState(i)) for i in range(batch_size)]
    )
    sample = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=1, steps_per_epoch=1)
    state = create_train_state(model, cfg, sample, tx, train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out_dir = os.path.join(root, "out")
    # epoch 1 pays the compile; epoch 2 is the measurement
    for tag in ("warmup", "timed"):
        t0 = time.perf_counter()
        ret, _ = eval_one_epoch_joint(
            model, variables, cfg, loader, os.path.join(out_dir, tag), logger
        )
        dt = time.perf_counter() - t0
        print(f"{tag}: {num_scenes} scenes in {dt:.2f}s = "
              f"{num_scenes / dt:.1f} scenes/sec end-to-end "
              f"(batch {batch_size}, incl. loader + KITTI dumps)", flush=True)


if __name__ == "__main__":
    main()
