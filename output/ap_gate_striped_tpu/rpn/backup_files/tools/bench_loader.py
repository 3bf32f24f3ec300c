"""Host data-loader throughput benchmark.

Measures scenes/sec of the full RPN training sample path — lidar load,
frustum filter, gt-paste augmentation, 16384-pt depth-stratified sampling,
scene augmentation, per-point label generation — through the multi-worker
prefetching DataLoader, at realistic point counts (~120k pts/scene raw like
KITTI). The reference gets the same job done with 8 torch DataLoader worker
processes (train_rcnn.py:28,71-73); here it is a GIL-releasing numpy thread
pool. Target: loader scenes/sec >= TPU train-step frames/sec (~60/chip) so
the device never starves.

Usage: python tools/bench_loader.py [--workers N] [--batch-size B]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=max(2, (os.cpu_count() or 1)))
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--gt-aug", action="store_true", default=True)
    ap.add_argument("--processes", action="store_true",
                    help="fork process-pool workers (the reference DataLoader "
                         "shape) instead of the GIL-releasing thread pool")
    args = ap.parse_args()

    from kitti_fixture import make_mini_kitti

    from pointrcnn_tpu.config import load_config
    from pointrcnn_tpu.data.gt_database import GTDatabaseGenerator
    from pointrcnn_tpu.data.loader import DataLoader
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset

    with tempfile.TemporaryDirectory() as root:
        make_mini_kitti(root, num_samples=args.scenes, n_points=args.points)
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", "cfgs", "default.yaml")
        )
        gt_db = None
        if args.gt_aug:
            gt_db = os.path.join(root, "gt_db.pkl")
            gen = GTDatabaseGenerator(root, split="train", classes="Car")
            gen.generate_gt_database()
            gen.save(gt_db)
        ds = KittiRCNNDataset(
            root, cfg, npoints=cfg.RPN.NUM_POINTS, split="train", mode="TRAIN",
            classes=cfg.CLASSES, gt_database_path=gt_db,
        )

        for workers in sorted({1, args.workers}):
            loader = DataLoader(
                ds, batch_size=args.batch_size, shuffle=True,
                num_workers=workers, drop_last=False,
                use_processes=args.processes,
            )
            # warm one batch (file cache, lazy imports)
            next(iter(loader))
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += batch["pts_input"].shape[0]
            dt = time.perf_counter() - t0
            print(
                f"workers={workers:2d}  {n} scenes in {dt:.2f}s  "
                f"= {n / dt:.1f} scenes/sec "
                f"({args.points} raw pts/scene, gt_aug={bool(gt_db)})"
            )


if __name__ == "__main__":
    main()
