"""Per-stage host-side sample-prep roofline for TRAIN mode (1-core host).

Times each stage of KittiRCNNDataset.get_rpn_sample + collate on the
synthetic KITTI fixture, to target native/C++ moves for the system-level
training pipeline (tools/bench_train_e2e.py).

Usage: python tools/profile_host_prep.py [num_scenes]
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def timeit(label, fn, iters):
    t0 = time.perf_counter()
    for i in range(iters):
        fn(i)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label:42s} {dt:8.3f} ms/sample")
    return dt


def main():
    from kitti_fixture import make_mini_kitti
    from __graft_entry__ import _flagship_cfg
    from pointrcnn_tpu.config import merge_from_list
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.data.gt_database import GTDatabaseGenerator
    from pointrcnn_tpu.utils.np_geometry import points_in_boxes3d

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    root = "/tmp/bench_kitti_prof"
    shutil.rmtree(root, ignore_errors=True)
    make_mini_kitti(root, num_samples=n, n_points=16384, split="train",
                    classes=("Car", "Car", "Car"))

    cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])
    gt_db_path = os.path.join(root, "gt_database.pkl")
    builder = GTDatabaseGenerator(root, split="train", classes="Car")
    builder.generate_gt_database()
    builder.save(gt_db_path)

    logger = logging.getLogger("prof")
    ds = KittiRCNNDataset(root, cfg, npoints=cfg.RPN.NUM_POINTS, split="train",
                          mode="TRAIN", classes=cfg.CLASSES, logger=logger,
                          gt_database_path=gt_db_path)

    ids = [i % len(ds) for i in range(n)]
    rngs = [np.random.RandomState(1000 + i) for i in range(n)]

    # full sample
    t_full = timeit("get_rpn_sample (full)", lambda i: ds.get_rpn_sample(
        ids[i], np.random.RandomState(1000 + i)), n)

    # stage 1: IO + projection + valid filter
    def stage_io(i):
        sid = int(ds.sample_id_list[ids[i]])
        calib = ds.get_calib(sid)
        img_shape = ds.get_image_shape(sid)
        pts_lidar = ds.get_lidar(sid)
        pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
        pts_img, pts_depth = calib.rect_to_img(pts_rect)
        valid = ds.get_valid_flag(pts_rect, pts_img, pts_depth, img_shape)
        return pts_rect[valid], pts_lidar[valid, 3]

    t_io = timeit("io + project + range filter", stage_io, n)

    pre = [stage_io(i) for i in range(n)]

    # stage 2: gt-aug paste
    from pointrcnn_tpu.data.object3d import objs_to_boxes3d as _objs2b

    def stage_gtaug(i):
        sid = int(ds.sample_id_list[ids[i]])
        all_gt = _objs2b(ds.filtrate_dc_objects(ds.get_label(sid)))
        pts_rect, inten = pre[i]
        return ds.apply_gt_aug_to_one_scene(sid, pts_rect.copy(), inten.copy(),
                                            all_gt, rngs[i])

    t_aug = timeit("gt-aug paste (iou + carve)", stage_gtaug, n)

    # stage 3: stratified sampling
    def stage_sample(i):
        pts_rect, inten = pre[i]
        rng = np.random.RandomState(i)
        depth = pts_rect[:, 2]
        near_idxs = np.nonzero(depth < 40.0)[0]
        far_idxs = np.nonzero(depth >= 40.0)[0]
        take_near = ds.npoints - len(far_idxs)
        if len(pts_rect) > ds.npoints and take_near > 0:
            near_choice = rng.choice(near_idxs, take_near, replace=False)
            choice = np.concatenate([near_choice, far_idxs]) if len(far_idxs) else near_choice
        else:
            choice = np.arange(len(pts_rect))
        rng.shuffle(choice)
        return pts_rect[choice[: ds.npoints]]

    t_strat = timeit("depth-stratified sample", stage_sample, n)

    clouds = [stage_sample(i) for i in range(n)]

    # stage 4: scene augmentation
    def stage_scene(i):
        gt = np.array([[0, 1, 20, 1.5, 1.6, 3.9, 0.3]], np.float32)
        return ds.data_augmentation(clouds[i].astype(np.float32), gt.copy(),
                                    np.array([0.1], np.float32), rngs[i])

    t_scene = timeit("scene aug (rot/scale/flip)", stage_scene, n)

    # stage 5: host label generation (for reference; off by default)
    gt = np.array([[0, 1, 20, 1.5, 1.6, 3.9, 0.3],
                   [5, 1, 30, 1.5, 1.6, 3.9, -0.4]], np.float32)

    t_label = timeit("host label gen (off by default)",
                     lambda i: ds.generate_rpn_training_labels(clouds[i], gt), n)

    # collate
    samples = [ds.get_rpn_sample(ids[i], np.random.RandomState(i)) for i in range(16)]

    def stage_collate(i):
        return ds.collate_batch(samples)

    t_col = timeit("collate (per batch-16 call)", stage_collate, 8)
    print(f"  {'collate per sample':42s} {t_col / 16:8.3f} ms/sample")

    print(f"\n  sum of stages (io+aug+sample+scene): "
          f"{t_io + t_aug + t_strat + t_scene:8.3f} ms/sample vs full {t_full:.3f}")
    print(f"  1-core ceiling at full cost: {1e3 / t_full:.1f} scenes/sec")


if __name__ == "__main__":
    main()
