"""Training CLI (reference tools/train_rcnn.py).

Modes (reference train_rcnn.py:151-164):
  rpn          — train stage 1
  rcnn         — train stage 2 online (frozen RPN weights via --rpn_ckpt)
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="PointRCNN-TPU trainer")
    p.add_argument("--cfg_file", type=str, default="cfgs/default.yaml")
    p.add_argument("--train_mode", type=str, required=True,
                   choices=["rpn", "rcnn", "rcnn_offline"])
    p.add_argument("--rcnn_training_roi_dir", type=str, default=None,
                   help="rpn proposal txts for offline rcnn training")
    p.add_argument("--rcnn_training_feature_dir", type=str, default=None,
                   help="rpn feature npys for offline rcnn training")
    p.add_argument("--rcnn_eval_roi_dir", type=str, default=None,
                   help="val-split rpn proposal txts for --train_with_eval in "
                        "rcnn_offline mode (reference train_rcnn.py:44-46)")
    p.add_argument("--rcnn_eval_feature_dir", type=str, default=None,
                   help="val-split rpn feature npys for --train_with_eval in "
                        "rcnn_offline mode")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--workers", type=int, default=None,
                   help="loader workers (default: min(8, cpu_count))")
    p.add_argument("--worker_processes", action="store_true",
                   help="fork process-pool workers instead of threads "
                        "(the reference DataLoader shape; for multi-core hosts)")
    p.add_argument("--ckpt_save_interval", type=int, default=5)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None, help="resume checkpoint")
    p.add_argument("--rpn_ckpt", type=str, default=None,
                   help="RPN weights for rcnn training (stage hand-off)")
    p.add_argument("--gt_database", type=str,
                   default="data/gt_database/train_gt_database_level_Car.pkl")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--train_with_eval", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def create_logger(log_file, name):
    os.makedirs(os.path.dirname(log_file), exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = parse_args()
    from pointrcnn_tpu.config import format_config, load_config
    from pointrcnn_tpu.data.loader import DataLoader
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.parallel.mesh import make_mesh
    from pointrcnn_tpu.train.checkpoint import load_checkpoint, load_params_partial
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state
    from pointrcnn_tpu.train.trainer import Trainer

    cfg = load_config(args.cfg_file, args.set_cfgs)
    tag = os.path.splitext(os.path.basename(args.cfg_file))[0]

    # mode switch (reference train_rcnn.py:151-164)
    overrides = []
    if args.train_mode == "rpn":
        overrides += ["RPN.ENABLED", "True", "RCNN.ENABLED", "False"]
        root_result_dir = os.path.join("output", "rpn", tag)
    elif args.train_mode == "rcnn":
        overrides += [
            "RPN.ENABLED", "True", "RPN.FIXED", "True", "RCNN.ENABLED", "True",
        ]
        root_result_dir = os.path.join("output", "rcnn", tag)
    else:  # rcnn_offline: stage 2 over saved RPN proposals/features
        overrides += [
            "RPN.ENABLED", "False", "RCNN.ENABLED", "True",
            "RCNN.ROI_SAMPLE_JIT", "False",
        ]
        root_result_dir = os.path.join("output", "rcnn_offline", tag)
        assert args.rcnn_training_roi_dir and args.rcnn_training_feature_dir, (
            "rcnn_offline requires --rcnn_training_roi_dir and "
            "--rcnn_training_feature_dir (produced by tools/eval.py "
            "--eval_mode rpn --save_rpn_feature)"
        )
    from pointrcnn_tpu.config import merge_from_list

    cfg = merge_from_list(cfg, overrides)
    if args.output_dir is not None:
        root_result_dir = args.output_dir
    os.makedirs(root_result_dir, exist_ok=True)

    logger = create_logger(os.path.join(root_result_dir, "log_train.txt"), "train")
    logger.info("**** config ****\n%s", format_config(cfg))
    from pointrcnn_tpu.utils.snapshot import backup_source

    backup_source(root_result_dir, logger)

    gt_db = args.gt_database if cfg.GT_AUG_ENABLED and os.path.exists(args.gt_database) else None
    train_set = KittiRCNNDataset(
        args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS, split=cfg.TRAIN.SPLIT,
        mode="TRAIN", classes=cfg.CLASSES, gt_database_path=gt_db, logger=logger,
        rcnn_training_roi_dir=args.rcnn_training_roi_dir,
        rcnn_training_feature_dir=args.rcnn_training_feature_dir,
    )
    train_loader = DataLoader(
        train_set, batch_size=args.batch_size, shuffle=True,
        num_workers=args.workers, drop_last=True, seed=args.seed,
        use_processes=args.worker_processes,
    )
    val_loader = None
    if args.train_with_eval:
        val_set = KittiRCNNDataset(
            args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS, split=cfg.TRAIN.VAL_SPLIT,
            mode="EVAL", classes=cfg.CLASSES, logger=logger,
            rcnn_eval_roi_dir=args.rcnn_eval_roi_dir,
            rcnn_eval_feature_dir=args.rcnn_eval_feature_dir,
        )
        val_loader = DataLoader(val_set, batch_size=args.batch_size, num_workers=args.workers,
                                use_processes=args.worker_processes)

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    steps_per_epoch = len(train_loader)
    total_steps = steps_per_epoch * args.epochs
    tx = build_optimizer(cfg, total_steps, steps_per_epoch)

    sample = next(iter(train_loader))
    sample = {k: v for k, v in sample.items()
              if isinstance(v, np.ndarray) and v.dtype != object}
    state = create_train_state(model, cfg, sample, tx, seed=args.seed)

    start_epoch = start_it = 0
    ckpt_dir = os.path.join(root_result_dir, "ckpt")
    if args.ckpt:
        state, start_epoch, start_it = load_checkpoint(args.ckpt, state)
        logger.info("resumed from %s at epoch %d", args.ckpt, start_epoch)
    elif args.rpn_ckpt:
        params, stats = load_params_partial(
            args.rpn_ckpt, state.params, state.batch_stats, ("rpn",)
        )
        state = state.replace(params=params, batch_stats=stats)
        logger.info("loaded RPN weights from %s", args.rpn_ckpt)

    mesh = None
    import jax

    n_dev = len(jax.devices())
    while n_dev > 1 and args.batch_size % n_dev != 0:
        n_dev -= 1
    if n_dev > 1:
        mesh = make_mesh(n_dev)
        logger.info("data-parallel over %d devices", n_dev)

    tb_log = None
    try:
        from tensorboardX import SummaryWriter

        tb_log = SummaryWriter(log_dir=os.path.join(root_result_dir, "tensorboard"))
    except Exception:
        pass

    trainer = Trainer(
        model, cfg, tx, ckpt_dir, mesh=mesh,
        ckpt_save_interval=args.ckpt_save_interval, tb_log=tb_log, logger=logger,
        rng_seed=args.seed,
    )
    trainer.train(state, start_epoch, args.epochs, train_loader, val_loader,
                  start_it=start_it)
    logger.info("**** training finished ****")


if __name__ == "__main__":
    main()
