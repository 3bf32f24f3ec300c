"""Evaluation CLI (reference tools/eval_rcnn.py).

Modes:
  rpn   — RPN-only eval: proposal recall, seg IoU, optional feature dump
          (--save_rpn_feature) for the offline RCNN stage interface
  rcnn  — full two-stage eval: recall, KITTI result files, official AP

--eval_all evaluates every checkpoint in the ckpt dir (reference
repeat_eval_ckpt / eval_all, eval_rcnn.py:729-841).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="PointRCNN-TPU evaluator")
    p.add_argument("--cfg_file", type=str, default="cfgs/default.yaml")
    p.add_argument("--eval_mode", type=str, required=True,
                   choices=["rpn", "rcnn", "rcnn_offline"])
    p.add_argument("--rcnn_eval_roi_dir", type=str, default=None)
    p.add_argument("--rcnn_eval_feature_dir", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--rpn_ckpt", type=str, default=None,
                   help="restore only the RPN subtree from this checkpoint "
                        "(reference eval_rcnn.py:35 + load_ckpt_based_on_args "
                        "eval_rcnn.py:698-726: full --ckpt first, then stage "
                        "subtrees override)")
    p.add_argument("--rcnn_ckpt", type=str, default=None,
                   help="restore only the RCNN subtree from this checkpoint")
    p.add_argument("--eval_all", action="store_true")
    p.add_argument("--extra_tag", type=str, default="default",
                   help="extra tag appended to the output dir for multiple "
                        "evaluations of one config (reference eval_rcnn.py:40,"
                        "738-739)")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="checkpoint directory for --eval_all (reference "
                        "eval_rcnn.py:42; defaults to --ckpt)")
    # --random_select exists in the reference CLI (eval_rcnn.py:48) but is
    # action='store_true' with default=True — it can never be disabled from
    # the command line, so the fixed-shape eval path here matches exactly
    p.add_argument("--start_epoch", type=int, default=0,
                   help="with --eval_all: skip checkpoints whose epoch is "
                        "below this (reference eval_rcnn.py:49, 795)")
    p.add_argument("--wait", action="store_true",
                   help="with --eval_all: keep polling the ckpt dir for new "
                        "checkpoints (reference repeat_eval_ckpt, eval_rcnn.py:784-841)")
    p.add_argument("--test", action="store_true", help="test split (no labels)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--workers", type=int, default=None,
                   help="loader workers (default: min(8, cpu_count))")
    p.add_argument("--worker_processes", action="store_true",
                   help="fork process-pool workers instead of threads "
                        "(the reference DataLoader shape; for multi-core hosts)")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--save_rpn_feature", action="store_true")
    p.add_argument("--save_result", action="store_true")
    p.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()



AP_CLASSES = {  # cfg.CLASSES -> kitti_eval class indices
    "Car": (0,), "Pedestrian": (1,), "Cyclist": (2,), "People": (1, 2),
}

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


def eval_ckpt(args, cfg, ckpt_path, logger):
    import jax
    from pointrcnn_tpu.data.loader import DataLoader
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.eval.evaluator import (
        eval_one_epoch_joint,
        eval_one_epoch_rcnn_offline,
        eval_one_epoch_rpn,
    )
    from pointrcnn_tpu.eval.kitti_eval import evaluate
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.checkpoint import load_checkpoint
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state

    np.random.seed(666 if args.eval_mode == "rcnn" else 1024)  # reference seeds
    split = cfg.TEST.SPLIT if not args.test else "test"
    mode = "TEST" if args.test else "EVAL"
    dataset = KittiRCNNDataset(
        args.data_root, cfg, npoints=cfg.RPN.NUM_POINTS, split=split, mode=mode,
        classes=cfg.CLASSES, logger=logger, random_select=True,
        rcnn_eval_roi_dir=args.rcnn_eval_roi_dir,
        rcnn_eval_feature_dir=args.rcnn_eval_feature_dir,
        # per-point labels only feed the rpn evaluator's seg-IoU; skip the
        # host label pass for the joint/offline modes
        rpn_eval_labels=(args.eval_mode == "rpn"),
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, num_workers=args.workers,
                        use_processes=args.worker_processes)

    from pointrcnn_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    while n_dev > 1 and args.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        logger.info("data-parallel eval over %d devices", n_dev)

    model = PointRCNN(cfg=cfg, mode="TEST")
    if args.eval_mode == "rcnn_offline":
        from pointrcnn_tpu.models.rcnn import rcnn_input_channels

        in_ch = rcnn_input_channels(cfg) + 128  # + rpn feature width
        sample = {
            "pts_input": np.zeros((1, cfg.RCNN.NUM_POINTS, in_ch), np.float32)
        }
    else:
        batch = dataset.collate_batch(
            [dataset.getitem(i, np.random.RandomState(i)) for i in range(min(args.batch_size, len(dataset)))]
        )
        sample = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=1, steps_per_epoch=1)
    state = create_train_state(model, cfg, sample, tx, train=False)
    # restore order mirrors the reference's load_ckpt_based_on_args
    # (eval_rcnn.py:698-726): full --ckpt first, then the RPN / RCNN stage
    # subtrees override from their own checkpoints
    from pointrcnn_tpu.train.checkpoint import epoch_from_path, load_params_partial

    epoch = 0
    if ckpt_path is not None:
        state, epoch, _ = load_checkpoint(ckpt_path, state)
    params, batch_stats = state.params, state.batch_stats
    if args.rpn_ckpt is not None:
        logger.info("==> loading RPN subtree from %s", args.rpn_ckpt)
        params, batch_stats = load_params_partial(
            args.rpn_ckpt, params, batch_stats, ("rpn",))
        epoch = epoch_from_path(args.rpn_ckpt) or epoch
    if args.rcnn_ckpt is not None:
        logger.info("==> loading RCNN subtree from %s", args.rcnn_ckpt)
        params, batch_stats = load_params_partial(
            args.rcnn_ckpt, params, batch_stats, ("rcnn_net",))
        epoch = epoch_from_path(args.rcnn_ckpt) or epoch
    variables = {"params": params, "batch_stats": batch_stats}
    if mesh is not None:
        from pointrcnn_tpu.parallel.mesh import replicated

        variables = jax.device_put(variables, replicated(mesh))

    anchor = ckpt_path or args.rcnn_ckpt or args.rpn_ckpt
    out_root = args.output_dir or os.path.join(
        os.path.dirname(os.path.dirname(anchor)), "eval", f"epoch_{epoch}", split
    )
    os.makedirs(out_root, exist_ok=True)

    if args.eval_mode == "rcnn_offline":
        ret, final_dir = eval_one_epoch_rcnn_offline(
            model, variables, cfg, loader, out_root, logger,
            test_mode=args.test, mesh=mesh,
        )
        if not args.test:
            split_file = os.path.join(args.data_root, "KITTI", "ImageSets", f"{split}.txt")
            label_dir = os.path.join(args.data_root, "KITTI", "object", "training", "label_2")
            result_str, ap = evaluate(label_dir, final_dir, split_file,
                                      current_classes=AP_CLASSES[cfg.CLASSES])
            logger.info("\n%s", result_str)
            ret.update(ap)
        return ret

    if args.eval_mode == "rpn":
        ret, _ = eval_one_epoch_rpn(
            model, variables, cfg, loader, out_root, logger,
            test_mode=args.test, save_rpn_feature=args.save_rpn_feature,
            mesh=mesh,
        )
        return ret

    ret, final_dir = eval_one_epoch_joint(
        model, variables, cfg, loader, out_root, logger,
        test_mode=args.test, save_result=args.save_result, mesh=mesh,
    )
    if not args.test:
        split_file = os.path.join(args.data_root, "KITTI", "ImageSets", f"{split}.txt")
        label_dir = os.path.join(args.data_root, "KITTI", "object", "training", "label_2")
        result_str, ap = evaluate(label_dir, final_dir, split_file,
                                      current_classes=AP_CLASSES[cfg.CLASSES])
        logger.info("\n%s", result_str)
        ret.update(ap)
    return ret


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    args = parse_args()
    from pointrcnn_tpu.config import load_config, merge_from_list
    from pointrcnn_tpu.train.checkpoint import list_checkpoints

    cfg = load_config(args.cfg_file, args.set_cfgs)
    if args.eval_mode == "rcnn_offline":
        overrides = ["RPN.ENABLED", "False", "RCNN.ENABLED", "True",
                     "RCNN.ROI_SAMPLE_JIT", "False"]
        assert args.rcnn_eval_roi_dir and args.rcnn_eval_feature_dir, (
            "rcnn_offline eval requires --rcnn_eval_roi_dir and "
            "--rcnn_eval_feature_dir"
        )
    else:
        overrides = ["RPN.ENABLED", "True"]
        overrides += ["RCNN.ENABLED", "True" if args.eval_mode == "rcnn" else "False"]
    cfg = merge_from_list(cfg, overrides)

    tag = os.path.splitext(os.path.basename(args.cfg_file))[0]
    if args.extra_tag != "default":
        # nest ALL outputs (log + result trees via args.output_dir) under the
        # tag (reference eval_rcnn.py:738-739)
        args.output_dir = os.path.join(
            args.output_dir or os.path.join("output", args.eval_mode, tag),
            args.extra_tag,
        )
    log_dir = args.output_dir or os.path.join("output", args.eval_mode, tag)
    logger = create_logger(os.path.join(log_dir, "log_eval.txt"), "eval")
    from pointrcnn_tpu.utils.snapshot import backup_source

    backup_source(log_dir, logger)

    if args.eval_all:
        import time

        from tensorboardX import SummaryWriter

        # per-checkpoint eval scalars (reference eval_rcnn.py:833-836)
        tb_log = SummaryWriter(
            log_dir=os.path.join(log_dir, f"tensorboard_{cfg.TEST.SPLIT}")
        )
        evaluated: set[int] = set()
        while True:
            ckpts = [c for c in list_checkpoints(args.ckpt_dir or args.ckpt)
                     if c[0] not in evaluated and c[0] >= args.start_epoch]
            if not ckpts and not args.wait:
                assert evaluated, (
                    f"no checkpoints under {args.ckpt_dir or args.ckpt} "
                    f"with epoch >= {args.start_epoch}"
                )
                break
            for epoch, path in ckpts:
                logger.info("==== evaluating %s ====", path)
                ret = eval_ckpt(args, cfg, path, logger)
                logger.info("epoch %d: %s", epoch, ret)
                for key, val in ret.items():
                    if isinstance(val, (int, float, np.floating, np.integer)):
                        tb_log.add_scalar(key, float(val), epoch)
                tb_log.flush()
                evaluated.add(epoch)
            if not args.wait:
                break
            time.sleep(30)  # poll interval (reference eval_rcnn.py:817-824)
    else:
        assert args.ckpt or args.rpn_ckpt or args.rcnn_ckpt, (
            "one of --ckpt / --rpn_ckpt / --rcnn_ckpt required"
        )
        ret = eval_ckpt(args, cfg, args.ckpt, logger)
        logger.info("result: %s", ret)


if __name__ == "__main__":
    main()
