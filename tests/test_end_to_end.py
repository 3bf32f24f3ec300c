"""Full-slice integration: data -> train -> checkpoint -> eval -> KITTI AP."""

import logging
import os

import numpy as np
import jax
import pytest

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.data.loader import DataLoader
from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
from pointrcnn_tpu.eval.evaluator import eval_one_epoch_joint, eval_one_epoch_rpn
from pointrcnn_tpu.eval.kitti_eval import evaluate
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_params_partial,
    save_checkpoint,
)
from pointrcnn_tpu.train.optimizer import build_optimizer
from pointrcnn_tpu.train.state import create_train_state
from pointrcnn_tpu.train.trainer import Trainer

from kitti_fixture import make_mini_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_e2e"))
    return make_mini_kitti(root, num_samples=4, n_points=3000)[0]


def tiny_cfg(joint=True):
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 512
    cfg.RPN.SA_CONFIG.NPOINTS = [128, 32]
    cfg.RPN.SA_CONFIG.RADIUS = [[0.5, 1.0], [1.0, 2.0]]
    cfg.RPN.SA_CONFIG.NSAMPLE = [[8, 8], [8, 8]]
    cfg.RPN.SA_CONFIG.MLPS = [[[8, 8], [8, 16]], [[16, 16], [16, 16]]]
    cfg.RPN.FP_MLPS = [[16, 16], [16, 16]]
    cfg.RPN.CLS_FC = [16]
    cfg.RPN.REG_FC = [16]
    cfg.RPN.LOSS_CLS = "SigmoidFocalLoss"
    cfg.RPN.USE_INTENSITY = False
    cfg.RPN.NMS_MAX_CANDIDATES = 128
    cfg.GT_AUG_ENABLED = False
    cfg.RCNN.MAX_GT_BOXES = 8
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    if joint:
        cfg.RPN.FIXED = True
        cfg.RCNN.ENABLED = True
        cfg.RCNN.ROI_SAMPLE_JIT = True
        cfg.RCNN.NUM_POINTS = 32
        cfg.RCNN.ROI_PER_IMAGE = 8
        cfg.RCNN.ROI_FG_AUG_TIMES = 2
        cfg.RCNN.SA_CONFIG.NPOINTS = [16, -1]
        cfg.RCNN.SA_CONFIG.RADIUS = [0.4, 100]
        cfg.RCNN.SA_CONFIG.NSAMPLE = [8, 8]
        cfg.RCNN.SA_CONFIG.MLPS = [[16, 16], [16, 32]]
        cfg.RCNN.XYZ_UP_LAYER = [16, 16]
        cfg.RCNN.CLS_FC = [16]
        cfg.RCNN.REG_FC = [16]
    return cfg.freeze()


def test_rpn_train_ckpt_resume(kitti_root, tmp_path):
    cfg = tiny_cfg(joint=False)
    ds = KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                          split="train", mode="TRAIN")
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=20, steps_per_epoch=2)
    batch = next(iter(loader))
    sample = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype != object}
    state = create_train_state(model, cfg, sample, tx)

    ckpt_dir = str(tmp_path / "ckpt")
    trainer = Trainer(model, cfg, tx, ckpt_dir, ckpt_save_interval=1,
                      logger=logging.getLogger("t"))
    state, it = trainer.train(state, 0, 2, loader)
    assert it == 4

    path = latest_checkpoint(ckpt_dir)
    assert path and path.endswith("checkpoint_epoch_2")
    state2 = create_train_state(model, cfg, sample, tx, seed=123)
    state2, epoch, it2 = load_checkpoint(path, state2)
    assert (epoch, it2) == (2, 4)
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_partial_restore_and_joint_eval(kitti_root, tmp_path):
    # 1) make an RPN-only checkpoint
    rpn_cfg = tiny_cfg(joint=False)
    model_rpn = PointRCNN(cfg=rpn_cfg, mode="TRAIN")
    ds = KittiRCNNDataset(kitti_root, rpn_cfg, npoints=rpn_cfg.RPN.NUM_POINTS,
                          split="train", mode="TRAIN")
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    batch = next(iter(loader))
    sample = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(rpn_cfg, total_steps=10, steps_per_epoch=2)
    state = create_train_state(model_rpn, rpn_cfg, sample, tx)
    ckpt = save_checkpoint(str(tmp_path / "rpn_ckpt"), state, 1, 1)

    # 2) build the joint model and load RPN weights into it
    cfg = tiny_cfg(joint=True)
    model = PointRCNN(cfg=cfg, mode="TEST")
    ds_joint = KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                                split="train", mode="TRAIN")
    jl = DataLoader(ds_joint, batch_size=2, drop_last=True)
    jb = next(iter(jl))
    jsample = {k: v for k, v in jb.items() if isinstance(v, np.ndarray) and v.dtype != object}
    jtx = build_optimizer(cfg, total_steps=10, steps_per_epoch=2)
    jstate = create_train_state(model, cfg, jsample, jtx)
    params, stats = load_params_partial(ckpt, jstate.params, jstate.batch_stats, ("rpn",))
    old_leaf = np.asarray(jax.tree_util.tree_leaves(jstate.params["rpn"])[0])
    new_leaf = np.asarray(jax.tree_util.tree_leaves(params["rpn"])[0])
    src_leaf = np.asarray(jax.tree_util.tree_leaves(state.params["rpn"])[0])
    np.testing.assert_allclose(new_leaf, src_leaf)
    jstate = jstate.replace(params=params, batch_stats=stats)

    # 3) joint eval -> KITTI files -> AP evaluator runs end to end
    eval_ds = KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                               split="val", mode="EVAL")
    eval_loader = DataLoader(eval_ds, batch_size=2)
    result_dir = str(tmp_path / "eval")
    variables = {"params": jstate.params, "batch_stats": jstate.batch_stats}
    ret, out_dir = eval_one_epoch_joint(model, variables, cfg, eval_loader, result_dir)
    assert "recall_0.5" in ret
    files = sorted(os.listdir(out_dir))
    assert len(files) == 4  # one txt per val sample (empty ones included)

    split_file = os.path.join(kitti_root, "KITTI", "ImageSets", "val.txt")
    label_dir = os.path.join(kitti_root, "KITTI", "object", "training", "label_2")
    result_str, ap = evaluate(label_dir, out_dir, split_file, current_classes=(0,))
    assert "Car_3d_moderate" in ap  # untrained net: AP value itself is arbitrary


def test_rpn_eval_with_feature_dump(kitti_root, tmp_path):
    cfg = tiny_cfg(joint=False)
    model = PointRCNN(cfg=cfg, mode="TEST")
    ds = KittiRCNNDataset(kitti_root, cfg, npoints=cfg.RPN.NUM_POINTS,
                          split="val", mode="EVAL")
    loader = DataLoader(ds, batch_size=2)
    batch = next(iter(loader))
    sample = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=10, steps_per_epoch=2)
    state = create_train_state(model, cfg, sample, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result_dir = str(tmp_path / "rpn_eval")
    ret, out_dir = eval_one_epoch_rpn(
        model, variables, cfg, loader, result_dir, save_rpn_feature=True
    )
    assert "recall_0.5" in ret and "rpn_seg_iou" in ret
    feats = np.load(os.path.join(result_dir, "features", "000000.npy"))
    assert feats.shape == (cfg.RPN.NUM_POINTS, cfg.RPN.FP_MLPS[0][-1])
    xyz = np.load(os.path.join(result_dir, "features", "000000_xyz.npy"))
    assert xyz.shape == (cfg.RPN.NUM_POINTS, 3)
