"""Offline RCNN stage: disk interface between RPN eval and RCNN training
(reference SURVEY §3.4): feature dump -> offline roi sampling -> train step."""

import os

import numpy as np
import jax
import pytest

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.data.loader import DataLoader
from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
from pointrcnn_tpu.eval.evaluator import eval_one_epoch_rpn
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.train.optimizer import build_optimizer
from pointrcnn_tpu.train.state import create_train_state, make_train_step

from kitti_fixture import make_mini_kitti
from test_end_to_end import tiny_cfg


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_off"))
    make_mini_kitti(root, num_samples=3, n_points=2500)

    # 1) RPN eval with feature dump over the train split
    cfg = tiny_cfg(joint=False)
    model = PointRCNN(cfg=cfg, mode="TEST")
    ds = KittiRCNNDataset(root, cfg, npoints=cfg.RPN.NUM_POINTS, split="train", mode="EVAL")
    loader = DataLoader(ds, batch_size=3)
    batch = next(iter(loader))
    sample = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=5, steps_per_epoch=1)
    state = create_train_state(model, cfg, sample, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result_dir = str(tmp_path_factory.mktemp("rpn_dump"))
    eval_one_epoch_rpn(model, variables, cfg, loader, result_dir, save_rpn_feature=True)
    return root, result_dir


def offline_cfg():
    cfg = default_config()
    base = tiny_cfg(joint=True)
    # copy the tiny rcnn dims, then switch to offline mode
    for k in ("NUM_POINTS", "ROI_PER_IMAGE", "ROI_FG_AUG_TIMES", "XYZ_UP_LAYER",
              "CLS_FC", "REG_FC", "MAX_GT_BOXES"):
        cfg.RCNN[k] = base.RCNN[k]
    cfg.RCNN.SA_CONFIG = base.RCNN.SA_CONFIG.thaw()
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.RCNN.ROI_SAMPLE_JIT = False
    cfg.RCNN.XYZ_UP_LAYER = [16, 16]
    # tiny backbone features are 16-d (FP_MLPS[0][-1] in tiny cfg)
    return cfg.freeze()


def test_offline_rcnn_sampling_and_train_step(prepared):
    root, result_dir = prepared
    cfg = offline_cfg()
    roi_dir = os.path.join(result_dir, "rpn_result", "data")
    feat_dir = os.path.join(result_dir, "features")
    assert os.path.exists(os.path.join(feat_dir, "000000.npy"))

    ds = KittiRCNNDataset(
        root, cfg, npoints=512, split="train", mode="TRAIN",
        rcnn_training_roi_dir=roi_dir, rcnn_training_feature_dir=feat_dir,
    )
    rng = np.random.RandomState(0)
    s = ds.getitem(0, rng)
    R, S = cfg.RCNN.ROI_PER_IMAGE, cfg.RCNN.NUM_POINTS
    assert s["pts_input"].shape == (R, S, 5)  # xyz + seg mask + depth
    assert s["pts_features"].shape == (R, S, 16)
    assert s["cls_label"].shape == (R,)
    assert s["gt_boxes3d_ct"].shape == (R, 7)
    assert set(np.unique(s["cls_label"])).issubset({-1, 0, 1})

    loader = DataLoader(ds, batch_size=2, drop_last=True)
    batch = next(iter(loader))
    assert batch["pts_input"].shape == (2 * R, S, 5)  # roi axis merged

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    device_batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=5, steps_per_epoch=1)
    state = create_train_state(model, cfg, device_batch, tx)
    step = make_train_step(model, cfg, tx, donate=False)
    state, tb = step(state, device_batch, jax.random.PRNGKey(0), 0.1)
    assert np.isfinite(float(tb["loss"]))
    assert "rcnn_loss_cls" in tb


def test_offline_rcnn_eval(prepared, tmp_path):
    """Offline RCNN eval: saved proposals/features -> refine -> KITTI files."""
    import jax.numpy as jnp
    from pointrcnn_tpu.eval.evaluator import eval_one_epoch_rcnn_offline

    root, result_dir = prepared
    cfg = offline_cfg()
    roi_dir = os.path.join(result_dir, "rpn_result", "data")
    feat_dir = os.path.join(result_dir, "features")

    ds = KittiRCNNDataset(
        root, cfg, npoints=512, split="val", mode="EVAL",
        rcnn_eval_roi_dir=roi_dir, rcnn_eval_feature_dir=feat_dir,
    )
    loader = DataLoader(ds, batch_size=3)
    model = PointRCNN(cfg=cfg, mode="TEST")
    from pointrcnn_tpu.models.rcnn import rcnn_input_channels

    in_ch = rcnn_input_channels(cfg) + 16  # tiny rpn feature width
    sample = {"pts_input": np.zeros((1, cfg.RCNN.NUM_POINTS, in_ch), np.float32)}
    tx = build_optimizer(cfg, total_steps=5, steps_per_epoch=1)
    state = create_train_state(model, cfg, sample, tx, train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out_dir = str(tmp_path / "offline_eval")
    ret, final_dir = eval_one_epoch_rcnn_offline(
        model, variables, cfg, loader, out_dir
    )
    assert "recall_0.5" in ret
    assert len(os.listdir(final_dir)) == 3


def test_offline_rcnn_multiclass(tmp_path):
    """People (Pedestrian+Cyclist) through the OFFLINE stage-2 path:
    class-indexed cls_label / gt_cls_of_rois in the sampled batch (the CE
    loss and per-class anchors need them), and the multi-class offline eval
    step decodes + writes per-class KITTI results without assuming a
    1-logit head."""
    import jax.numpy as jnp
    from pointrcnn_tpu.eval.evaluator import eval_one_epoch_rcnn_offline

    root = str(tmp_path / "kitti")
    _, boxes_per_sample = make_mini_kitti(
        root, num_samples=2, n_points=2000, seed=3,
        classes=("Pedestrian", "Cyclist"))
    cfg = offline_cfg().thaw()
    cfg.CLASSES = "People"
    cfg.RCNN.LOSS_CLS = "CrossEntropy"
    cfg.RCNN.CLS_WEIGHT = [1.0, 1.0, 1.0]
    cfg.CLS_MEAN_SIZE = [[1.73, 0.6, 0.8], [1.73, 0.6, 1.76]]
    cfg = cfg.freeze()

    # rois straight from the label files (KITTI label format == roi format),
    # features fabricated at the tiny width the fixtures RPN would emit
    label_dir = os.path.join(root, "KITTI", "object", "training", "label_2")
    feat_dir = str(tmp_path / "feats")
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for sid in range(2):
        # cluster half the points inside the gt boxes so the rois pool
        # non-empty neighborhoods (person-sized boxes are tiny)
        n = 512
        pts = np.zeros((n, 3), np.float32)
        pts[: n // 2] = rng.uniform(-8, 8, (n // 2, 3))
        for j, box in enumerate(boxes_per_sample[sid]):
            cx, cy, cz, h, w, l, ry = box
            seg = pts[n // 2 + j * (n // 4) : n // 2 + (j + 1) * (n // 4)]
            # stay within the inscribed circle so the rotation is irrelevant
            rad = 0.3 * min(w, l)
            seg[:, 0] = cx + rng.uniform(-rad, rad, len(seg))
            seg[:, 1] = cy - rng.uniform(0.03 * h, 0.97 * h, len(seg))
            seg[:, 2] = cz + rng.uniform(-rad, rad, len(seg))
        np.save(os.path.join(feat_dir, "%06d_xyz.npy" % sid), pts)
        np.save(os.path.join(feat_dir, "%06d.npy" % sid),
                rng.randn(n, 16).astype(np.float32))
        np.save(os.path.join(feat_dir, "%06d_intensity.npy" % sid),
                rng.rand(n).astype(np.float32))
        np.save(os.path.join(feat_dir, "%06d_seg.npy" % sid),
                (rng.rand(n) > 0.5).astype(np.float32))
        np.save(os.path.join(feat_dir, "%06d_rawscore.npy" % sid),
                rng.randn(n).astype(np.float32))

    ds = KittiRCNNDataset(
        root, cfg, npoints=512, split="train", mode="TRAIN", classes="People",
        rcnn_training_roi_dir=label_dir, rcnn_training_feature_dir=feat_dir,
    )
    s = ds.getitem(0, np.random.RandomState(0))
    assert "gt_cls_of_rois" in s and s["gt_cls_of_rois"].shape == s["cls_label"].shape
    # rois == gt boxes -> fg labels present; Cyclist fg rois carry class 2
    fg = s["cls_label"] > 0
    assert fg.any()
    assert set(np.unique(s["cls_label"][fg])).issubset({1, 2})
    assert (s["cls_label"][fg] == s["gt_cls_of_rois"][fg] + 1).all()

    # multi-class CE train step consumes the labels
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    batch = next(iter(loader))
    model = PointRCNN(cfg=cfg, mode="TRAIN", num_classes=3)
    device_batch = {k: v for k, v in batch.items()
                    if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, total_steps=5, steps_per_epoch=1)
    state = create_train_state(model, cfg, device_batch, tx)
    step = make_train_step(model, cfg, tx, donate=False)
    state, tb = step(state, device_batch, jax.random.PRNGKey(0), 0.1)
    assert np.isfinite(float(tb["loss"]))

    # multi-class offline EVAL: 3-logit head decodes with per-class anchors
    ds_eval = KittiRCNNDataset(
        root, cfg, npoints=512, split="train", mode="EVAL", classes="People",
        rcnn_eval_roi_dir=label_dir, rcnn_eval_feature_dir=feat_dir,
    )
    loader_e = DataLoader(ds_eval, batch_size=2)
    model_e = PointRCNN(cfg=cfg, mode="TEST", num_classes=3)
    from pointrcnn_tpu.models.rcnn import rcnn_input_channels

    in_ch = rcnn_input_channels(cfg) + 16
    sample = {"pts_input": np.zeros((1, cfg.RCNN.NUM_POINTS, in_ch), np.float32)}
    state_e = create_train_state(model_e, cfg, sample, tx, train=False)
    variables = {"params": state_e.params, "batch_stats": state_e.batch_stats}
    ret, final_dir = eval_one_epoch_rcnn_offline(
        model_e, variables, cfg, loader_e, str(tmp_path / "out")
    )
    assert "recall_0.5" in ret
    names = set()
    for f in os.listdir(final_dir):
        for line in open(os.path.join(final_dir, f)):
            names.add(line.split()[0])
    assert names.issubset({"Pedestrian", "Cyclist"})
