"""Sharded eval == single-device eval, bit for bit.

SCALING.md claims the eval path scales with chips (evaluator.py takes a
``mesh`` and shards the batch axis); this pins the claim: the full joint
eval epoch — two-stage forward, final NMS, KITTI result files, recall
accounting — over an 8-virtual-device CPU mesh must produce byte-identical
output to the same epoch on one device.  Data-parallel eval is pure batch
sharding (no collectives touch the values), so the comparison is exact
equality, not tolerance.  (Reference: eval_rcnn.py:459-683 runs single-GPU;
multi-chip eval is this framework's extension.)
"""

import os

import numpy as np

from pointrcnn_tpu.config import merge_from_list
from pointrcnn_tpu.data.loader import DataLoader
from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
from pointrcnn_tpu.eval.evaluator import eval_one_epoch_joint, eval_one_epoch_rpn
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.parallel.mesh import make_mesh
from pointrcnn_tpu.train.optimizer import build_optimizer
from pointrcnn_tpu.train.state import create_train_state

from kitti_fixture import make_mini_kitti
from test_end_to_end import tiny_cfg


def _setup(tmp_path, n_samples=8, joint=True):
    root = str(tmp_path / "kitti")
    make_mini_kitti(root, num_samples=n_samples, n_points=2500, seed=13)
    cfg = merge_from_list(tiny_cfg(joint=joint), ["RPN.FIXED", "False"])
    ds = KittiRCNNDataset(root, cfg, npoints=cfg.RPN.NUM_POINTS, split="val",
                          mode="EVAL")
    loader = DataLoader(ds, batch_size=n_samples)
    model = PointRCNN(cfg=cfg, mode="TEST")
    batch = next(iter(loader))
    sample = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and v.dtype != object}
    tx = build_optimizer(cfg, 1, 1)
    state = create_train_state(model, cfg, sample, tx, train=False, seed=3)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, loader, model, variables


def _tree(result_dir):
    out = {}
    for dirpath, _, files in os.walk(result_dir):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, result_dir)] = open(p, "rb").read()
    return out


def test_sharded_joint_eval_bit_identical(tmp_path):
    cfg, loader, model, variables = _setup(tmp_path)

    d1 = str(tmp_path / "single")
    ret1, final1 = eval_one_epoch_joint(model, variables, cfg, loader, d1)

    mesh = make_mesh(8)
    d8 = str(tmp_path / "mesh8")
    ret8, final8 = eval_one_epoch_joint(
        model, variables, cfg, loader, d8, mesh=mesh)

    assert ret1 == ret8, (ret1, ret8)
    t1, t8 = _tree(final1), _tree(final8)
    assert t1.keys() == t8.keys()
    assert any(len(v) > 0 for v in t1.values()), "no detections written"
    for name in t1:
        assert t1[name] == t8[name], f"sharded eval diverged on {name}"


def test_sharded_rpn_eval_bit_identical(tmp_path):
    # rpn-only evaluator (proposal recall + seg IoU path)
    cfg, loader, model, variables = _setup(tmp_path, joint=False)

    d1 = str(tmp_path / "single_rpn")
    ret1, _ = eval_one_epoch_rpn(model, variables, cfg, loader, d1)
    d8 = str(tmp_path / "mesh8_rpn")
    ret8, _ = eval_one_epoch_rpn(
        model, variables, cfg, loader, d8, mesh=make_mesh(8))
    assert ret1 == ret8, (ret1, ret8)
