"""Exercise the stretch configs (BASELINE.json config #5): cfgs/car_2x.yaml
(2x point density) and cfgs/people.yaml (multi-class Pedestrian+Cyclist).

CPU-side coverage: the yaml files load and build models, kernel-gate
decisions at the 2x shapes, and one sharded data-parallel train step on the
8-virtual-device mesh driven from each REAL config file (point counts
scaled down so the test runs in CI time; the full-size path is benched on
chip by tools/bench_forward.py, see docs/PARITY.md).
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointrcnn_tpu.config import load_config

REPO = pathlib.Path(__file__).resolve().parent.parent


def _shrink_for_ci(cfg, scale_2x: bool):
    """Scale point counts down ~64x, preserving each config's structure
    (channel widths, class count, loss types, thresholds untouched)."""
    c = cfg.thaw()
    n = 512 if scale_2x else 256
    c.RPN.NUM_POINTS = n
    c.RPN.SA_CONFIG.NPOINTS = [n // 4, n // 8, n // 16, n // 32]
    # keep every level >= its nsample so k-selections stay in bounds
    c.RPN.SA_CONFIG.NSAMPLE = [[4, 8]] * 4
    c.RCNN.NUM_POINTS = 64
    c.RCNN.SA_CONFIG.NPOINTS = [16, 8, -1]
    c.RCNN.SA_CONFIG.NSAMPLE = [8, 8, 8]
    c.RCNN.ROI_PER_IMAGE = 8
    c.RCNN.ROI_FG_AUG_TIMES = 2
    c.RCNN.MAX_GT_BOXES = 4
    c.RPN.NMS_MAX_CANDIDATES = 64
    c.TRAIN.RPN_PRE_NMS_TOP_N = 64
    c.TRAIN.RPN_POST_NMS_TOP_N = 16
    c.TEST.RPN_PRE_NMS_TOP_N = 64
    c.TEST.RPN_POST_NMS_TOP_N = 16
    return c.freeze()


def _one_sharded_train_step(cfg, n_classes_expected: int):
    from pointrcnn_tpu.models.point_rcnn import PointRCNN, num_classes_for
    from pointrcnn_tpu.parallel.mesh import make_mesh, shard_batch
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state, make_train_step

    assert num_classes_for(cfg) == n_classes_expected

    n_dev = len(jax.devices())
    B, N = n_dev, cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(0)
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(-20, 20, (B, N))
    pts[..., 1] = rng.uniform(-1, 3, (B, N))
    pts[..., 2] = rng.uniform(0, 40, (B, N))
    G = cfg.RCNN.MAX_GT_BOXES
    gt = np.zeros((B, G, 7), np.float32)
    gt[:, 0] = [0.0, 1.0, 15.0, 1.6, 0.7, 0.9, 0.3]
    gt_valid = np.zeros((B, G), bool)
    gt_valid[:, 0] = True
    batch = {
        "pts_input": jnp.asarray(pts),
        "gt_boxes3d": jnp.asarray(gt),
        "gt_valid": jnp.asarray(gt_valid),
    }
    if n_classes_expected > 2:
        batch["gt_cls"] = jnp.ones((B, G), jnp.int32)

    mesh = make_mesh(n_dev)
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=10, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    step = make_train_step(model, cfg, tx, donate=False)
    state, tb = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0), 0.1)
    assert np.isfinite(float(tb["loss"]))


def test_car_2x_loads_and_flops_scale():
    cfg = load_config(str(REPO / "cfgs" / "car_2x.yaml"))
    base = load_config(str(REPO / "cfgs" / "default.yaml"))
    assert cfg.RPN.NUM_POINTS == 2 * base.RPN.NUM_POINTS
    assert list(cfg.RPN.SA_CONFIG.NPOINTS) == [2 * n for n in base.RPN.SA_CONFIG.NPOINTS]

    from pointrcnn_tpu.utils.flops import rpn_forward_flops

    # backbone cost scales ~2x with point density (same widths, 2x sites)
    r2, r1 = rpn_forward_flops(cfg).mlp, rpn_forward_flops(base).mlp
    assert 1.8 < r2 / r1 < 2.2


def test_kernel_gates_at_2x_shapes():
    """The Pallas gate decisions at the car_2x shapes: these must either
    accept (kernel path) or cleanly refuse (XLA fallback) — both fine, but
    the decision must be in-bounds of each kernel's stated limits."""
    from pointrcnn_tpu.ops.pallas_ballquery import ball_query_pallas_supported
    from pointrcnn_tpu.ops import pallas_fps

    cfg = load_config(str(REPO / "cfgs" / "car_2x.yaml"))
    N = cfg.RPN.NUM_POINTS
    S = cfg.RPN.SA_CONFIG.NPOINTS[0]
    kmax = max(cfg.RPN.SA_CONFIG.NSAMPLE[0])
    assert isinstance(ball_query_pallas_supported(N, S, kmax), bool)

    # FPS batch-chunking: batch 4 x 32768 cells fit the kernel budget in
    # <= 4 launches of >= 1 row each
    rows = max(1, pallas_fps.MAX_CELLS // N)
    assert rows >= 1
    assert rows * N <= pallas_fps.MAX_CELLS


def test_car_2x_sharded_train_step():
    cfg = _shrink_for_ci(load_config(str(REPO / "cfgs" / "car_2x.yaml")), True)
    _one_sharded_train_step(cfg, n_classes_expected=2)


def test_people_sharded_train_step():
    cfg = _shrink_for_ci(load_config(str(REPO / "cfgs" / "people.yaml")), False)
    assert np.asarray(cfg.CLS_MEAN_SIZE).shape == (2, 3)  # per-class anchors
    _one_sharded_train_step(cfg, n_classes_expected=3)


def test_people_eval_step_multiclass():
    """Joint eval step from the People config file: softmax scores, per-class
    anchor decode, per-box class names in the KITTI writer path."""
    from pointrcnn_tpu.eval.evaluator import build_joint_eval_step
    from pointrcnn_tpu.models.point_rcnn import PointRCNN

    cfg = _shrink_for_ci(load_config(str(REPO / "cfgs" / "people.yaml")), False)
    model = PointRCNN(cfg=cfg, mode="TEST")
    B, N = 2, cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(3)
    pts = np.stack(
        [rng.uniform(-20, 20, (B, N)), rng.uniform(-1, 3, (B, N)),
         rng.uniform(0, 40, (B, N))], axis=-1
    ).astype(np.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = model.init(rngs, {"pts_input": jnp.asarray(pts)}, train=False)
    step = build_joint_eval_step(model, cfg, with_gt=False)
    out = jax.device_get(step(variables, jnp.asarray(pts)))
    M = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out["pred_boxes3d"].shape == (B, M, 7)
    assert out["pred_cls"].shape == (B, M)
    assert set(np.unique(out["pred_cls"])) <= {0, 1}
    # softmax-prob scores, log-prob ranking
    assert (out["norm_scores"] >= 0).all() and (out["norm_scores"] <= 1).all()
    assert (out["raw_scores"] <= 0).all()
