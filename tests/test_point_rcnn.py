import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.train.loss import model_loss
from pointrcnn_tpu.utils.box_coder import reg_channel_count


def tiny_joint_cfg():
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 16]
    cfg.RPN.SA_CONFIG.RADIUS = [[0.5, 1.0], [1.0, 2.0]]
    cfg.RPN.SA_CONFIG.NSAMPLE = [[8, 8], [8, 8]]
    cfg.RPN.SA_CONFIG.MLPS = [[[8, 8], [8, 16]], [[16, 16], [16, 16]]]
    cfg.RPN.FP_MLPS = [[16, 16], [16, 16]]
    cfg.RPN.CLS_FC = [16]
    cfg.RPN.REG_FC = [16]
    cfg.RPN.NMS_MAX_CANDIDATES = 64
    cfg.RPN.FIXED = True
    cfg.RPN.USE_INTENSITY = False
    cfg.RCNN.ENABLED = True
    cfg.RCNN.ROI_SAMPLE_JIT = True
    cfg.RCNN.NUM_POINTS = 32
    cfg.RCNN.ROI_PER_IMAGE = 8
    cfg.RCNN.ROI_FG_AUG_TIMES = 3
    cfg.RCNN.SA_CONFIG.NPOINTS = [16, -1]
    cfg.RCNN.SA_CONFIG.RADIUS = [0.4, 100]
    cfg.RCNN.SA_CONFIG.NSAMPLE = [8, 8]
    cfg.RCNN.SA_CONFIG.MLPS = [[16, 16], [16, 32]]
    cfg.RCNN.XYZ_UP_LAYER = [16, 16]
    cfg.RCNN.CLS_FC = [16]
    cfg.RCNN.REG_FC = [16]
    cfg.RCNN.MAX_GT_BOXES = 4
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 64
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 16
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    # backbone features are 16-d here (FP_MLPS[0][-1])
    return cfg.freeze()


def make_batch(cfg, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    n = cfg.RPN.NUM_POINTS
    pts = np.zeros((batch, n, 3), np.float32)
    pts[..., 0] = rng.uniform(-20, 20, (batch, n))
    pts[..., 1] = rng.uniform(-1, 2, (batch, n))
    pts[..., 2] = rng.uniform(1, 70, (batch, n))
    g = cfg.RCNN.MAX_GT_BOXES
    gt = np.zeros((batch, g, 7), np.float32)
    gt_valid = np.zeros((batch, g), bool)
    for b in range(batch):
        for i in range(2):
            gt[b, i] = [rng.uniform(-10, 10), rng.uniform(0, 1), rng.uniform(10, 40),
                        1.5, 1.6, 3.9, rng.uniform(-np.pi, np.pi)]
            gt_valid[b, i] = True
        # drop some points inside the gt boxes so pooling finds something
        for i in range(2):
            m = 20
            idx = rng.choice(n, m, replace=False)
            pts[b, idx, 0] = gt[b, i, 0] + rng.uniform(-1.5, 1.5, m)
            pts[b, idx, 1] = gt[b, i, 1] - rng.uniform(0, 1.5, m)
            pts[b, idx, 2] = gt[b, i, 2] + rng.uniform(-1.5, 1.5, m)
    return {
        "pts_input": jnp.asarray(pts),
        "gt_boxes3d": jnp.asarray(gt),
        "gt_valid": jnp.asarray(gt_valid),
    }


def test_joint_forward_train_and_loss_grads():
    cfg = tiny_joint_cfg()
    batch = make_batch(cfg)
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = jax.jit(model.init, static_argnames="train")(rngs, batch, train=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **rest}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(3), "target": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        loss, tb = model_loss(cfg, out, batch)
        return loss, (out, tb)

    (loss, (out, tb)), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    assert np.isfinite(float(loss))
    R = 2 * cfg.RCNN.ROI_PER_IMAGE
    assert out["rcnn_cls"].shape == (R, 1)
    reg_c = reg_channel_count(cfg.RCNN.LOC_SCOPE, cfg.RCNN.LOC_BIN_SIZE,
                              cfg.RCNN.NUM_HEAD_BIN, True)
    assert out["rcnn_reg"].shape == (R, reg_c)
    assert out["cls_label"].shape == (R,)

    # rcnn grads exist and are finite; rpn grads are zero (RPN.FIXED)
    rcnn_gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["rcnn_net"], 0.0
    )
    assert np.isfinite(rcnn_gnorm) and rcnn_gnorm > 0
    rpn_gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["rpn"], 0.0
    )
    assert rpn_gnorm == 0.0


def test_joint_forward_eval():
    cfg = tiny_joint_cfg()
    batch = make_batch(cfg, seed=5)
    model = PointRCNN(cfg=cfg, mode="TEST")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = jax.jit(model.init, static_argnames="train")(rngs, batch, train=True)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    M = cfg.TEST.RPN_POST_NMS_TOP_N
    B = 2
    assert out["rois"].shape == (B, M, 7)
    assert out["rcnn_cls"].shape == (B * M, 1)
    assert out["pooled_empty_flag"].shape == (B, M)
    assert np.all(np.isfinite(np.asarray(out["rcnn_reg"])))
