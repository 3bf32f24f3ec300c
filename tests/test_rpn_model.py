import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.config import default_config, merge_from_list
from pointrcnn_tpu.models.rpn import RPN
from pointrcnn_tpu.models.proposal import proposal_layer
from pointrcnn_tpu.utils.box_coder import reg_channel_count


def tiny_cfg():
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 16]
    cfg.RPN.SA_CONFIG.RADIUS = [[0.5, 1.0], [1.0, 2.0]]
    cfg.RPN.SA_CONFIG.NSAMPLE = [[8, 8], [8, 8]]
    cfg.RPN.SA_CONFIG.MLPS = [[[8, 8], [8, 16]], [[16, 16], [16, 16]]]
    cfg.RPN.FP_MLPS = [[16, 16], [16, 16]]
    cfg.RPN.CLS_FC = [16]
    cfg.RPN.REG_FC = [16]
    cfg.RPN.NMS_MAX_CANDIDATES = 128
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    return cfg.freeze()


def make_cloud(cfg, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    n = cfg.RPN.NUM_POINTS
    pts = np.zeros((batch, n, 3), np.float32)
    pts[..., 0] = rng.uniform(-30, 30, (batch, n))
    pts[..., 1] = rng.uniform(-1, 2, (batch, n))
    pts[..., 2] = rng.uniform(1, 70, (batch, n))
    return pts


def test_rpn_forward_shapes_and_proposals():
    cfg = tiny_cfg()
    pts = make_cloud(cfg)
    model = RPN(cfg=cfg)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(pts), train=False
    )
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, jnp.asarray(pts))

    n = cfg.RPN.NUM_POINTS
    reg_c = reg_channel_count(
        cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE, cfg.RPN.NUM_HEAD_BIN, cfg.RPN.LOC_XZ_FINE
    )
    assert out["rpn_cls"].shape == (2, n, 1)
    assert out["rpn_reg"].shape == (2, n, reg_c)
    assert out["backbone_features"].shape == (2, n, cfg.RPN.FP_MLPS[0][-1])
    assert np.all(np.isfinite(np.asarray(out["rpn_cls"])))

    rois, roi_scores, roi_valid = jax.jit(
        lambda s, r, x: proposal_layer(cfg, "TEST", s, r, x)
    )(out["rpn_cls"][..., 0], out["rpn_reg"], out["backbone_xyz"])
    m = cfg.TEST.RPN_POST_NMS_TOP_N
    assert rois.shape == (2, m, 7)
    assert roi_scores.shape == (2, m)
    rois = np.asarray(rois)
    valid = np.asarray(roi_valid)
    assert valid.any(), "expected at least one valid proposal"
    # valid rois must have positive sizes
    assert np.all(rois[valid][:, 3:6] > 0)
    # invalid rois zeroed (reference zero-pads, proposal_layer.py:38-39)
    assert np.allclose(rois[~valid], 0.0)


def test_rpn_train_mode_updates_batch_stats():
    cfg = tiny_cfg()
    pts = jnp.asarray(make_cloud(cfg, batch=2, seed=1))
    model = RPN(cfg=cfg)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), pts, train=False
    )
    apply_train = jax.jit(
        lambda v, p, key: model.apply(
            v, p, train=True, bn_momentum=0.1,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
    )
    out, mutated = apply_train(variables, pts, jax.random.PRNGKey(1))
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in leaf)
    # dropout active in train mode: two different rngs give different cls
    out2 = apply_train(variables, pts, jax.random.PRNGKey(2))[0]
    assert not np.allclose(np.asarray(out["rpn_cls"]), np.asarray(out2["rpn_cls"]))
