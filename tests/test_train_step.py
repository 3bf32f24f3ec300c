import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.parallel.mesh import make_mesh, shard_batch
from pointrcnn_tpu.train.optimizer import bn_momentum_for_epoch, build_optimizer, onecycle_schedule
from pointrcnn_tpu.train.state import create_train_state, make_train_step
from pointrcnn_tpu.utils.box_coder import reg_channel_count


def tiny_rpn_cfg():
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 128
    cfg.RPN.SA_CONFIG.NPOINTS = [32, 8]
    cfg.RPN.SA_CONFIG.RADIUS = [[0.5, 1.0], [1.0, 2.0]]
    cfg.RPN.SA_CONFIG.NSAMPLE = [[8, 8], [8, 8]]
    cfg.RPN.SA_CONFIG.MLPS = [[[8, 8], [8, 16]], [[16, 16], [16, 16]]]
    cfg.RPN.FP_MLPS = [[16, 16], [16, 16]]
    cfg.RPN.CLS_FC = [16]
    cfg.RPN.REG_FC = [16]
    cfg.RPN.LOSS_CLS = "SigmoidFocalLoss"
    cfg.RCNN.ENABLED = False
    cfg.TRAIN.OPTIMIZER = "adam_onecycle"
    cfg.TRAIN.WEIGHT_DECAY = 0.001
    return cfg.freeze()


def make_rpn_batch(cfg, batch, seed=0):
    rng = np.random.RandomState(seed)
    n = cfg.RPN.NUM_POINTS
    pts = rng.uniform(-10, 10, (batch, n, 3)).astype(np.float32)
    cls_label = rng.choice([-1, 0, 1], size=(batch, n), p=[0.1, 0.7, 0.2]).astype(np.int32)
    reg_label = np.zeros((batch, n, 7), np.float32)
    reg_label[..., 0:3] = rng.uniform(-2, 2, (batch, n, 3))
    reg_label[..., 3:6] = np.array([1.5, 1.6, 3.9], np.float32)
    reg_label[..., 6] = rng.uniform(-np.pi, np.pi, (batch, n))
    return {
        "pts_input": jnp.asarray(pts),
        "rpn_cls_label": jnp.asarray(cls_label),
        "rpn_reg_label": jnp.asarray(reg_label),
    }


def test_onecycle_schedule_shape():
    sched = onecycle_schedule(100, 0.002, 10.0, 0.4)
    lr0 = float(sched(0))
    lr_peak = float(sched(40))
    lr_end = float(sched(100))
    np.testing.assert_allclose(lr0, 0.0002, rtol=1e-5)
    np.testing.assert_allclose(lr_peak, 0.002, rtol=1e-3)
    np.testing.assert_allclose(lr_end, 0.0002 / 1e4, rtol=1e-3)


def test_bn_momentum_schedule():
    cfg = default_config()
    cfg.TRAIN.BN_MOMENTUM = 0.1
    cfg.TRAIN.BN_DECAY = 0.5
    cfg.TRAIN.BNM_CLIP = 0.01
    cfg.TRAIN.BN_DECAY_STEP_LIST = [2, 4]
    cfg.freeze()
    assert bn_momentum_for_epoch(cfg, 0) == 0.1
    assert bn_momentum_for_epoch(cfg, 2) == 0.05
    assert bn_momentum_for_epoch(cfg, 4) == 0.025
    cfg2 = default_config()
    cfg2.TRAIN.BN_MOMENTUM = 0.02
    cfg2.TRAIN.BN_DECAY_STEP_LIST = [1]
    cfg2.freeze()
    assert bn_momentum_for_epoch(cfg2, 1) == 0.01  # clipped


def test_rpn_train_steps_reduce_loss():
    cfg = tiny_rpn_cfg()
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    batch = make_rpn_batch(cfg, batch=4)
    tx = build_optimizer(cfg, total_steps=50, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    train_step = make_train_step(model, cfg, tx, donate=False)

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, tb = train_step(state, batch, rng, 0.1)
        losses.append(float(tb["loss"]))
    assert all(np.isfinite(losses))
    # noisy (dropout + warmup lr): compare window means
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert int(state.step) == 12


def test_rpn_train_step_sharded_8dev():
    """Data-parallel train step over an 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    cfg = tiny_rpn_cfg()
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    batch = make_rpn_batch(cfg, batch=8, seed=1)
    mesh = make_mesh()
    tx = build_optimizer(cfg, total_steps=50, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    sharded = shard_batch(batch, mesh)
    train_step = make_train_step(model, cfg, tx, donate=False)
    state2, tb = train_step(state, sharded, jax.random.PRNGKey(0), 0.1)
    assert np.isfinite(float(tb["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated
    # sharded step computes the same program as the single-device step
    # (reduction order may differ -> tolerance, not bit equality)
    state1, tb1 = train_step(state, batch, jax.random.PRNGKey(0), 0.1)
    np.testing.assert_allclose(float(tb["loss"]), float(tb1["loss"]), rtol=1e-4)
    # Adam normalises tiny grads, amplifying reduction-order noise into
    # relative differences; compare with an absolute floor well below the
    # update scale (lr 2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(state2.params)[:5],
                    jax.tree_util.tree_leaves(state1.params)[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=1e-5)
