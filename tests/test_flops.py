"""Validate the analytic FLOP estimator (utils/flops.py).

Three angles:
- ``_mlp_chain`` matches XLA cost_analysis exactly on a pure matmul chain;
- the channel-flow simulation's per-layer (cin, cout) pairs match the REAL
  model's initialized Dense kernel shapes (catches any drift between the
  estimator and models/pointnet2.py / rpn.py / rcnn.py);
- flagship totals are pinned as regression values for bench.py's MFU.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointrcnn_tpu.config import load_config
from pointrcnn_tpu.utils import flops as F

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_mlp_chain_matches_xla_cost_analysis():
    chain = [32, 64, 16]
    cin, sites = 24, 1000
    ws = []
    c = cin
    for f in chain:
        ws.append(jnp.ones((c, f), jnp.float32))
        c = f

    def fn(x):
        for w in ws:
            x = x @ w
        return x

    x = jnp.ones((sites, cin), jnp.float32)
    comp = jax.jit(fn).lower(x).compile()
    xla_flops = comp.cost_analysis()["flops"]
    assert xla_flops == pytest.approx(F._mlp_chain(sites, cin, chain), rel=1e-6)


def _dense_kernel_shapes(params):
    """Multiset of (cin, cout) for every Dense/SharedMLP kernel in a
    flax param tree."""
    shapes = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            name = path[-1]
            if (name == "kernel" or (name.startswith("w") and name[1:].isdigit())) \
                    and getattr(node, "ndim", 0) == 2:
                shapes.append(tuple(int(s) for s in node.shape))

    walk(jax.tree_util.tree_map(lambda x: x, params), ())
    return sorted(shapes)


@pytest.fixture(scope="module")
def tiny_cfg():
    return load_config(str(REPO / "tests" / "cfgs_tiny.yaml"))


def test_rpn_layer_dims_match_model_params(tiny_cfg):
    from pointrcnn_tpu.models.rpn import RPN

    model = RPN(cfg=tiny_cfg)
    pts = jnp.zeros((1, tiny_cfg.RPN.NUM_POINTS, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts, train=False,
    )
    real = _dense_kernel_shapes(variables["params"])
    analytic = sorted((cin, cout) for _, cin, cout in
                      F.rpn_forward_flops(tiny_cfg).layers)
    assert analytic == real


def test_rcnn_layer_dims_match_model_params(tiny_cfg):
    from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels

    model = RCNNNet(cfg=tiny_cfg, num_classes=2)
    c_in = rcnn_input_channels(tiny_cfg) + tiny_cfg.RPN.FP_MLPS[0][-1]
    pts = jnp.zeros((4, tiny_cfg.RCNN.NUM_POINTS, c_in), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts, train=False,
    )
    real = _dense_kernel_shapes(variables["params"])
    analytic = sorted((cin, cout) for _, cin, cout in
                      F.rcnn_forward_flops(tiny_cfg, num_rois=4).layers)
    assert analytic == real


def test_flagship_layer_dims_and_pinned_totals():
    cfg = load_config(str(REPO / "cfgs" / "default.yaml"))
    rpn = F.rpn_forward_flops(cfg)
    ev = F.eval_forward_flops(cfg, mode="TEST")
    # regression pins (GF/frame); recompute if the flagship config changes
    assert rpn.mlp / 1e9 == pytest.approx(14.954, rel=0.01)
    assert ev.mlp / 1e9 == pytest.approx(129.977, rel=0.01)
    # RCNN-stage matmuls dominate the two-stage eval forward
    assert ev.buckets["rcnn.sa:mlp"] > 0.7 * ev.mlp
    # geometry bucket is a small fraction — MFU excluding it is conservative
    assert ev.geometry < 0.1 * ev.mlp


def test_train_step_flops_modes():
    cfg = load_config(str(REPO / "cfgs" / "default.yaml"))
    rpn_train = F.train_step_flops(cfg, "rpn", batch_size=16)
    # rpn train = 3x forward matmuls x batch
    assert rpn_train.mlp == pytest.approx(
        3 * 16 * F.rpn_forward_flops(cfg).mlp, rel=1e-6
    )
    # rcnn mode: FIXED RPN forward-only (1x), RCNN fwd+bwd (3x)
    cfg2 = cfg.thaw()
    cfg2.RPN.FIXED = True
    cfg2.RCNN.ENABLED = True
    cfg2 = cfg2.freeze()
    rcnn_train = F.train_step_flops(cfg2, "rcnn", batch_size=4)
    expect = 4 * (
        F.rpn_forward_flops(cfg2).mlp
        + 3 * F.rcnn_forward_flops(cfg2, cfg2.RCNN.ROI_PER_IMAGE).mlp
    )
    assert rcnn_train.mlp == pytest.approx(expect, rel=1e-6)


def test_device_peak_lookup(monkeypatch):
    class Dev:
        device_kind = "TPU v5 lite"

    peak, kind = F.device_peak_flops(Dev())
    assert peak == 197e12
    monkeypatch.setenv("POINTRCNN_PEAK_FLOPS", "1e15")
    peak, kind = F.device_peak_flops(Dev())
    assert peak == 1e15
