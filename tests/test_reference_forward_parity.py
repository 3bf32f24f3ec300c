"""Whole-network forward parity against the reference's OWN network code.

tests/test_reference_parity.py pins the pure functions (codec, losses,
geometry) against the reference's torch modules; these tests go one level
up: the reference's real network classes — lib/net/rpn.py:11-82 (incl. the
lib/net/pointnet2_msg.py backbone) and lib/net/rcnn_net.py:14-190 — execute
end-to-end on CPU (pointnet2 CUDA primitives supplied by the faithful
pure-torch stand-in in ref_pointnet2_torch.py, whose conventions match the
numpy oracles our JAX kernels are pinned to), and our flax models must
reproduce their outputs on the SAME converted weights and inputs.

This covers everything the function-level parity tests can't: layer wiring,
BN/activation placement, head channel arithmetic, neighborhood grouping
order, MSG scale concatenation, FP skip connections, and the checkpoint
converter's value mapping — measured, not transcribed.

Both sides run f32 on CPU; selection ops (FPS, ball query, 3-NN) are
discrete so agreement is exact, and the MLP stacks agree to f32 rounding.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from test_end_to_end import tiny_cfg  # noqa: E402
from test_reference_convert import (  # noqa: E402
    _apply_arch,
    refnet,  # fixture  # noqa: F401
)
import convert_torch_ckpt as cvt  # noqa: E402

from pointrcnn_tpu.config import merge_from_list  # noqa: E402

# f32-rounding headroom: our eval path folds BN running stats into the MLP
# weights (x @ (w·inv) vs torch's (x @ w − μ)·inv·γ + β) — same function,
# different rounding order; observed max drift ~3e-4 on the tiny nets.
# Selection ops are discrete, so any wiring/selection bug shows as O(1).
RTOL, ATOL = 1e-3, 1e-3


def _randomize(net, seed):
    """Default torch init + non-trivial BN running stats (fresh stats are
    0/1, which would hide converter mean/var mix-ups)."""
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=g))


def _cloud(batch, n, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((batch, n, 3), np.float32)
    pts[..., 0] = rng.uniform(-30, 30, (batch, n))
    pts[..., 1] = rng.uniform(-1, 3, (batch, n))
    pts[..., 2] = rng.uniform(0, 70, (batch, n))
    return pts


def _build_ref(refnet, ours, num_classes=2, seed=7):
    _apply_arch(refnet.cfg, ours)
    net = refnet.PointRCNN(num_classes=num_classes, use_xyz=True, mode="TEST")
    net.eval()
    _randomize(net, seed)
    sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
    params, stats = cvt.convert_state_dict(sd, ours)
    return net, params, stats


# ----------------------------------------------------------- op-level pins


def test_torch_standin_ops_match_oracles():
    """The pure-torch pointnet2 stand-in must satisfy the SAME numpy oracles
    that pin our JAX kernels (tests/test_ops.py) — otherwise network-level
    agreement would be two implementations sharing a bug."""
    import ref_pointnet2_torch as rp2
    from test_ops import np_ball_query, np_fps

    rng = np.random.RandomState(3)
    xyz = rng.uniform(-5, 5, (2, 64, 3)).astype(np.float32)
    t = torch.from_numpy(xyz)

    got = rp2.furthest_point_sample(t, 16).numpy()
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))

    new_xyz = xyz[:, :24]
    got = rp2.ball_query(1.5, 8, t, torch.from_numpy(new_xyz)).numpy()
    for b in range(2):
        np.testing.assert_array_equal(
            got[b], np_ball_query(xyz[b], new_xyz[b], 1.5, 8))

    # empty neighborhoods -> index 0 (query far from every point)
    far = torch.full((2, 4, 3), 100.0)
    np.testing.assert_array_equal(rp2.ball_query(1.0, 8, t, far).numpy(), 0)

    # three_nn: euclidean distances, ascending
    known = torch.from_numpy(rng.uniform(-5, 5, (2, 16, 3)).astype(np.float32))
    dist, idx = rp2.three_nn(t, known)
    d2_full = ((xyz[:, :, None] - known.numpy()[:, None]) ** 2).sum(-1)
    order = np.argsort(d2_full, axis=-1)[..., :3]
    np.testing.assert_array_equal(idx.numpy(), order)
    np.testing.assert_allclose(
        dist.numpy(),
        np.sqrt(np.take_along_axis(d2_full, order, -1)), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- network-level


def _exact_cfg(cfg_frozen, extra=()):
    return merge_from_list(cfg_frozen, [
        "RPN.BALL_QUERY_METHOD", "exact",
        "RCNN.BALL_QUERY_METHOD", "exact",
        # f32-vs-f32 comparison: bf16 is a TPU throughput choice, not part of
        # the reference semantics being pinned here
        "COMPUTE_DTYPE", "float32",
        *extra,
    ])


def test_rpn_forward_parity_tiny(refnet):
    """Reference RPN (real lib/net/rpn.py + pointnet2_msg.py code) vs our
    flax RPN on converted weights: backbone features, cls and reg logits."""
    import jax.numpy as jnp
    from pointrcnn_tpu.models.rpn import RPN

    ours = _exact_cfg(tiny_cfg(joint=True))
    net, params, stats = _build_ref(refnet, ours)

    cloud = _cloud(2, ours.RPN.NUM_POINTS, seed=11)
    with torch.no_grad():
        ref = net.rpn({"pts_input": torch.from_numpy(cloud)})

    out = RPN(cfg=ours).apply(
        {"params": params["rpn"], "batch_stats": stats["rpn"]},
        jnp.asarray(cloud), train=False)

    np.testing.assert_allclose(
        np.asarray(out["backbone_features"]),
        ref["backbone_features"].numpy().transpose(0, 2, 1),
        rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out["rpn_cls"]), ref["rpn_cls"].numpy(),
        rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out["rpn_reg"]), ref["rpn_reg"].numpy(),
        rtol=RTOL, atol=ATOL)


def test_rcnn_forward_parity_tiny(refnet):
    """Reference RCNNNet (real lib/net/rcnn_net.py code, offline-tensor eval
    branch rcnn_net.py:155-163) vs our flax RCNNNet on converted weights."""
    import jax.numpy as jnp
    from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels

    # pin the dims the reference hardcodes (see test_reference_convert)
    ours = _exact_cfg(tiny_cfg(joint=True), extra=(
        "RCNN.XYZ_UP_LAYER", "[16, 128]",
        "RPN.FP_MLPS", "[[16, 128], [16, 16]]",
    ))
    net, params, stats = _build_ref(refnet, ours)
    refnet.cfg.RCNN.ROI_SAMPLE_JIT = False  # offline-tensor forward branch

    R, npts = 6, ours.RCNN.NUM_POINTS
    rng = np.random.RandomState(5)
    in_ch = rcnn_input_channels(ours)
    pts = np.concatenate([
        rng.uniform(-2, 2, (R, npts, 3)).astype(np.float32),  # canonical xyz
        rng.uniform(0, 1, (R, npts, in_ch - 3)).astype(np.float32),
        rng.normal(0, 1, (R, npts, 128)).astype(np.float32),  # rpn features
    ], axis=-1)

    with torch.no_grad():
        ref = net.rcnn_net({
            "pts_input": torch.from_numpy(pts),
            "roi_boxes3d": torch.zeros(R, 7),
        })

    variables = {"params": params["rcnn_net"]}
    if "rcnn_net" in stats:  # RCNN.USE_BN is False in the shipped configs
        variables["batch_stats"] = stats["rcnn_net"]
    out = RCNNNet(cfg=ours).apply(variables, jnp.asarray(pts), train=False)

    np.testing.assert_allclose(
        np.asarray(out["rcnn_cls"]), ref["rcnn_cls"].numpy(),
        rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out["rcnn_reg"]), ref["rcnn_reg"].numpy(),
        rtol=RTOL, atol=ATOL)


def test_rpn_forward_parity_flagship(refnet):
    """The FLAGSHIP workload: the full default car config (16384 points,
    4 MSG SA + 4 FP stages, the exact benchmark network) — reference torch
    forward vs ours on converted weights.  Slow (~2 min CPU), but this is
    the single strongest 'detections match the reference' statement the
    container can produce without KITTI data."""
    import jax
    import jax.numpy as jnp
    from pointrcnn_tpu.config import load_config
    from pointrcnn_tpu.models.rpn import RPN

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ours = _exact_cfg(load_config(os.path.join(repo, "cfgs", "default.yaml")))
    net, params, stats = _build_ref(refnet, ours, seed=13)

    cloud = _cloud(1, ours.RPN.NUM_POINTS, seed=17)
    with torch.no_grad():
        ref = net.rpn({"pts_input": torch.from_numpy(cloud)})

    fwd = jax.jit(lambda v, p: RPN(cfg=ours).apply(v, p, train=False))
    out = fwd({"params": params["rpn"], "batch_stats": stats["rpn"]},
              jnp.asarray(cloud))

    # deeper net -> slightly wider f32 drift than the tiny configs
    np.testing.assert_allclose(
        np.asarray(out["rpn_cls"]), ref["rpn_cls"].numpy(),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["rpn_reg"]), ref["rpn_reg"].numpy(),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["backbone_features"]),
        ref["backbone_features"].numpy().transpose(0, 2, 1),
        rtol=1e-3, atol=1e-3)
