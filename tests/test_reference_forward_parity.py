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
        "RPN.FPS_METHOD", "exact",
        "RCNN.FPS_METHOD", "exact",
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


def _apply_runtime(ref_cfg, ours):
    """Copy the eval-pipeline runtime knobs (proposal budgets, NMS, pooling)
    the joint forward reads beyond what _apply_arch covers."""
    ref_cfg.RPN.SCORE_THRESH = float(ours.RPN.SCORE_THRESH)
    ref_cfg.RPN.NMS_TYPE = str(ours.RPN.NMS_TYPE)
    ref_cfg.CLS_MEAN_SIZE = np.asarray(ours.CLS_MEAN_SIZE, np.float32)
    ref_cfg.RCNN.POOL_EXTRA_WIDTH = float(ours.RCNN.POOL_EXTRA_WIDTH)
    ref_cfg.RCNN.NUM_POINTS = int(ours.RCNN.NUM_POINTS)
    ref_cfg.RCNN.ROI_SAMPLE_JIT = True
    for mode in ("TRAIN", "TEST"):
        for k in ("RPN_PRE_NMS_TOP_N", "RPN_POST_NMS_TOP_N", "RPN_NMS_THRESH"):
            # attribute assignment, not item: the _AttrDict easydict shim
            # reads attributes before dict items
            setattr(ref_cfg[mode], k, ours[mode][k])
    ref_cfg.TEST.RPN_DISTANCE_BASED_PROPOSE = bool(
        ours.TEST.RPN_DISTANCE_BASED_PROPOSE)


def test_proposal_layer_parity(refnet):
    """The reference's REAL ProposalLayer (lib/rpn/proposal_layer.py:15-142:
    decode, score sort, distance-zone budget split, per-zone rotated NMS via
    the iou3d wrapper, zero-padding) vs our fixed-shape vmapped proposal
    layer, on identical well-separated scores and regressions.

    (Scores are inputs, not net outputs, so sort order is deterministic on
    both sides — whole-net joint comparisons with random weights die on
    score near-ties ~1e-6 apart, below cross-implementation f32 drift.)
    Covers both the populated-far-zone and the empty-far-zone fallback
    (proposal_layer.py:92-100) paths.
    """
    import jax.numpy as jnp
    import ref_cuda_ext_torch
    from pointrcnn_tpu.models.proposal import proposal_layer
    from pointrcnn_tpu.utils.box_coder import reg_channel_count

    ref_cuda_ext_torch.install()
    ours = _exact_cfg(tiny_cfg(joint=True))
    _apply_arch(refnet.cfg, ours)
    _apply_runtime(refnet.cfg, ours)
    from lib.rpn.proposal_layer import ProposalLayer

    ref_pl = ProposalLayer(mode="TEST")

    n_reg = reg_channel_count(
        ours.RPN.LOC_SCOPE, ours.RPN.LOC_BIN_SIZE, ours.RPN.NUM_HEAD_BIN,
        get_xz_fine=ours.RPN.LOC_XZ_FINE)
    rng = np.random.RandomState(31)
    B, N = 2, ours.RPN.NUM_POINTS

    for tag, zmax in (("both-zones", 70.0), ("empty-far-zone", 38.0)):
        xyz = _cloud(B, N, seed=37)
        xyz[..., 2] = rng.uniform(1.0, zmax, (B, N)).astype(np.float32)
        scores = rng.normal(0, 1, (B, N)).astype(np.float32)
        reg = (rng.normal(0, 0.3, (B, N, n_reg))).astype(np.float32)

        with torch.no_grad():
            ref_rois, ref_scores = ref_pl(
                torch.from_numpy(scores), torch.from_numpy(reg),
                torch.from_numpy(xyz))

        rois, roi_scores, _valid = proposal_layer(
            ours, "TEST", jnp.asarray(scores), jnp.asarray(reg),
            jnp.asarray(xyz))

        np.testing.assert_allclose(
            np.asarray(roi_scores), ref_scores.numpy(), rtol=0, atol=1e-6,
            err_msg=tag)
        np.testing.assert_allclose(
            np.asarray(rois), ref_rois.numpy(), rtol=1e-4, atol=1e-3,
            err_msg=tag)


def test_rcnn_eval_branch_parity(refnet):
    """The reference's REAL RCNN eval-JIT branch (rcnn_net.py:127-154:
    roipool3d + canonical transform + RCNNNet on pooled tensors) vs our
    roipool3d + canonical_transform + RCNNNet (the point_rcnn.py eval
    hand-off), on identical rois, points, features, and converted weights."""
    import jax
    import jax.numpy as jnp
    import ref_cuda_ext_torch
    from pointrcnn_tpu.models.point_rcnn import canonical_transform
    from pointrcnn_tpu.models.rcnn import RCNNNet
    from pointrcnn_tpu.ops.roipool3d import roipool3d

    ref_cuda_ext_torch.install()
    ours = _exact_cfg(tiny_cfg(joint=True), extra=(
        "RCNN.XYZ_UP_LAYER", "[16, 128]",
        "RPN.FP_MLPS", "[[16, 128], [16, 16]]",
    ))
    net, params, stats = _build_ref(refnet, ours, seed=41)
    _apply_runtime(refnet.cfg, ours)

    rng = np.random.RandomState(43)
    B, N, M = 2, ours.RPN.NUM_POINTS, 12
    xyz = _cloud(B, N, seed=47)
    feats = rng.normal(0, 1, (B, N, 128)).astype(np.float32)
    seg_mask = (rng.rand(B, N) > 0.5).astype(np.float32)
    pts_depth = np.linalg.norm(xyz, axis=2)
    rois = np.zeros((B, M, 7), np.float32)
    rois[..., 0] = rng.uniform(-20, 20, (B, M))
    rois[..., 1] = rng.uniform(0, 2, (B, M))
    rois[..., 2] = rng.uniform(5, 60, (B, M))
    rois[..., 3:6] = np.array([1.5, 1.6, 3.9]) * rng.uniform(0.8, 1.2, (B, M, 3))
    rois[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))

    with torch.no_grad():
        ref = net.rcnn_net({
            "rpn_xyz": torch.from_numpy(xyz),
            "rpn_features": torch.from_numpy(feats),
            "seg_mask": torch.from_numpy(seg_mask),
            "roi_boxes3d": torch.from_numpy(rois),
            "pts_depth": torch.from_numpy(pts_depth),
        })

    # our eval hand-off (point_rcnn.py:105-123)
    pts_feature = jnp.concatenate([
        jnp.asarray(seg_mask)[..., None],
        (jnp.asarray(pts_depth) / 70.0 - 0.5)[..., None],
        jnp.asarray(feats),
    ], axis=-1)
    pooled, empty = roipool3d(
        jnp.asarray(xyz), pts_feature, jnp.asarray(rois),
        ours.RCNN.POOL_EXTRA_WIDTH, ours.RCNN.NUM_POINTS, method="exact")
    pooled = pooled.at[..., 0:3].set(
        canonical_transform(pooled[..., 0:3], jnp.asarray(rois)))
    pts_input = pooled.reshape(B * M, ours.RCNN.NUM_POINTS, -1)

    variables = {"params": params["rcnn_net"]}
    if "rcnn_net" in stats:
        variables["batch_stats"] = stats["rcnn_net"]
    out = RCNNNet(cfg=ours).apply(variables, pts_input, train=False)

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


def test_loss_assembly_parity(refnet):
    """The reference's REAL loss assembly (train_functions.py:9-215 —
    get_rpn_loss / get_rcnn_loss closures inside model_joint_fn_decorator,
    with their masking, normalizers, the 3x size-loss back-compat scale and
    LOSS_WEIGHT mixing) vs our train/loss.py, on identical controlled
    network outputs and labels.  The per-component losses are pinned
    element-wise in test_reference_parity.py; this pins the assembly."""
    import jax.numpy as jnp
    import ref_cuda_ext_torch
    from pointrcnn_tpu.train.loss import get_rcnn_loss, get_rpn_loss
    from pointrcnn_tpu.utils.box_coder import reg_channel_count

    ref_cuda_ext_torch.install()  # torch.cuda.*Tensor shims for loss_utils
    ours = _exact_cfg(tiny_cfg(joint=True))
    net, _params, _stats = _build_ref(refnet, ours, seed=51)
    _apply_runtime(refnet.cfg, ours)
    rcfg = refnet.cfg

    # lib.net.train_functions resolves via the refnet fixture's sys.path
    # entries; do NOT add /root/reference/tools here — it would shadow this
    # repo's tools/ modules for every later test in the process
    from lib.net.train_functions import model_joint_fn_decorator

    rng = np.random.RandomState(53)
    B, N = 2, 64

    # ---------------- RPN-stage loss (rpn train mode) ----------------
    rcfg.RPN.ENABLED, rcfg.RPN.FIXED, rcfg.RCNN.ENABLED = True, False, False
    n_rpn_reg = reg_channel_count(
        ours.RPN.LOC_SCOPE, ours.RPN.LOC_BIN_SIZE, ours.RPN.NUM_HEAD_BIN,
        get_xz_fine=ours.RPN.LOC_XZ_FINE)
    rpn_cls = rng.normal(0, 2, (B, N, 1)).astype(np.float32)
    rpn_reg = rng.normal(0, 0.5, (B, N, n_rpn_reg)).astype(np.float32)
    cls_label = rng.choice([-1, 0, 1], (B, N), p=[0.2, 0.6, 0.2])
    reg_label = np.concatenate([
        rng.uniform(-2.5, 2.5, (B, N, 3)),
        np.array([1.5, 1.6, 3.9]) * rng.uniform(0.8, 1.2, (B, N, 3)),
        rng.uniform(-np.pi, np.pi, (B, N, 1)),
    ], -1).astype(np.float32)

    model_fn = model_joint_fn_decorator()
    ret = {"rpn_cls": torch.from_numpy(rpn_cls),
           "rpn_reg": torch.from_numpy(rpn_reg)}
    net.forward = lambda input_data: ret
    data = {
        "pts_rect": np.zeros((B, N, 3), np.float32),
        "pts_features": np.zeros((B, N, 1), np.float32),
        "pts_input": np.zeros((B, N, 3), np.float32),
        "gt_boxes3d": np.zeros((B, 1, 7), np.float32),
        "rpn_cls_label": cls_label.astype(np.int64),
        "rpn_reg_label": reg_label,
    }
    ref_loss, ref_tb, _ = model_fn(net, data)

    our_loss, our_tb = get_rpn_loss(
        ours, jnp.asarray(rpn_cls), jnp.asarray(rpn_reg),
        jnp.asarray(cls_label), jnp.asarray(reg_label))

    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for k in ("rpn_loss_cls", "rpn_loss_reg", "rpn_loss_loc",
              "rpn_loss_angle", "rpn_loss_size", "rpn_loss_cls_pos",
              "rpn_loss_cls_neg"):
        np.testing.assert_allclose(float(our_tb[k]), float(ref_tb[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)

    # --------------- RCNN-stage loss (joint, FIXED rpn) ---------------
    rcfg.RPN.FIXED, rcfg.RCNN.ENABLED = True, True
    R = 16
    n_rcnn_reg = reg_channel_count(
        ours.RCNN.LOC_SCOPE, ours.RCNN.LOC_BIN_SIZE, ours.RCNN.NUM_HEAD_BIN,
        get_xz_fine=True, get_y_by_bin=ours.RCNN.LOC_Y_BY_BIN,
        loc_y_scope=ours.RCNN.LOC_Y_SCOPE,
        loc_y_bin_size=ours.RCNN.LOC_Y_BIN_SIZE)
    rcnn_cls = rng.normal(0, 2, (R, 1)).astype(np.float32)
    rcnn_reg = rng.normal(0, 0.5, (R, n_rcnn_reg)).astype(np.float32)
    # BinaryCrossEntropy (the shipped RCNN.LOSS_CLS): labels in {0, 1} —
    # torch>=1.11 F.binary_cross_entropy rejects the -1 ignore labels the
    # 2019-era reference passed through before masking
    rcnn_cls_label = rng.choice([0.0, 1.0], R, p=[0.5, 0.5]).astype(np.float32)
    reg_valid = (rng.rand(R) > 0.4).astype(np.float32)
    rois = np.concatenate([
        rng.uniform(-20, 20, (R, 1)), rng.uniform(0, 2, (R, 1)),
        rng.uniform(5, 60, (R, 1)),
        np.array([1.5, 1.6, 3.9]) * rng.uniform(0.8, 1.2, (R, 3)),
        rng.uniform(-np.pi, np.pi, (R, 1)),
    ], 1).astype(np.float32)
    gt_ct = np.concatenate([
        rng.uniform(-1.0, 1.0, (R, 3)),
        np.array([1.5, 1.6, 3.9]) * rng.uniform(0.9, 1.1, (R, 3)),
        rng.uniform(-0.6, 0.6, (R, 1)),
    ], 1).astype(np.float32)

    ret2 = {
        "rcnn_cls": torch.from_numpy(rcnn_cls),
        "rcnn_reg": torch.from_numpy(rcnn_reg),
        "cls_label": torch.from_numpy(rcnn_cls_label),
        "reg_valid_mask": torch.from_numpy(reg_valid),
        "roi_boxes3d": torch.from_numpy(rois),
        "gt_of_rois": torch.from_numpy(gt_ct),
        "pts_input": torch.zeros(R, ours.RCNN.NUM_POINTS, 5),
    }
    net.forward = lambda input_data: ret2
    ref_loss2, ref_tb2, _ = model_fn(net, data)

    target = {
        "cls_label": jnp.asarray(rcnn_cls_label),
        "reg_valid_mask": jnp.asarray(reg_valid),
        "roi_boxes3d": jnp.asarray(rois),
        "gt_of_rois": jnp.asarray(gt_ct),
    }
    our_loss2, our_tb2 = get_rcnn_loss(
        ours, jnp.asarray(rcnn_cls), jnp.asarray(rcnn_reg), target)

    np.testing.assert_allclose(float(our_loss2), float(ref_loss2),
                               rtol=1e-5, atol=1e-6)
    for k in ("rcnn_loss_cls", "rcnn_loss_reg", "rcnn_loss_loc",
              "rcnn_loss_angle", "rcnn_loss_size"):
        np.testing.assert_allclose(float(our_tb2[k]), float(ref_tb2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_rcnn_forward_parity_multiclass(refnet):
    """Multi-class head wiring (People: cls_channel = num_classes = 3,
    CrossEntropy head, reference rcnn_net.py:45-56) — reference RCNNNet
    forward vs ours on converted 3-class weights."""
    import jax.numpy as jnp
    from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels

    ours = _exact_cfg(tiny_cfg(joint=True), extra=(
        "RCNN.XYZ_UP_LAYER", "[16, 128]",
        "RPN.FP_MLPS", "[[16, 128], [16, 16]]",
        "CLASSES", "People",
        "RCNN.LOSS_CLS", "CrossEntropy",
        "RCNN.CLS_WEIGHT", "[1.0, 1.0, 1.0]",
    ))
    net, params, stats = _build_ref(refnet, ours, num_classes=3, seed=61)
    refnet.cfg.RCNN.ROI_SAMPLE_JIT = False

    R, npts = 5, ours.RCNN.NUM_POINTS
    rng = np.random.RandomState(67)
    in_ch = rcnn_input_channels(ours)
    pts = np.concatenate([
        rng.uniform(-2, 2, (R, npts, 3)).astype(np.float32),
        rng.uniform(0, 1, (R, npts, in_ch - 3)).astype(np.float32),
        rng.normal(0, 1, (R, npts, 128)).astype(np.float32),
    ], axis=-1)

    with torch.no_grad():
        ref = net.rcnn_net({
            "pts_input": torch.from_numpy(pts),
            "roi_boxes3d": torch.zeros(R, 7),
        })

    variables = {"params": params["rcnn_net"]}
    if "rcnn_net" in stats:
        variables["batch_stats"] = stats["rcnn_net"]
    out = RCNNNet(cfg=ours, num_classes=3).apply(
        variables, jnp.asarray(pts), train=False)

    assert out["rcnn_cls"].shape == (R, 3)
    np.testing.assert_allclose(
        np.asarray(out["rcnn_cls"]), ref["rcnn_cls"].numpy(),
        rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out["rcnn_reg"]), ref["rcnn_reg"].numpy(),
        rtol=RTOL, atol=ATOL)


def test_reference_gt_database_pickle_loads(refnet, tmp_path):
    """A gt database pickled by the reference's generate_gt_database.py
    (records embed lib.utils.object3d.Object3d instances,
    generate_gt_database.py:79-85) must load through our
    data/rpn_dataset.load_gt_database with the Object3d remapped onto ours
    and every attribute the paste-augmentation reads intact."""
    import pickle

    import lib.utils.object3d as ref_object3d

    from pointrcnn_tpu.data.object3d import Object3d as OurObject3d
    from pointrcnn_tpu.data.rpn_dataset import load_gt_database

    line = "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59"
    obj = ref_object3d.Object3d(line)
    rng = np.random.RandomState(71)
    db = [{
        "sample_id": 7,
        "cls_type": "Car",
        "gt_box3d": np.array([-0.65, 1.71, 46.70, 1.65, 1.67, 3.64, -1.59],
                             np.float32),
        "points": rng.uniform(-1, 1, (42, 3)).astype(np.float32),
        "intensity": rng.rand(42).astype(np.float32),
        "obj": obj,
    }]
    p = tmp_path / "train_gt_database_3level_Car.pkl"
    with open(p, "wb") as f:
        pickle.dump(db, f)

    loaded = load_gt_database(str(p))
    assert len(loaded) == 1
    rec = loaded[0]
    assert isinstance(rec["obj"], OurObject3d)
    for attr in ("cls_type", "h", "w", "l", "ry", "level_str"):
        assert getattr(rec["obj"], attr) == getattr(obj, attr), attr
    np.testing.assert_array_equal(rec["obj"].pos, obj.pos)
    np.testing.assert_array_equal(rec["points"], db[0]["points"])


def _load_ref_eval_rcnn():
    """Import the reference's tools/eval_rcnn.py (module-level argparse and
    all) with its CUDA/numba/fire dependencies stubbed, for driving its
    result-writing helpers directly."""
    import importlib.util
    import types

    if "ref_eval_rcnn" in sys.modules:
        return sys.modules["ref_eval_rcnn"]

    import ref_cuda_ext_torch
    from test_kitti_eval import _load_reference_eval

    ref_cuda_ext_torch.install()
    _load_reference_eval()  # numba + rotate_iou stubs, 'tools' pkg shell
    # let 'tools.*' imports resolve inside the reference tree (our repo's
    # tools/ is not a package; its modules import as top-level names)
    sys.modules["tools"].__path__ = ["/root/reference/tools"]
    sys.modules["tools.kitti_object_eval_python"].__path__ = [
        "/root/reference/tools/kitti_object_eval_python"]
    sys.modules.setdefault("_init_path", types.ModuleType("_init_path"))
    sys.modules.setdefault("fire", types.ModuleType("fire"))
    if "skimage" not in sys.modules:  # kitti_common imports skimage.io
        sk = types.ModuleType("skimage")
        sk.io = types.ModuleType("skimage.io")
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk.io

    argv = sys.argv
    sys.argv = ["eval_rcnn.py", "--eval_mode", "rcnn"]
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval_rcnn", "/root/reference/tools/eval_rcnn.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_eval_rcnn"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


def test_save_kitti_format_parity(refnet, tmp_path):
    """The KITTI result writer (reference eval_rcnn.py:69-94: corner->image
    projection, clipping, the 80%-of-image veto, alpha from beta+ry, %.4f
    line format) vs ours — the files that feed the AP evaluator must be
    identical, including WHICH boxes are vetoed."""
    from test_reference_parity import CALIB_TEXT

    from pointrcnn_tpu.data.calibration import Calibration
    from pointrcnn_tpu.eval.evaluator import save_kitti_format

    ref_mod = _load_ref_eval_rcnn()
    refnet.cfg.CLASSES = "Car"

    calib_file = tmp_path / "calib.txt"
    calib_file.write_text(CALIB_TEXT)
    import lib.utils.calibration as ref_calibration

    rng = np.random.RandomState(77)
    n = 24
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-25, 25, n)
    boxes[:, 1] = rng.uniform(0, 2.5, n)
    boxes[:, 2] = rng.uniform(1.0, 65, n)  # some very close -> 80% veto
    boxes[:, 3:6] = np.array([1.5, 1.6, 3.9]) * rng.uniform(0.7, 1.4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(-3, 8, n).astype(np.float32)
    img_shape = (375, 1242, 3)

    ref_dir = tmp_path / "ref"; ref_dir.mkdir()
    our_dir = tmp_path / "ours"; our_dir.mkdir()
    ref_mod.save_kitti_format(
        11, ref_calibration.Calibration(str(calib_file)), boxes.copy(),
        str(ref_dir), scores, img_shape)
    save_kitti_format(
        11, Calibration(str(calib_file)), boxes.copy(), str(our_dir),
        scores, img_shape, class_name="Car")

    ref_lines = (ref_dir / "000011.txt").read_text().splitlines()
    our_lines = (our_dir / "000011.txt").read_text().splitlines()
    assert len(ref_lines) == len(our_lines) and ref_lines  # same veto set
    for rl, ol in zip(ref_lines, our_lines):
        rt, ot = rl.split(" "), ol.split(" ")
        assert rt[0] == ot[0] == "Car"
        np.testing.assert_allclose(
            [float(v) for v in ot[1:]], [float(v) for v in rt[1:]],
            rtol=0, atol=2e-4, err_msg=rl)
