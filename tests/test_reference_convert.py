"""Converter validated against the REAL reference nn.Modules.

``test_torch_convert.py`` round-trips ``convert_torch_ckpt`` against its own
inverse — it never sees a state dict produced by the actual reference model
classes, whose key names are the ground truth.  These tests instantiate the
reference's ``PointRCNN`` (lib/net/point_rcnn.py:8-21, which owns
lib/net/rpn.py:12-67 and lib/net/rcnn_net.py:16-110) with a minimal
pure-torch ``pointnet2_lib`` stand-in that reproduces the upstream
Pointnet2.PyTorch parameter naming (``SA_modules.{k}.mlps.{j}.layer{i}.conv``
/ ``...bn.bn``, ``Conv1d`` = ``conv`` + ``bn.bn``), take the REAL
``state_dict()``, and require the converter to

  (a) consume every weight-bearing key (nothing silently dropped), and
  (b) produce a pytree that strictly tree/shape-matches a fresh flax init
      (on the tiny config, where a full init is cheap), with values equal to
      the transposed torch tensors.

Only the backbone SA *forward* genuinely needs the absent CUDA submodule;
parameter construction is pure torch, so the stand-in only defines
``__init__`` structure and leaves ``forward`` unimplemented.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from test_end_to_end import tiny_cfg  # noqa: E402
from test_reference_parity import _AttrDict  # noqa: E402
import convert_torch_ckpt as cvt  # noqa: E402

from pointrcnn_tpu.config import default_config  # noqa: E402


def _install_pointnet2_stub():
    """Register a pure-torch ``pointnet2_lib`` whose parameter tree matches
    the upstream Pointnet2.PyTorch naming used by reference checkpoints.

    The implementation lives in tests/ref_pointnet2_torch.py, which also
    carries faithful *forward* semantics so the same stand-in powers the
    whole-network forward parity tests."""
    import ref_pointnet2_torch

    ref_pointnet2_torch.install()


@pytest.fixture(scope="module")
def refnet():
    """Import the reference net classes with shims installed."""
    for p in (REF_ROOT, os.path.join(REF_ROOT, "lib", "net")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = _AttrDict
        sys.modules["easydict"] = m
    for cuda_ext in ("roipool3d_cuda", "iou3d_cuda"):
        sys.modules.setdefault(cuda_ext, types.ModuleType(cuda_ext))
    _install_pointnet2_stub()
    if not torch.cuda.is_available():
        # ProposalLayer.__init__ moves MEAN_SIZE with .cuda() unconditionally
        torch.Tensor.cuda = lambda self, *a, **kw: self

    from lib.config import cfg as ref_cfg
    from lib.net.point_rcnn import PointRCNN as RefPointRCNN

    return types.SimpleNamespace(cfg=ref_cfg, PointRCNN=RefPointRCNN)


def _apply_arch(ref_cfg, ours):
    """Copy every architecture-determining field from our ConfigNode into the
    reference's mutable global cfg, so both sides describe the same net."""
    r, o = ref_cfg.RPN, ours.RPN
    ref_cfg.CLASSES = ours.CLASSES
    r.ENABLED, ref_cfg.RCNN.ENABLED = True, True
    r.FIXED = bool(o.FIXED)
    r.USE_BN, r.USE_INTENSITY = bool(o.USE_BN), bool(o.USE_INTENSITY)
    r.DP_RATIO = float(o.DP_RATIO)
    r.SA_CONFIG.NPOINTS = [int(x) for x in o.SA_CONFIG.NPOINTS]
    r.SA_CONFIG.RADIUS = [list(x) for x in o.SA_CONFIG.RADIUS]
    r.SA_CONFIG.NSAMPLE = [list(x) for x in o.SA_CONFIG.NSAMPLE]
    r.SA_CONFIG.MLPS = [[list(m) for m in grp] for grp in o.SA_CONFIG.MLPS]
    r.FP_MLPS = [list(m) for m in o.FP_MLPS]
    r.CLS_FC, r.REG_FC = list(o.CLS_FC), list(o.REG_FC)
    r.LOC_SCOPE, r.LOC_BIN_SIZE = float(o.LOC_SCOPE), float(o.LOC_BIN_SIZE)
    r.NUM_HEAD_BIN, r.LOC_XZ_FINE = int(o.NUM_HEAD_BIN), bool(o.LOC_XZ_FINE)
    r.LOSS_CLS = str(o.LOSS_CLS)

    rc, oc = ref_cfg.RCNN, ours.RCNN
    rc.USE_RPN_FEATURES = bool(oc.USE_RPN_FEATURES)
    rc.USE_INTENSITY, rc.USE_MASK = bool(oc.USE_INTENSITY), bool(oc.USE_MASK)
    rc.USE_DEPTH, rc.USE_BN = bool(oc.USE_DEPTH), bool(oc.USE_BN)
    rc.DP_RATIO = float(oc.DP_RATIO)
    rc.XYZ_UP_LAYER = list(oc.XYZ_UP_LAYER)
    rc.SA_CONFIG.NPOINTS = [int(x) for x in oc.SA_CONFIG.NPOINTS]
    rc.SA_CONFIG.RADIUS = list(oc.SA_CONFIG.RADIUS)
    rc.SA_CONFIG.NSAMPLE = list(oc.SA_CONFIG.NSAMPLE)
    rc.SA_CONFIG.MLPS = [list(m) for m in oc.SA_CONFIG.MLPS]
    rc.CLS_FC, rc.REG_FC = list(oc.CLS_FC), list(oc.REG_FC)
    rc.LOC_SCOPE, rc.LOC_BIN_SIZE = float(oc.LOC_SCOPE), float(oc.LOC_BIN_SIZE)
    rc.LOC_Y_SCOPE = float(oc.LOC_Y_SCOPE)
    rc.LOC_Y_BIN_SIZE = float(oc.LOC_Y_BIN_SIZE)
    rc.NUM_HEAD_BIN = int(oc.NUM_HEAD_BIN)
    rc.LOC_Y_BY_BIN = bool(oc.LOC_Y_BY_BIN)
    rc.LOSS_CLS = str(oc.LOSS_CLS)
    if rc.LOSS_CLS == "CrossEntropy":
        rc.CLS_WEIGHT = np.asarray(oc.CLS_WEIGHT, dtype=np.float64)


class _RecordingSD(dict):
    """state_dict wrapper that records which keys the converter reads."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _build_ref_state_dict(refnet, ours, num_classes=2):
    _apply_arch(refnet.cfg, ours)
    net = refnet.PointRCNN(num_classes=num_classes, use_xyz=True, mode="TEST")
    return {k: v.detach().clone() for k, v in net.state_dict().items()}


def test_converter_consumes_real_default_state_dict(refnet):
    """Full default (joint car) config: every weight key of the REAL
    reference model must be consumed, with shape-correct transposes."""
    ours = default_config()
    from pointrcnn_tpu.config import merge_from_list
    ours = merge_from_list(ours, ["RPN.ENABLED", "True", "RCNN.ENABLED", "True"])
    sd = _build_ref_state_dict(refnet, ours)
    rec = _RecordingSD(sd)

    params, stats = cvt.convert_state_dict(rec, ours)

    unread = set(sd) - rec.read
    # BN bookkeeping counters are the only legitimate leftovers
    assert all(k.endswith("num_batches_tracked") for k in unread), sorted(
        k for k in unread if not k.endswith("num_batches_tracked"))

    # spot-check transposes against the real torch shapes
    w = sd["rpn.backbone_net.SA_modules.0.mlps.0.layer0.conv.weight"]
    got = params["rpn"]["Pointnet2MSG_0"]["SetAbstractionMSG_0"][
        "SharedMLP_0"]["w0"]
    assert got.shape == (w.shape[1], w.shape[0])
    np.testing.assert_array_equal(got, w.numpy().reshape(w.shape[0], -1).T)

    wc = sd["rpn.rpn_cls_layer.0.conv.weight"]
    gc = params["rpn"]["cls_head"]["ConvBN_0"]["Dense_0"]["kernel"]
    assert gc.shape == (wc.shape[1], wc.shape[0])

    # final reg layer carries a bias (activation=None -> bn-free conv)
    assert "bias" in params["rcnn_net"]["reg_head"]["Dense_0"]


def test_converter_tree_matches_flax_init_on_real_tiny_sd(refnet):
    """Tiny joint config: the converted tree from the REAL reference
    state_dict must strictly match a fresh flax init (names+shapes), and
    values must equal the transposed torch tensors."""
    import jax
    import jax.numpy as jnp
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state

    ours = tiny_cfg(joint=True)
    # The reference hardcodes the RCNN SA-0 input at 128 ("channels of rpn
    # features", lib/net/point_rcnn.py:18) no matter what XYZ_UP_LAYER says;
    # our model derives it from the merge output.  The two only describe the
    # same net when XYZ_UP_LAYER ends at 128 (as every shipped cfg does), so
    # pin that here — tiny_cfg's [16, 16] is a config the reference itself
    # cannot even forward.  Likewise merge_down assumes the RPN feature dim
    # equals XYZ_UP_LAYER[-1] (rcnn_net.py:26 `c_out * 2`), so FP_MLPS[0]
    # must also end at 128.
    from pointrcnn_tpu.config import merge_from_list
    ours = merge_from_list(ours, [
        "RCNN.XYZ_UP_LAYER", "[16, 128]",
        "RPN.FP_MLPS", "[[16, 128], [16, 16]]",
    ])
    sd = _build_ref_state_dict(refnet, ours)
    params, stats = cvt.convert_state_dict(sd, ours)

    model = PointRCNN(cfg=ours, mode="TEST")
    batch = {"pts_input": jnp.zeros((1, ours.RPN.NUM_POINTS, 3), jnp.float32)}
    tx = build_optimizer(ours, 1, 1)
    state = create_train_state(model, ours, batch, tx, seed=0, train=False)

    problems = cvt.verify_against_template(params, jax.device_get(state.params))
    problems += cvt.verify_against_template(stats, jax.device_get(state.batch_stats))
    assert not problems, problems

    # converted values must be the torch values (transposed for kernels)
    w1 = sd["rcnn_net.xyz_up_layer.layer0.conv.weight"].numpy()
    np.testing.assert_allclose(
        params["rcnn_net"]["xyz_up_layer"]["w0"],
        w1.reshape(w1.shape[0], w1.shape[1]).T, rtol=0, atol=0)
    np.testing.assert_allclose(
        params["rpn"]["cls_head"]["Dense_0"]["bias"],
        sd["rpn.rpn_cls_layer.2.conv.bias"].numpy(), rtol=0, atol=0)


def test_converter_rpn_only_checkpoint(refnet):
    """RPN-stage checkpoints (RCNN disabled in the reference run) still save
    under the ``rpn.`` prefix; converter must handle the absence of
    ``rcnn_net.*`` keys."""
    ours = tiny_cfg(joint=True)
    sd = _build_ref_state_dict(refnet, ours)
    sd_rpn = {k: v for k, v in sd.items() if k.startswith("rpn.")}
    params, stats = cvt.convert_state_dict(sd_rpn, ours)
    assert "rcnn_net" not in params
    assert set(params) == {"rpn"}
