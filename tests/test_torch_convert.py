"""Torch checkpoint converter: build a reference-shaped state dict from our
own initialized model (inverse mapping), convert it back, and require exact
tree/shape/value agreement."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.train.optimizer import build_optimizer
from pointrcnn_tpu.train.state import create_train_state

from test_end_to_end import tiny_cfg
import convert_torch_ckpt as cvt


def _inv_conv_w(kernel):
    """our (in, out) dense kernel -> torch conv weight (out, in, 1, 1)."""
    k = np.asarray(kernel)
    return k.T.reshape(k.shape[1], k.shape[0], 1, 1)


def build_torch_like_sd(params, stats, cfg):
    """Inverse of convert_state_dict for the structures we emit."""
    sd = {}

    def emit_shared(prefix, p, s, bn):
        n = len([k for k in p if k.startswith("w")])
        for i in range(n):
            sd[f"{prefix}.layer{i}.conv.weight"] = _inv_conv_w(p[f"w{i}"])
            if bn:
                sd[f"{prefix}.layer{i}.bn.bn.weight"] = np.asarray(p[f"bn{i}_scale"])
                sd[f"{prefix}.layer{i}.bn.bn.bias"] = np.asarray(p[f"bn{i}_bias"])
                sd[f"{prefix}.layer{i}.bn.bn.running_mean"] = np.asarray(s[f"bn{i}_mean"])
                sd[f"{prefix}.layer{i}.bn.bn.running_var"] = np.asarray(s[f"bn{i}_var"])
            else:
                sd[f"{prefix}.layer{i}.conv.bias"] = np.asarray(p[f"b{i}"])

    def emit_head(prefix, p, s, bn):
        hidden = len([k for k in p if k.startswith("ConvBN_")])
        torch_idx = [0] + [i + 2 for i in range(hidden - 1)]
        for our_i, ti in enumerate(torch_idx):
            c = p[f"ConvBN_{our_i}"]
            sd[f"{prefix}.{ti}.conv.weight"] = _inv_conv_w(c["Dense_0"]["kernel"])
            if bn:
                sd[f"{prefix}.{ti}.bn.bn.weight"] = np.asarray(c["BatchNorm_0"]["scale"])
                sd[f"{prefix}.{ti}.bn.bn.bias"] = np.asarray(c["BatchNorm_0"]["bias"])
                st = s[f"ConvBN_{our_i}"]["BatchNorm_0"]
                sd[f"{prefix}.{ti}.bn.bn.running_mean"] = np.asarray(st["mean"])
                sd[f"{prefix}.{ti}.bn.bn.running_var"] = np.asarray(st["var"])
            else:
                sd[f"{prefix}.{ti}.conv.bias"] = np.asarray(c["Dense_0"]["bias"])
        # dropout sits at Sequential index 1 -> final conv at hidden+1
        # (matches the REAL reference layout, see tests/test_reference_convert.py)
        fi = hidden + 1 if hidden > 0 else 0
        sd[f"{prefix}.{fi}.conv.weight"] = _inv_conv_w(p["Dense_0"]["kernel"])
        sd[f"{prefix}.{fi}.conv.bias"] = np.asarray(p["Dense_0"]["bias"])

    rpn_p, rpn_s = params["rpn"], stats["rpn"]
    bb_p = rpn_p["Pointnet2MSG_0"]
    bb_s = rpn_s["Pointnet2MSG_0"]
    for k in range(len(cfg.RPN.SA_CONFIG.NPOINTS)):
        for j in range(len(cfg.RPN.SA_CONFIG.MLPS[k])):
            emit_shared(
                f"rpn.backbone_net.SA_modules.{k}.mlps.{j}",
                bb_p[f"SetAbstractionMSG_{k}"][f"SharedMLP_{j}"],
                bb_s[f"SetAbstractionMSG_{k}"][f"SharedMLP_{j}"],
                cfg.RPN.USE_BN,
            )
    n_fp = len(cfg.RPN.FP_MLPS)
    for n in range(n_fp):
        emit_shared(
            f"rpn.backbone_net.FP_modules.{n_fp - 1 - n}.mlp",
            bb_p[f"FeaturePropagation_{n}"]["SharedMLP_0"],
            bb_s[f"FeaturePropagation_{n}"]["SharedMLP_0"],
            cfg.RPN.USE_BN,
        )
    emit_head("rpn.rpn_cls_layer", rpn_p["cls_head"], rpn_s.get("cls_head"), cfg.RPN.USE_BN)
    emit_head("rpn.rpn_reg_layer", rpn_p["reg_head"], rpn_s.get("reg_head"), cfg.RPN.USE_BN)

    rc_p = params["rcnn_net"]
    rc_s = stats.get("rcnn_net", {})
    emit_shared("rcnn_net.xyz_up_layer", rc_p["xyz_up_layer"], None, cfg.RCNN.USE_BN)
    emit_shared("rcnn_net.merge_down_layer", rc_p["merge_down_layer"], None, cfg.RCNN.USE_BN)
    for k in range(len(cfg.RCNN.SA_CONFIG.NPOINTS)):
        emit_shared(
            f"rcnn_net.SA_modules.{k}.mlps.0",
            rc_p[f"SetAbstraction_{k}"]["SharedMLP_0"], None, cfg.RCNN.USE_BN,
        )
    emit_head("rcnn_net.cls_layer", rc_p["cls_head"], None, cfg.RCNN.USE_BN)
    emit_head("rcnn_net.reg_layer", rc_p["reg_head"], None, cfg.RCNN.USE_BN)
    return sd


def test_convert_roundtrip():
    cfg = tiny_cfg(joint=True)
    model = PointRCNN(cfg=cfg, mode="TEST")
    batch = {"pts_input": jnp.zeros((1, cfg.RPN.NUM_POINTS, 3), jnp.float32)}
    tx = build_optimizer(cfg, 1, 1)
    state = create_train_state(model, cfg, batch, tx, seed=3, train=False)
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)

    sd = build_torch_like_sd(params, stats, cfg)
    conv_p, conv_s = cvt.convert_state_dict(sd, cfg)

    problems = cvt.verify_against_template(conv_p, params)
    problems += cvt.verify_against_template(conv_s, stats)
    assert not problems, problems

    # values roundtrip exactly
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(conv_p))
    for path, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val), np.asarray(flat_b[path]),
                                      err_msg=str(path))
