"""Stage-1 region proposal network (reference lib/net/rpn.py:11-82)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from pointrcnn_tpu.models.layers import HeadMLP, final_layer_init
from pointrcnn_tpu.models.pointnet2 import Pointnet2MSG
from pointrcnn_tpu.utils.box_coder import reg_channel_count


class RPN(nn.Module):
    """PointNet++ backbone + per-point cls/reg heads.

    Output dict mirrors the reference forward (rpn.py:68-82):
    ``rpn_cls`` (B, N, 1), ``rpn_reg`` (B, N, C), ``backbone_xyz`` (B, N, 3),
    ``backbone_features`` (B, N, 128) — features are channel-last here.
    """

    cfg: object  # frozen ConfigNode

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.1):
        c = self.cfg
        rpn_cfg = c.RPN
        dtype = (
            jnp.bfloat16
            if ("COMPUTE_DTYPE" in c and c.COMPUTE_DTYPE == "bfloat16")
            else None
        )
        backbone = Pointnet2MSG(
            npoints=tuple(rpn_cfg.SA_CONFIG.NPOINTS),
            radii=tuple(tuple(r) for r in rpn_cfg.SA_CONFIG.RADIUS),
            nsamples=tuple(tuple(s) for s in rpn_cfg.SA_CONFIG.NSAMPLE),
            mlps=tuple(tuple(tuple(m) for m in stage) for stage in rpn_cfg.SA_CONFIG.MLPS),
            fp_mlps=tuple(tuple(m) for m in rpn_cfg.FP_MLPS),
            bn=rpn_cfg.USE_BN,
            dtype=dtype,
            query_method=getattr(rpn_cfg, "BALL_QUERY_METHOD", "approx"),
            fps_method=getattr(rpn_cfg, "FPS_METHOD", "exact"),
        )
        backbone_xyz, backbone_features = backbone(pts_input, train, bn_momentum)

        # focal-loss prior: final cls bias = -log((1-pi)/pi), pi=0.01
        # (reference rpn.py:61-64)
        if rpn_cfg.LOSS_CLS == "SigmoidFocalLoss":
            cls_bias_init = nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01)))
        else:
            cls_bias_init = nn.initializers.zeros
        rpn_cls = HeadMLP(
            hidden=tuple(rpn_cfg.CLS_FC),
            out_features=1,
            bn=rpn_cfg.USE_BN,
            dp_ratio=rpn_cfg.DP_RATIO,
            out_kernel_init=nn.initializers.lecun_uniform(),
            out_bias_init=cls_bias_init,
            dtype=dtype,
            name="cls_head",
        )(backbone_features, train, bn_momentum)

        reg_channels = reg_channel_count(
            rpn_cfg.LOC_SCOPE, rpn_cfg.LOC_BIN_SIZE, rpn_cfg.NUM_HEAD_BIN,
            get_xz_fine=rpn_cfg.LOC_XZ_FINE,
        )
        rpn_reg = HeadMLP(
            hidden=tuple(rpn_cfg.REG_FC),
            out_features=reg_channels,
            bn=rpn_cfg.USE_BN,
            dp_ratio=rpn_cfg.DP_RATIO,
            out_kernel_init=final_layer_init(0.001),  # reference rpn.py:66
            dtype=dtype,
            name="reg_head",
        )(backbone_features, train, bn_momentum)

        return {
            "rpn_cls": rpn_cls,
            "rpn_reg": rpn_reg,
            "backbone_xyz": backbone_xyz,
            "backbone_features": backbone_features,
        }
