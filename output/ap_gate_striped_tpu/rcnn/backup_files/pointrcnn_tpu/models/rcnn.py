"""Stage-2 box refinement network (reference lib/net/rcnn_net.py:14-190).

Operates on canonically-transformed per-roi point sets of fixed size
(RCNN.NUM_POINTS).  Input layout (channel-last): ``(R, num_points, C)`` with
``C = 3 (canonical xyz) + extra (seg mask, depth, [intensity]) + 128 RPN
features``.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from pointrcnn_tpu.models.layers import HeadMLP, SharedMLP, final_layer_init, xavier_normal
from pointrcnn_tpu.models.pointnet2 import SetAbstraction
from pointrcnn_tpu.utils.box_coder import reg_channel_count


def rcnn_input_channels(cfg) -> int:
    """3 + mask + depth (+ intensity) (reference rcnn_net.py:22)."""
    c = cfg.RCNN
    return 3 + int(c.USE_INTENSITY) + int(c.USE_MASK) + int(c.USE_DEPTH)


class RCNNNet(nn.Module):
    cfg: object  # frozen ConfigNode
    num_classes: int = 2

    @nn.compact
    def __call__(self, pts_input, train: bool = False, bn_momentum=0.1):
        """pts_input: (R, num_points, C) -> dict(rcnn_cls (R, 1), rcnn_reg (R, C))."""
        c = self.cfg.RCNN
        dtype = (
            jnp.bfloat16
            if ("COMPUTE_DTYPE" in self.cfg and self.cfg.COMPUTE_DTYPE == "bfloat16")
            else None
        )
        xyz = pts_input[..., 0:3]

        if c.USE_RPN_FEATURES:
            in_ch = rcnn_input_channels(self.cfg)
            xyz_feature = SharedMLP(
                tuple(c.XYZ_UP_LAYER), bn=c.USE_BN, kernel_init=xavier_normal,
                dtype=dtype, name="xyz_up_layer",
            )(pts_input[..., 0:in_ch], train, bn_momentum)
            rpn_feature = pts_input[..., in_ch:]
            merged = jnp.concatenate([xyz_feature, rpn_feature], axis=-1)
            features = SharedMLP(
                (c.XYZ_UP_LAYER[-1],), bn=c.USE_BN, kernel_init=xavier_normal,
                dtype=dtype, name="merge_down_layer",
            )(merged, train, bn_momentum)
        else:
            features = pts_input[..., 3:] if pts_input.shape[-1] > 3 else None

        l_xyz, l_features = xyz, features
        for k in range(len(c.SA_CONFIG.NPOINTS)):
            npoint = c.SA_CONFIG.NPOINTS[k] if c.SA_CONFIG.NPOINTS[k] != -1 else None
            sa = SetAbstraction(
                npoint=npoint,
                radius=c.SA_CONFIG.RADIUS[k],
                nsample=c.SA_CONFIG.NSAMPLE[k],
                mlp=tuple(c.SA_CONFIG.MLPS[k]),
                bn=c.USE_BN,
                ball_chunk=128,
                dtype=dtype,
                query_method=getattr(c, "BALL_QUERY_METHOD", "approx"),
                fps_method=getattr(c, "FPS_METHOD", "exact"),
                # canonical-frame xyz -> the folded fused-gather is safe
                fold_geometry=bool(getattr(c, "SA_FOLD_GEOMETRY", False)),
            )
            l_xyz, l_features = sa(l_xyz, l_features, train, bn_momentum)

        # l_features: (R, 1, 512) after group-all
        cls_channel = 1 if self.num_classes == 2 else self.num_classes
        rcnn_cls = HeadMLP(
            hidden=tuple(c.CLS_FC), out_features=cls_channel, bn=c.USE_BN,
            dp_ratio=c.DP_RATIO, kernel_init=xavier_normal,
            out_kernel_init=xavier_normal, dtype=dtype, name="cls_head",
        )(l_features, train, bn_momentum)[:, 0, :]

        reg_channels = reg_channel_count(
            c.LOC_SCOPE, c.LOC_BIN_SIZE, c.NUM_HEAD_BIN, get_xz_fine=True,
            get_y_by_bin=c.LOC_Y_BY_BIN, loc_y_scope=c.LOC_Y_SCOPE,
            loc_y_bin_size=c.LOC_Y_BIN_SIZE,
        )
        rcnn_reg = HeadMLP(
            hidden=tuple(c.REG_FC), out_features=reg_channels, bn=c.USE_BN,
            dp_ratio=c.DP_RATIO, kernel_init=xavier_normal,
            out_kernel_init=final_layer_init(0.001),  # reference rcnn_net.py:104
            dtype=dtype, name="reg_head",
        )(l_features, train, bn_momentum)[:, 0, :]

        return {"rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg}
