"""Top-level two-stage detector (reference lib/net/point_rcnn.py:8-70).

A single flax module composing RPN and RCNNNet; the non-learned middle
(sigmoid/seg-mask/depth, proposal layer, target sampling, roi pooling,
canonical transform) lives in ``__call__`` as plain jnp, all fixed-shape.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pointrcnn_tpu.models.proposal import proposal_layer
from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels
from pointrcnn_tpu.models.rpn import RPN
from pointrcnn_tpu.models.target import proposal_target_layer
from pointrcnn_tpu.ops.roipool3d import roipool3d
from pointrcnn_tpu.utils.box_ops import rotate_pc_along_y


def canonical_transform(pooled_pts, rois):
    """Shift pooled points into each roi's frame (reference rcnn_net.py:146-153).

    pooled_pts: (B, M, S, 3); rois: (B, M, 7)."""
    local = pooled_pts - rois[..., None, 0:3]
    return jax.vmap(rotate_pc_along_y)(local, rois[..., 6])


def num_classes_for(cfg) -> int:
    """Background + foreground classes for the active CLASSES config
    (reference KittiRCNNDataset class tuples, kitti_rcnn_dataset.py:26-38)."""
    return {"Car": 2, "Pedestrian": 2, "Cyclist": 2, "People": 3}[cfg.CLASSES]


class PointRCNN(nn.Module):
    cfg: object  # frozen ConfigNode
    num_classes: int | None = None  # derived from cfg.CLASSES when None
    mode: str = "TRAIN"  # which NMS budget set to use ('TRAIN' / 'TEST')

    def setup(self):
        n_cls = self.num_classes or num_classes_for(self.cfg)
        if self.cfg.RPN.ENABLED:
            self.rpn = RPN(cfg=self.cfg)
        if self.cfg.RCNN.ENABLED:
            self.rcnn_net = RCNNNet(cfg=self.cfg, num_classes=n_cls)

    def __call__(self, input_data: dict, train: bool = False, bn_momentum=0.1):
        cfg = self.cfg
        if not cfg.RPN.ENABLED:
            # rcnn-offline mode: canonical per-roi points + RPN features come
            # straight from the data layer (reference train_functions.py:31-33)
            pts_input = input_data["pts_input"]
            if "pts_features" in input_data:
                pts_input = jnp.concatenate(
                    [pts_input, input_data["pts_features"]], axis=-1
                )
            return self.rcnn_net(pts_input, train, bn_momentum)

        output = {}
        rpn_train = train and not cfg.RPN.FIXED
        rpn_out = self.rpn(input_data["pts_input"], rpn_train, bn_momentum)
        if cfg.RPN.FIXED:
            rpn_out = jax.tree_util.tree_map(jax.lax.stop_gradient, rpn_out)
        output.update(rpn_out)

        if not cfg.RCNN.ENABLED:
            return output

        # stage hand-off, all under stop_gradient (reference point_rcnn.py:37-52)
        rpn_cls = jax.lax.stop_gradient(rpn_out["rpn_cls"])
        rpn_reg = jax.lax.stop_gradient(rpn_out["rpn_reg"])
        backbone_xyz = jax.lax.stop_gradient(rpn_out["backbone_xyz"])
        backbone_features = jax.lax.stop_gradient(rpn_out["backbone_features"])

        rpn_scores_raw = rpn_cls[..., 0]
        rpn_scores_norm = jax.nn.sigmoid(rpn_scores_raw)
        seg_mask = (rpn_scores_norm > cfg.RPN.SCORE_THRESH).astype(jnp.float32)
        pts_depth = jnp.linalg.norm(backbone_xyz, axis=2)

        rois, roi_scores_raw, roi_valid = proposal_layer(
            cfg, self.mode, rpn_scores_raw, rpn_reg, backbone_xyz
        )
        output["rois"] = rois
        output["roi_scores_raw"] = roi_scores_raw
        output["roi_valid"] = roi_valid
        output["seg_result"] = seg_mask

        if train:
            key = self.make_rng("target")
            target = proposal_target_layer(
                cfg, key, rois, roi_valid,
                input_data["gt_boxes3d"], input_data["gt_valid"],
                backbone_xyz, backbone_features, seg_mask, pts_depth,
                rpn_intensity=input_data.get("rpn_intensity"),
                gt_cls=input_data.get("gt_cls"),
            )
            pts_input = jnp.concatenate(
                [target["sampled_pts"], target["pts_feature"]], axis=2
            )
            output.update(target)
            rcnn_out = self.rcnn_net(pts_input, train, bn_momentum)
        else:
            extra = [seg_mask[..., None]]
            if cfg.RCNN.USE_INTENSITY and "rpn_intensity" in input_data:
                extra.insert(0, input_data["rpn_intensity"][..., None])
            if cfg.RCNN.USE_DEPTH:
                extra.append((pts_depth / 70.0 - 0.5)[..., None])
            pts_feature = jnp.concatenate(extra + [backbone_features], axis=-1)

            pooled, empty = roipool3d(
                backbone_xyz, pts_feature, rois,
                cfg.RCNN.POOL_EXTRA_WIDTH, cfg.RCNN.NUM_POINTS,
                method=getattr(cfg.RCNN, "ROIPOOL_METHOD", "auto"),
            )
            pooled = pooled.at[..., 0:3].set(
                canonical_transform(pooled[..., 0:3], rois)
            )
            B, M = rois.shape[0], rois.shape[1]
            pts_input = pooled.reshape(B * M, cfg.RCNN.NUM_POINTS, -1)
            output["pooled_empty_flag"] = empty
            rcnn_out = self.rcnn_net(pts_input, train, bn_momentum)

        output.update(rcnn_out)
        return output
