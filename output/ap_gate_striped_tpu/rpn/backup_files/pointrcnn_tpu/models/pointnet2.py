"""PointNet++ set-abstraction and feature-propagation modules (flax).

TPU-native re-design of the reference's PointnetSAModuleMSG /
PointnetSAModule / PointnetFPModule (Pointnet2.PyTorch submodule, consumed at
lib/net/pointnet2_msg.py:26-45 and lib/net/rcnn_net.py:28-42): channel-last
layout, dense fixed-shape neighborhoods from :mod:`pointrcnn_tpu.ops`, and
per-group MLPs expressed as Dense stacks that XLA fuses onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from pointrcnn_tpu.models.layers import SharedMLP
from pointrcnn_tpu.ops.common import gather_points
from pointrcnn_tpu.ops.grouping import (
    ball_query,
    ball_query_multi,
    group_points,
    three_interpolate,
    three_nn,
)
from pointrcnn_tpu.ops.sampling import furthest_point_sample


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA: FPS centroids, per-radius ball query + shared
    MLP + channel max, concatenated over scales."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn: bool = True
    ball_chunk: int = 512
    dtype: jnp.dtype | None = None
    query_method: str = "approx"
    fps_method: str = "exact"

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, bn_momentum=0.1):
        """xyz: (B, N, 3); features: (B, N, C) or None ->
        (new_xyz (B, npoint, 3), new_features (B, npoint, sum(mlp[-1])))."""
        specs = tuple(zip(self.radii, self.nsamples))

        if features is None and self.use_xyz and self.query_method == "approx":
            # xyz-only stage: the fused ball-query kernels emit the grouped
            # relative coordinates directly — no neighborhood gather at all
            from pointrcnn_tpu.ops.grouping import (
                fps_group_banded,
                fps_group_banded_supported,
            )
            from pointrcnn_tpu.ops.pallas_ballquery import (
                ball_query_multi_grouped_pallas,
                ball_query_pallas_supported,
            )

            rels = new_xyz = None
            if self.fps_method == "blockwise" and fps_group_banded_supported(
                xyz.shape[1], self.npoint, self.nsamples
            ):
                # blockwise FPS already z-bands the scene; the banded query
                # searches each centroid's band ±1 instead of all N points
                new_xyz, rels = fps_group_banded(xyz, self.npoint, specs)
            elif ball_query_pallas_supported(
                xyz.shape[1], self.npoint, max(self.nsamples)
            ):
                fps_idx = furthest_point_sample(
                    xyz, self.npoint, method=self.fps_method)
                new_xyz = gather_points(xyz, fps_idx)
                rels = ball_query_multi_grouped_pallas(xyz, new_xyz, specs)
            if rels is not None:
                dt = self.dtype or xyz.dtype
                outs = [
                    SharedMLP(tuple(mlp), bn=self.bn, dtype=self.dtype)(
                        rel.astype(dt), train, bn_momentum, reduce_max=True
                    )
                    for rel, mlp in zip(rels, self.mlps)
                ]
                return new_xyz, jnp.concatenate(outs, axis=-1)

        fps_idx = furthest_point_sample(xyz, self.npoint, method=self.fps_method)
        new_xyz = gather_points(xyz, fps_idx)

        idx_list = ball_query_multi(
            xyz, new_xyz, specs,
            chunk=self.ball_chunk, method=self.query_method,
        )
        outs = []
        for idx, mlp in zip(idx_list, self.mlps):
            feat = SharedMLP(tuple(mlp), bn=self.bn, dtype=self.dtype)(
                None, train, bn_momentum, reduce_max=True,
                group_args=(xyz, features, new_xyz, idx, self.use_xyz),
            )
            outs.append(feat)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstraction(nn.Module):
    """Single-scale SA; ``npoint=None`` means group-all (global pooling),
    as used by the RCNN head's last stage (rcnn_net.py:31-33)."""

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    use_xyz: bool = True
    bn: bool = True
    ball_chunk: int = 512
    dtype: jnp.dtype | None = None
    query_method: str = "approx"
    fps_method: str = "exact"
    # safe only for canonical-frame xyz magnitudes (the RCNN stack sets it)
    fold_geometry: bool = False

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, bn_momentum=0.1):
        if self.npoint is not None:
            fps_idx = furthest_point_sample(xyz, self.npoint, method=self.fps_method)
            new_xyz = gather_points(xyz, fps_idx)
            idx = ball_query(xyz, new_xyz, self.radius, self.nsample,
                             chunk=self.ball_chunk, method=self.query_method)
            feat = SharedMLP(tuple(self.mlp), bn=self.bn, dtype=self.dtype,
                             fold_geometry=self.fold_geometry)(
                None, train, bn_momentum, reduce_max=True,
                group_args=(xyz, features, new_xyz, idx, self.use_xyz),
            )
            return new_xyz, feat
        else:
            # group-all: a single neighborhood containing every point
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            g = xyz[:, None, :, :]
            if features is not None:
                g = jnp.concatenate([g, features[:, None, :, :]], axis=-1) if self.use_xyz \
                    else features[:, None, :, :]
            grouped = g
        feat = SharedMLP(tuple(self.mlp), bn=self.bn, dtype=self.dtype)(
            grouped, train, bn_momentum, reduce_max=True
        )
        return new_xyz, feat


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN interpolation + unit MLP (PointnetFPModule)."""

    mlp: Sequence[int]
    bn: bool = True
    nn_chunk: int = 2048
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = False, bn_momentum=0.1):
        dist, idx = three_nn(unknown_xyz, known_xyz, chunk=self.nn_chunk)
        interp = three_interpolate(known_feats, idx, dist)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(tuple(self.mlp), bn=self.bn, dtype=self.dtype)(
            interp, train, bn_momentum
        )


class Pointnet2MSG(nn.Module):
    """The RPN backbone: 4 MSG SA stages down, 4 FP stages back up
    (reference lib/net/pointnet2_msg.py:11-70).  Input (B, N, 3+C) point
    cloud, output (xyz (B, N, 3), per-point features (B, N, FP_MLPS[0][-1]))."""

    npoints: Sequence[int]
    radii: Sequence[Sequence[float]]
    nsamples: Sequence[Sequence[int]]
    mlps: Sequence[Sequence[Sequence[int]]]
    fp_mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    query_method: str = "approx"
    fps_method: str = "exact"

    @nn.compact
    def __call__(self, pointcloud, train: bool = False, bn_momentum=0.1):
        xyz = pointcloud[..., 0:3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        l_xyz, l_features = [xyz], [features]
        for k in range(len(self.npoints)):
            sa = SetAbstractionMSG(
                npoint=self.npoints[k],
                radii=tuple(self.radii[k]),
                nsamples=tuple(self.nsamples[k]),
                mlps=tuple(tuple(m) for m in self.mlps[k]),
                use_xyz=self.use_xyz,
                bn=self.bn,
                dtype=self.dtype,
                query_method=self.query_method,
                fps_method=self.fps_method,
            )
            li_xyz, li_feat = sa(l_xyz[k], l_features[k], train, bn_momentum)
            l_xyz.append(li_xyz)
            l_features.append(li_feat)

        n_fp = len(self.fp_mlps)
        for i in range(-1, -(n_fp + 1), -1):
            fp = FeaturePropagation(mlp=tuple(self.fp_mlps[i]), bn=self.bn, dtype=self.dtype)
            l_features[i - 1] = fp(
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i],
                train, bn_momentum,
            )
        return l_xyz[0], l_features[0]
