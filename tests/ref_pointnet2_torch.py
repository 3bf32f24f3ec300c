"""Pure-torch stand-in for the reference's absent ``pointnet2_lib`` submodule.

The reference consumes the (not-vendored) Pointnet2.PyTorch submodule
(SURVEY.md N3; imports at lib/net/pointnet2_msg.py:3, lib/net/rcnn_net.py:4-6,
lib/net/rpn.py:5).  This module reproduces BOTH sides of it in pure torch:

- the *parameter naming* of the upstream modules
  (``SA_modules.{k}.mlps.{j}.layer{i}.conv`` / ``...bn.bn``, ``Conv1d`` =
  ``conv`` + ``bn.bn``) — ground truth for checkpoint-converter tests, and
- the *forward semantics* of the upstream CUDA primitives
  (``furthest_point_sample``, ``ball_query``, ``grouping_operation``,
  ``three_nn``, ``three_interpolate``) under the SAME conventions our JAX ops
  are pinned to by the numpy oracles in tests/test_ops.py: FPS starts at
  index 0 and breaks argmax ties low; ball query takes the first ``nsample``
  hits with d2 < r^2 in point-index order, pads short neighborhoods with the
  first hit and empty ones with index 0; three_nn returns euclidean (sqrt)
  distances; interpolation weights are 1/(d+1e-8), normalised.

With it installed (``install()``), the reference's real network code —
lib/net/rpn.py, lib/net/pointnet2_msg.py, lib/net/rcnn_net.py — executes
end-to-end on CPU, enabling direct whole-network forward parity tests
against our JAX models (tests/test_reference_forward_parity.py).

(The upstream FPS kernel additionally skips candidate points with squared
norm <= 1e-3 — a guard against degenerate all-zero pad points at the
coordinate origin, unreachable for real KITTI rect-frame clouds; neither our
JAX op nor this stand-in reproduces it.)
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------ functional ops


def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """(B, N, 3) -> (B, npoint) int64.  Greedy max-min, first pick = index 0."""
    B, N, _ = xyz.shape
    idx = torch.zeros(B, npoint, dtype=torch.long)
    dists = torch.full((B, N), float("inf"), dtype=xyz.dtype)
    last = torch.zeros(B, dtype=torch.long)
    batch = torch.arange(B)
    for i in range(npoint):
        idx[:, i] = last
        d = ((xyz - xyz[batch, last][:, None, :]) ** 2).sum(-1)
        dists = torch.minimum(dists, d)
        last = dists.argmax(-1)
    return idx


def gather_operation(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """(B, C, N) x (B, S) -> (B, C, S)."""
    C = features.shape[1]
    return features.gather(2, idx.unsqueeze(1).expand(-1, C, -1))


def ball_query(radius: float, nsample: int, xyz: torch.Tensor,
               new_xyz: torch.Tensor, chunk: int = 256) -> torch.Tensor:
    """(B, N, 3) queried at (B, S, 3) -> (B, S, nsample) int64.

    First ``nsample`` points with d2 < radius^2 in index order; short
    neighborhoods pad with the first hit, empty ones with index 0
    (ball_query_gpu.cu semantics, as pinned by tests/test_ops.np_ball_query).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    cols = torch.arange(N)
    out = []
    for b in range(B):
        sel_chunks = []
        for s0 in range(0, S, chunk):
            q = new_xyz[b, s0:s0 + chunk]  # (s, 3)
            d2 = ((q[:, None, :] - xyz[b][None, :, :]) ** 2).sum(-1)  # (s, N)
            key = torch.where(d2 < radius * radius,
                              cols.expand_as(d2), torch.full_like(cols, N))
            key, _ = key.sort(dim=-1)
            sel = key[:, :nsample]
            first = sel[:, :1]
            sel = torch.where(sel == N, first, sel)
            sel = torch.where(sel == N, torch.zeros_like(sel), sel)
            sel_chunks.append(sel)
        out.append(torch.cat(sel_chunks, 0))
    return torch.stack(out)


def grouping_operation(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """(B, C, N) x (B, S, K) -> (B, C, S, K)."""
    B, C, _ = features.shape
    S, K = idx.shape[1], idx.shape[2]
    flat = idx.reshape(B, 1, S * K).expand(-1, C, -1)
    return features.gather(2, flat).reshape(B, C, S, K)


def three_nn(unknown: torch.Tensor, known: torch.Tensor, chunk: int = 1024):
    """(B, n, 3) x (B, m, 3) -> (dist (B, n, 3) euclidean, idx (B, n, 3))."""
    dists, idxs = [], []
    for n0 in range(0, unknown.shape[1], chunk):
        u = unknown[:, n0:n0 + chunk]
        d2 = ((u[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
        d2, idx = torch.topk(d2, 3, dim=-1, largest=False, sorted=True)
        dists.append(torch.sqrt(torch.clamp(d2, min=0.0)))
        idxs.append(idx)
    return torch.cat(dists, 1), torch.cat(idxs, 1)


def three_interpolate(features: torch.Tensor, idx: torch.Tensor,
                      weight: torch.Tensor) -> torch.Tensor:
    """(B, C, m) x (B, n, 3) x (B, n, 3) -> (B, C, n)."""
    return (grouping_operation(features, idx) * weight.unsqueeze(1)).sum(-1)


# ------------------------------------------------------- grouping modules


class QueryAndGroup(nn.Module):
    def __init__(self, radius: float, nsample: int, use_xyz: bool = True):
        super().__init__()
        self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

    def forward(self, xyz, new_xyz, features=None):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = grouping_operation(xyz.transpose(1, 2).contiguous(), idx)
        grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
        if features is not None:
            grouped_features = grouping_operation(features, idx)
            if self.use_xyz:
                return torch.cat([grouped_xyz, grouped_features], dim=1)
            return grouped_features
        assert self.use_xyz, "no features and no xyz to group"
        return grouped_xyz


class GroupAll(nn.Module):
    def __init__(self, use_xyz: bool = True):
        super().__init__()
        self.use_xyz = use_xyz

    def forward(self, xyz, new_xyz, features=None):
        grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)  # (B, 3, 1, N)
        if features is not None:
            grouped_features = features.unsqueeze(2)
            if self.use_xyz:
                return torch.cat([grouped_xyz, grouped_features], dim=1)
            return grouped_features
        return grouped_xyz


# ------------------------------------------- pt_utils (Conv/BN/MLP blocks)


class _BNWrap(nn.Sequential):
    # upstream wraps the torch BN in a named child -> keys "bn.bn.*"
    def __init__(self, bn_cls, n):
        super().__init__()
        self.add_module("bn", bn_cls(n))


class _ConvBase(nn.Sequential):
    def __init__(self, conv_cls, bn_cls, in_size, out_size, bn, activation):
        super().__init__()
        self.add_module(
            "conv", conv_cls(in_size, out_size, kernel_size=1, bias=not bn))
        if bn:
            self.add_module("bn", _BNWrap(bn_cls, out_size))
        if activation is not None:
            self.add_module("activation", activation)


class Conv1d(_ConvBase):
    def __init__(self, in_size, out_size, bn=False,
                 activation=nn.ReLU(inplace=True), **kw):
        super().__init__(nn.Conv1d, nn.BatchNorm1d,
                         in_size, out_size, bn, activation)


class Conv2d(_ConvBase):
    def __init__(self, in_size, out_size, bn=False,
                 activation=nn.ReLU(inplace=True), **kw):
        super().__init__(nn.Conv2d, nn.BatchNorm2d,
                         in_size, out_size, bn, activation)


class SharedMLP(nn.Sequential):
    def __init__(self, args, bn=False, activation=nn.ReLU(inplace=True), **kw):
        super().__init__()
        for i in range(len(args) - 1):
            self.add_module(
                f"layer{i}", Conv2d(args[i], args[i + 1],
                                    bn=bn, activation=activation))


# ------------------------------------------------------ pointnet2_modules


class PointnetSAModuleMSG(nn.Module):
    def __init__(self, *, npoint=None, radii=None, nsamples=None, mlps=None,
                 bn=True, use_xyz=True):
        super().__init__()
        self.npoint = npoint
        self.groupers = nn.ModuleList()
        self.mlps = nn.ModuleList()
        for j, spec in enumerate(mlps):
            if npoint is not None:
                self.groupers.append(
                    QueryAndGroup(radii[j], nsamples[j], use_xyz=use_xyz))
            else:
                self.groupers.append(GroupAll(use_xyz))
            spec = list(spec)
            if use_xyz:
                spec[0] += 3
            self.mlps.append(SharedMLP(spec, bn=bn))

    def forward(self, xyz, features=None):
        new_xyz = None
        if self.npoint is not None:
            flipped = xyz.transpose(1, 2).contiguous()
            new_xyz = gather_operation(
                flipped, furthest_point_sample(xyz, self.npoint)
            ).transpose(1, 2).contiguous()
        outs = []
        for grouper, mlp in zip(self.groupers, self.mlps):
            g = grouper(xyz, new_xyz, features)       # (B, C, S, K)
            g = mlp(g)                                # (B, C', S, K)
            g = F.max_pool2d(g, kernel_size=[1, g.size(3)])
            outs.append(g.squeeze(-1))                # (B, C', S)
        return new_xyz, torch.cat(outs, dim=1)


class PointnetSAModule(PointnetSAModuleMSG):
    def __init__(self, *, mlp, npoint=None, radius=None, nsample=None,
                 bn=True, use_xyz=True):
        super().__init__(mlps=[mlp], npoint=npoint, radii=[radius],
                         nsamples=[nsample], bn=bn, use_xyz=use_xyz)


class PointnetFPModule(nn.Module):
    def __init__(self, *, mlp, bn=True):
        super().__init__()
        self.mlp = SharedMLP(mlp, bn=bn)

    def forward(self, unknown, known, unknow_feats, known_feats):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            norm = torch.sum(dist_recip, dim=2, keepdim=True)
            interp = three_interpolate(known_feats, idx, dist_recip / norm)
        else:
            interp = known_feats.expand(*known_feats.size()[0:2], unknown.size(1))
        if unknow_feats is not None:
            interp = torch.cat([interp, unknow_feats], dim=1)
        return self.mlp(interp.unsqueeze(-1)).squeeze(-1)


# ------------------------------------------------------------- installation


def install() -> None:
    """Register this implementation as the ``pointnet2_lib`` package tree the
    reference imports.  Idempotent."""
    if "pointnet2_lib.pointnet2.pytorch_utils" in sys.modules:
        return
    pkg = types.ModuleType("pointnet2_lib")
    pkg.__path__ = []
    sub = types.ModuleType("pointnet2_lib.pointnet2")
    sub.__path__ = []
    ptu = types.ModuleType("pointnet2_lib.pointnet2.pytorch_utils")
    ptu.Conv1d, ptu.Conv2d, ptu.SharedMLP = Conv1d, Conv2d, SharedMLP
    p2m = types.ModuleType("pointnet2_lib.pointnet2.pointnet2_modules")
    p2m.PointnetSAModule = PointnetSAModule
    p2m.PointnetSAModuleMSG = PointnetSAModuleMSG
    p2m.PointnetFPModule = PointnetFPModule
    pkg.pointnet2 = sub
    sub.pytorch_utils, sub.pointnet2_modules = ptu, p2m
    sys.modules["pointnet2_lib"] = pkg
    sys.modules["pointnet2_lib.pointnet2"] = sub
    sys.modules["pointnet2_lib.pointnet2.pytorch_utils"] = ptu
    sys.modules["pointnet2_lib.pointnet2.pointnet2_modules"] = p2m
