"""Flax building blocks shared by the RPN and RCNN networks.

Channel-last (B, ..., C) throughout — 1x1 Conv1d/Conv2d stacks from the
reference (pointnet2_lib pytorch_utils.Conv1d / SharedMLP, consumed at
lib/net/rpn.py:19-46, lib/net/rcnn_net.py:21-81) become Dense layers over the
trailing axis, which XLA maps straight onto the MXU.

BatchNorm is hand-rolled (instead of flax.linen.BatchNorm) because the
reference schedules BN momentum per epoch (BNMomentumScheduler,
tools/train_utils/train_utils.py:24-45): momentum must be a *runtime* scalar,
not a module attribute.  Torch conventions: running = (1-m)*running + m*batch,
unbiased variance in the running update, eps 1e-5.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch Conv default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
xavier_normal = nn.initializers.glorot_normal()


def final_layer_init(std: float = 0.001):
    return nn.initializers.normal(stddev=std)


class BatchNorm(nn.Module):
    """Torch-convention batch norm with runtime momentum."""

    eps: float = 1e-5
    axis_name: str | None = None  # set to sync stats across a mesh axis

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, momentum) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(x), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for d in x.shape[:-1]:
                    n *= d
                unbiased = var * (n / max(n - 1, 1))
                m = jnp.asarray(momentum, ra_mean.value.dtype)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class ConvBN(nn.Module):
    """Dense (+BN) (+ReLU) — the reference's Conv1d/Conv2d-k1 block.

    ``dtype`` selects the matmul compute dtype (bf16 feeds the MXU at full
    rate); params and BN statistics stay float32.
    """

    features: int
    bn: bool = True
    activation: bool = True
    kernel_init: nn.initializers.Initializer = torch_conv_init
    use_bias: bool | None = None  # default: bias iff no BN (pt_utils convention)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, bn_momentum=0.1) -> jnp.ndarray:
        use_bias = (not self.bn) if self.use_bias is None else self.use_bias
        x = nn.Dense(
            self.features, use_bias=use_bias, kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = BatchNorm()(x.astype(jnp.float32), train, bn_momentum)
        if self.activation:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Dense(+BN)+ReLU stack (reference pt_utils.SharedMLP) with explicit
    parameters so the eval path can fold BN into the weights and run the
    whole stack (+ optional neighborhood max) as ONE fused Pallas kernel
    (ops.pallas_mlp) — the per-group MLPs are otherwise HBM-bound on the
    (B, S, K, C) activations."""

    features: Sequence[int]
    bn: bool = True
    kernel_init: nn.initializers.Initializer = torch_conv_init
    dtype: jnp.dtype | None = None
    # commute the layer-1 xyz weights through the fused gather (halves the
    # gather matmul) — ONLY safe for canonical-frame inputs (the RCNN SA
    # stack); see ops.pallas_mlp docstring for the precision analysis
    fold_geometry: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray | None, train: bool = False, bn_momentum=0.1,
        reduce_max: bool = False, group_args: tuple | None = None,
    ) -> jnp.ndarray:
        """``reduce_max=True`` additionally maxes over axis 2 (the
        neighborhood axis of a (B, S, K, C) input).

        ``group_args=(xyz, features, new_xyz, idx, use_xyz)`` replaces ``x``
        with an un-materialised neighborhood: on the eval path the gather,
        the MLP stack and the K-max run as ONE Pallas kernel
        (ops.pallas_mlp.fused_group_mlp_max); elsewhere the neighborhoods are
        grouped here and flow through the plain formulation.
        """
        eps = 1e-5
        if group_args is not None:
            g_xyz, g_feats, g_new_xyz, g_idx, g_use_xyz = group_args
            cin = (g_feats.shape[-1] if g_feats is not None else 0) + (
                3 if g_use_xyz else 0
            )
            reduce_max = True
        else:
            cin = x.shape[-1]
        layers = []
        for i, f in enumerate(self.features):
            w = self.param(f"w{i}", self.kernel_init, (cin, f))
            if self.bn:
                scale = self.param(f"bn{i}_scale", nn.initializers.ones, (f,))
                bias = self.param(f"bn{i}_bias", nn.initializers.zeros, (f,))
                mean_v = self.variable("batch_stats", f"bn{i}_mean",
                                       nn.initializers.zeros, None, (f,))
                var_v = self.variable("batch_stats", f"bn{i}_var",
                                      nn.initializers.ones, None, (f,))
                layers.append((w, None, scale, bias, mean_v, var_v))
            else:
                b = self.param(f"b{i}", nn.initializers.zeros, (f,))
                layers.append((w, b, None, None, None, None))
            cin = f

        dt = self.dtype or (x.dtype if x is not None else jnp.float32)

        if reduce_max and not train:
            # fold BN (running stats) into (W, b) and run fused
            from pointrcnn_tpu.ops.pallas_mlp import (
                fused_group_mlp_max,
                fused_group_mlp_max_supported,
                fused_mlp_max,
            )

            ws, bs = [], []
            for w, b, scale, bias, mean_v, var_v in layers:
                if self.bn:
                    inv = scale * jax.lax.rsqrt(var_v.value + eps)
                    ws.append(w * inv[None, :])
                    bs.append(bias - mean_v.value * inv)
                else:
                    ws.append(w)
                    bs.append(b)
            if group_args is not None:
                if fused_group_mlp_max_supported(g_feats, g_idx, jnp.dtype(dt)):
                    from pointrcnn_tpu.ops.pallas_mlp import fold_geometry_profitable

                    return fused_group_mlp_max(
                        g_xyz, g_feats, g_new_xyz, g_idx, ws, bs, g_use_xyz,
                        fold_geometry=self.fold_geometry
                        and fold_geometry_profitable(g_feats),
                    )
                from pointrcnn_tpu.ops.grouping import group_points

                x = group_points(g_xyz, g_feats, g_new_xyz, g_idx,
                                 g_use_xyz, out_dtype=dt)
            return fused_mlp_max(x, ws, bs, compute_dtype=dt)

        if reduce_max and train and not self.bn and group_args is not None:
            # BN-free stack under training (the RCNN SA stack,
            # RCNN.USE_BN=False): no batch statistics to track, so the eval
            # kernel's semantics apply and the fused op's Pallas *backward*
            # (ops.pallas_mlp._pallas_bwd) keeps the (B, S, K, C)
            # neighborhoods out of HBM in the VJP too.  Only taken when the
            # kernel actually runs — the XLA fallback inside the fused path
            # rounds activations to bf16 between layers, a precision cut the
            # generic path below doesn't make.
            from pointrcnn_tpu.ops.pallas_mlp import (
                fused_group_bwd_supported,
                fused_group_mlp_max,
                fused_group_mlp_max_supported,
            )

            # BOTH kernels must be supported: with only the forward, the VJP
            # would fall back to the bf16 XLA recompute, whose rounding order
            # differs from the Pallas forward — gradients of a slightly
            # different function (the mismatch class that regressed the
            # People joint convergence, see ROUND_NOTES)
            if fused_group_mlp_max_supported(
                g_feats, g_idx, jnp.dtype(dt)
            ) and fused_group_bwd_supported(g_feats, g_idx):
                from pointrcnn_tpu.ops.pallas_mlp import fold_geometry_profitable

                ws = [w for w, *_ in layers]
                bs = [b for _, b, *_ in layers]
                return fused_group_mlp_max(
                    g_xyz, g_feats, g_new_xyz, g_idx, ws, bs, g_use_xyz,
                    fold_geometry=self.fold_geometry
                    and fold_geometry_profitable(g_feats),
                )

        if group_args is not None:
            from pointrcnn_tpu.ops.grouping import group_points

            x = group_points(g_xyz, g_feats, g_new_xyz, g_idx, g_use_xyz,
                             out_dtype=dt)

        for w, b, scale, bias, mean_v, var_v in layers:
            y = jnp.dot(x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)
            if self.bn:
                if train:
                    axes = tuple(range(y.ndim - 1))
                    mean = jnp.mean(y, axis=axes)
                    mean2 = jnp.mean(jnp.square(y), axis=axes)
                    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
                    if not self.is_initializing():
                        n = 1
                        for d in y.shape[:-1]:
                            n *= d
                        m = jnp.asarray(bn_momentum, jnp.float32)
                        mean_v.value = (1 - m) * mean_v.value + m * mean
                        var_v.value = (1 - m) * var_v.value + m * var * (n / max(n - 1, 1))
                else:
                    mean, var = mean_v.value, var_v.value
                y = (y - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
            else:
                y = y + b
            x = nn.relu(y)
        if reduce_max:
            x = jnp.max(x, axis=2)
        return x


class HeadMLP(nn.Module):
    """cls/reg head: ConvBN stack with dropout after the first layer, then a
    linear output layer (reference rpn.py:19-46, rcnn_net.py:44-81)."""

    hidden: Sequence[int]
    out_features: int
    bn: bool = True
    dp_ratio: float = 0.0
    kernel_init: nn.initializers.Initializer = torch_conv_init
    out_kernel_init: nn.initializers.Initializer = final_layer_init()
    out_bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, bn_momentum=0.1) -> jnp.ndarray:
        for i, f in enumerate(self.hidden):
            x = ConvBN(f, bn=self.bn, kernel_init=self.kernel_init, dtype=self.dtype)(
                x, train, bn_momentum
            )
            if i == 0 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        x = nn.Dense(
            self.out_features,
            kernel_init=self.out_kernel_init,
            bias_init=self.out_bias_init,
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)
