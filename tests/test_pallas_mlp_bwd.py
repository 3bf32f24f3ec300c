"""Pallas backward kernel for the fused group-MLP-max op.

The VJP of ops.pallas_mlp.fused_group_mlp_max is itself a Pallas kernel
(_pallas_bwd) that recomputes the gather+MLP in VMEM and backprops in-core.
These tests run both kernels in interpret mode on CPU and check the grads
against jax.grad through an XLA emulation of the kernel's *exact* numeric
formulation (commuted layer-1 P table, hi/lo geometry lanes — or the folded
xyz @ w0 table of mode "fold" — f32 inter-layer activations) — the same
function the forward evaluates, so relu/max masks line up and the only slack
is the backward matmuls' own bf16.

Reference semantics under test: the grads of QueryAndGroup + SharedMLP +
max_pool2d (Pointnet2.PyTorch group_points_grad / the Conv2d autograd chain,
consumed at rcnn_net.py:28-42).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pointrcnn_tpu.ops.pallas_mlp as pm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pm, "_INTERPRET", True)


def _emulate_kernel(mode, xyz, feats, new_xyz, idx, ws_in, bs_in):
    """XLA transcription of the forward kernel's numeric formulation."""
    N = feats.shape[1]
    table, cent, w0x, wss, bss, f0, f0p = pm._prepare_operands(
        mode, xyz, feats, new_xyz, list(ws_in), list(bs_in))
    n_layers = 1 + len(wss)
    oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
    g = jnp.einsum("bskn,bnc->bskc", oh, table,
                   preferred_element_type=jnp.float32)
    x = g[..., :f0p]
    if mode == "fold":
        x = x - cent[:, :, None, :]
    elif mode == "hilo":
        rel = g[..., f0p:] - cent[:, :, None, :]
        x = x + jnp.einsum("bskg,gf->bskf", rel.astype(jnp.bfloat16),
                           w0x.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    x = jnp.maximum(x + bss[0][0].astype(jnp.float32), 0.0)
    for i in range(1, n_layers):
        x = jnp.einsum("bskc,cf->bskf", x.astype(jnp.bfloat16),
                       wss[i - 1].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        x = jnp.maximum(x + bss[i][0].astype(jnp.float32), 0.0)
    out = jnp.max(x, axis=2)
    if len(ws_in) == 1:
        out = out[..., : ws_in[0].shape[1]]
    return out


def _fused_args(mode):
    return dict(use_xyz=mode != "none", fold_geometry=mode == "fold")


def _case(mode, layers, B=2, N=256, C=64, S=64, K=16, seed=0):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    new_xyz = jnp.asarray(rng.randn(B, S, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))
    cin = C + (3 if mode != "none" else 0)
    ws, bs, c = [], [], cin
    for f in layers:
        ws.append(jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.randn(f).astype(np.float32) * 0.1))
        c = f
    ct = jnp.asarray(rng.randn(B, S, layers[-1]).astype(np.float32))
    return xyz, feats, new_xyz, idx, ws, bs, ct


@pytest.mark.parametrize("mode", ["hilo", "fold", "none"])
@pytest.mark.parametrize("layers", [[64, 128], [64], [32, 48, 64]])
def test_pallas_bwd_matches_kernel_formulation(mode, layers):
    xyz, feats, new_xyz, idx, ws, bs, ct = _case(mode, layers)
    assert pm.fused_group_bwd_supported(feats, idx)

    def fused_loss(xyz, feats, new_xyz, ws, bs):
        out = pm.fused_group_mlp_max(xyz, feats, new_xyz, idx, ws, bs,
                                     **_fused_args(mode))
        return jnp.sum(out * ct)

    def emu_loss(xyz, feats, new_xyz, ws, bs):
        out = _emulate_kernel(mode, xyz, feats, new_xyz, idx, ws, bs)
        return jnp.sum(out * ct)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(
        xyz, feats, new_xyz, tuple(ws), tuple(bs))
    gr = jax.grad(emu_loss, argnums=(0, 1, 2, 3, 4))(
        xyz, feats, new_xyz, tuple(ws), tuple(bs))

    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


@pytest.mark.parametrize("mode", ["hilo", "fold"])
def test_pallas_bwd_multichunk_accumulation(mode):
    # S forces several centroid chunks per batch row; dtable accumulation
    # across chunks and dW/db accumulation across the whole grid are live
    layers = [64]
    xyz, feats, new_xyz, idx, ws, bs, ct = _case(
        mode, layers, B=2, S=128, K=32, seed=1)
    assert pm._pick_chunk_bwd(128, 32) < 128

    def fused_loss(xyz, feats, new_xyz, ws, bs):
        out = pm.fused_group_mlp_max(xyz, feats, new_xyz, idx, ws, bs,
                                     **_fused_args(mode))
        return jnp.sum(out * ct)

    def emu_loss(xyz, feats, new_xyz, ws, bs):
        out = _emulate_kernel(mode, xyz, feats, new_xyz, idx, ws, bs)
        return jnp.sum(out * ct)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(
        xyz, feats, new_xyz, tuple(ws), tuple(bs))
    gr = jax.grad(emu_loss, argnums=(0, 1, 2, 3, 4))(
        xyz, feats, new_xyz, tuple(ws), tuple(bs))
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_forward_unchanged_by_vjp_plumbing():
    # the fwd rule now saves the *untrimmed* out_full; the primal result
    # must still match the plain forward (single-layer trim path included)
    layers = [64]
    xyz, feats, new_xyz, idx, ws, bs, _ = _case("hilo", layers, seed=2)
    out = pm.fused_group_mlp_max(xyz, feats, new_xyz, idx, ws, bs, True)
    out_vjp, _ = jax.vjp(
        lambda *a: pm.fused_group_mlp_max(*a, True), xyz, feats, new_xyz,
        idx, tuple(ws), tuple(bs))
    assert out.shape == (2, new_xyz.shape[1], 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_vjp))


def test_fold_matches_hilo_at_small_coordinates():
    # canonical-frame magnitudes: the folded table's bf16 rounding of the
    # combined layer-1 pre-activation stays within a few parts in 2^8 of the
    # hilo formulation (the fold's documented error bound)
    layers = [64, 128]
    xyz, feats, new_xyz, idx, ws, bs, _ = _case("hilo", layers, seed=3)
    out_hilo = pm.fused_group_mlp_max(
        xyz, feats, new_xyz, idx, ws, bs, use_xyz=True)
    out_fold = pm.fused_group_mlp_max(
        xyz, feats, new_xyz, idx, ws, bs, use_xyz=True, fold_geometry=True)
    a, b = np.asarray(out_fold), np.asarray(out_hilo)
    scale = max(np.abs(b).max(), 1e-3)
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-2)
    # and the difference is genuinely nonzero (fold is a different rounding)
    assert np.abs(a - b).max() > 0
