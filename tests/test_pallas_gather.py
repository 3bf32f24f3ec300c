"""Interpret-mode CI for the fused neighborhood-gather kernel.

``ops.pallas_gather.group_points_pallas`` is the default TPU path for
BN-train neighborhood grouping at 256 <= N <= 4096 (RPN SA2-SA4 under
training, dispatched from ops.grouping.group_points).  Its support gate
requires a TPU backend, so the CPU suite never executes it through the
model tests — these tests monkeypatch ``_INTERPRET`` and pin the kernel
(forward AND custom VJP) against the exact XLA formulation it replaces:

- forward must match ``[take(xyz, idx) - new_xyz, take(features, idx)]``
  cast to bf16 (QueryAndGroup semantics, reference
  Pointnet2.PyTorch src/group_points_gpu.cu + pointnet2_utils.QueryAndGroup)
  to the hi/lo-split reconstruction bound (~|xyz| * 2^-16 before the final
  bf16 round — well inside one bf16 ulp of the coordinate magnitude);
- the VJP must match jax.grad through the XLA formulation for all three
  differentiable inputs (xyz, features, new_xyz).  Both paths round the
  cotangent to bf16 before scattering (the op's output is bf16), so with
  bf16-representable cotangents the comparison is f32-summation-order tight;
- gradient dtypes must match the primal dtypes (custom_vjp aval contract),
  including bf16 feature tables.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops import pallas_gather


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_gather, "_INTERPRET", True)


def _xla_group(xyz, features, new_xyz, idx):
    """The exact XLA formulation group_points_pallas replaces
    (ops.grouping.group_points fallback, use_xyz=True, out_dtype=bf16)."""
    gx = jnp.take_along_axis(
        xyz[:, None].repeat(idx.shape[1], axis=1), idx[..., None], axis=2)
    rel = (gx - new_xyz[:, :, None, :]).astype(jnp.bfloat16)
    gf = jnp.take_along_axis(
        features[:, None].repeat(idx.shape[1], axis=1), idx[..., None], axis=2
    ).astype(jnp.bfloat16)
    return jnp.concatenate([rel, gf], axis=-1)


def _case(seed, B, N, C, S, K, scale=30.0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-scale, scale, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    new_xyz = xyz[:, :S] + rng.uniform(-0.5, 0.5, (B, S, 3)).astype(np.float32)
    idx = rng.randint(0, N, (B, S, K)).astype(np.int32)
    return (jnp.asarray(xyz), jnp.asarray(feats),
            jnp.asarray(new_xyz), jnp.asarray(idx))


# SA2-like (N=4096 is the large end of the support window), SA3/SA4-like,
# and a deliberately non-128-multiple C to exercise table padding
@pytest.mark.parametrize("B,N,C,S,K", [
    (2, 512, 96, 128, 32),
    (1, 4096, 8, 256, 16),
    (2, 256, 67, 64, 8),
])
def test_forward_matches_xla(B, N, C, S, K):
    xyz, feats, new_xyz, idx = _case(0, B, N, C, S, K)
    assert pallas_gather.group_points_pallas_supported(feats, idx)
    got = np.asarray(
        pallas_gather.group_points_pallas(xyz, feats, new_xyz, idx),
        dtype=np.float32)
    ref = np.asarray(_xla_group(xyz, feats, new_xyz, idx), dtype=np.float32)

    # features are gathered by an exact one-hot matmul: bit-equal to the ref
    np.testing.assert_array_equal(got[..., 3:], ref[..., 3:])
    # rel coords: hi/lo split reconstruction differs from the f32 subtraction
    # by <= |xyz| * 2^-16 before the final bf16 round -> at scale 30 that is
    # ~0.5 mm; one bf16 ulp of the rel magnitude dominates
    rel_err = np.abs(got[..., :3] - ref[..., :3])
    # one bf16 ulp of x is up to |x| * 2^-7 (ulp(2^k..2^(k+1)) = 2^(k-7));
    # the two casts may land on adjacent bf16 values when the hi/lo
    # reconstruction perturbs a value across a rounding boundary — measure
    # the ulp at the larger magnitude (ref just under 2^k, got above)
    mag = np.maximum(np.abs(ref[..., :3]), np.abs(got[..., :3]))
    bound = np.maximum(mag * (2.0 ** -7), 30 * 2.0 ** -15)
    assert (rel_err <= bound).all(), rel_err.max()


def test_vjp_matches_xla_grad():
    B, N, C, S, K = 2, 512, 96, 128, 32
    xyz, feats, new_xyz, idx = _case(1, B, N, C, S, K)
    # bf16-representable cotangent so both paths scatter identical values
    rng = np.random.RandomState(2)
    ct = jnp.asarray(
        rng.randn(B, S, K, 3 + C).astype(np.float32)).astype(
        jnp.bfloat16).astype(jnp.float32)

    def loss_pallas(x, f, nx):
        return jnp.sum(pallas_gather.group_points_pallas(
            x, f, nx, idx).astype(jnp.float32) * ct)

    def loss_xla(x, f, nx):
        return jnp.sum(_xla_group(x, f, nx, idx).astype(jnp.float32) * ct)

    gp = jax.grad(loss_pallas, (0, 1, 2))(xyz, feats, new_xyz)
    gr = jax.grad(loss_xla, (0, 1, 2))(xyz, feats, new_xyz)
    for name, a, b, tol in (
        # dxyz flows through the hi lane only (lo cast has zero derivative);
        # the XLA path's bf16 cast likewise passes the cotangent through
        ("dxyz", gp[0], gr[0], 1e-5),
        ("dfeatures", gp[1], gr[1], 1e-5),
        ("dnew_xyz", gp[2], gr[2], 1e-5),
    ):
        assert a.dtype == jnp.float32  # matches the f32 primals
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < tol, \
            f"{name}: rel {np.abs(a - b).max() / denom:.2e}"


def test_vjp_gradient_dtypes_match_primals():
    """bf16 primals on a grad path must get bf16 cotangents back
    (custom_vjp aval contract) — regression guard for the unconditional-f32
    return the advisor flagged."""
    B, N, C, S, K = 1, 256, 32, 32, 8
    xyz, feats, new_xyz, idx = _case(3, B, N, C, S, K)
    feats16 = feats.astype(jnp.bfloat16)

    def loss(f):
        return jnp.sum(pallas_gather.group_points_pallas(
            xyz, f, new_xyz, idx).astype(jnp.float32))

    g = jax.grad(loss)(feats16)
    assert g.dtype == jnp.bfloat16


def test_gather_mm_bwd_dtype_contract():
    """Same aval contract for the mid-size-table matmul-VJP gather
    (ops.common._gather_mm_bwd)."""
    from pointrcnn_tpu.ops.common import _gather_mm_bwd

    rng = np.random.RandomState(4)
    pts16 = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32)).astype(
        jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 128, (2, 64, 4)).astype(np.int32))
    g = jax.grad(lambda p: jnp.sum(
        _gather_mm_bwd(p, idx).astype(jnp.float32)))(pts16)
    assert g.dtype == jnp.bfloat16


def test_grouping_dispatch_reaches_pallas(monkeypatch):
    """ops.grouping.group_points must route to the kernel when supported
    (use_xyz=True, bf16 out, in-window N) — pin the dispatch so a refactor
    can't silently orphan the kernel while its unit tests stay green."""
    from pointrcnn_tpu.ops import grouping

    xyz, feats, new_xyz, idx = _case(5, 1, 512, 16, 32, 8)
    called = {}
    real = pallas_gather.group_points_pallas

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(pallas_gather, "group_points_pallas", spy)
    out = grouping.group_points(xyz, feats, new_xyz, idx, True, jnp.bfloat16)
    assert called.get("hit"), "dispatch did not reach group_points_pallas"
    assert out.shape == (1, 32, 8, 19) and out.dtype == jnp.bfloat16
