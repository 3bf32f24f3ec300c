"""Interpret-mode CI for the chip-only Pallas kernels.

pallas_fps / pallas_ballquery / pallas_knn normally run only on TPU (their
support gates check the backend), so CPU CI never executed them — a kernel
regression would surface first on the chip. These tests monkeypatch the
modules' ``_INTERPRET`` flags and run the kernels through the Pallas
interpreter against the same oracles that pin the XLA paths:

- FPS (both the striped small-batch and the plain batched variant) must
  equal the sequential CUDA-semantics oracle exactly.
- three_nn must equal brute force exactly (it is an exact kernel).
- the approximate stride-class ball query must satisfy its documented
  contract: ascending candidate distances, the true nearest point first,
  self-consistent (idx, dist2) pairs, and exact relative-coordinate
  emission.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from test_ops import np_fps

from pointrcnn_tpu.ops import pallas_ballquery, pallas_fps, pallas_knn


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_fps, "_INTERPRET", True)
    monkeypatch.setattr(pallas_ballquery, "_INTERPRET", True)
    monkeypatch.setattr(pallas_knn, "_INTERPRET", True)


def test_fps_striped_kernel_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-10, 10, (2, 256, 3)).astype(np.float32)
    # B=2 < 8 engages the stripe-butterfly variant (s=2 at N=256)
    got = np.asarray(pallas_fps.furthest_point_sample_pallas(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_fps_plain_kernel_matches_oracle():
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-10, 10, (8, 128, 3)).astype(np.float32)
    got = np.asarray(pallas_fps.furthest_point_sample_pallas(jnp.asarray(xyz), 16))
    for b in range(8):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_three_nn_kernel_matches_brute_force():
    rng = np.random.RandomState(2)
    unknown = rng.uniform(-10, 10, (2, 256, 3)).astype(np.float32)
    known = rng.uniform(-10, 10, (2, 64, 3)).astype(np.float32)
    dist, idx = pallas_knn.three_nn_pallas(jnp.asarray(unknown), jnp.asarray(known))
    d2 = ((unknown[:, :, None] - known[:, None]) ** 2).sum(-1)
    order = np.argsort(d2, axis=-1)[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(
        np.asarray(dist), np.sqrt(np.take_along_axis(d2, order, -1)),
        rtol=1e-5, atol=1e-5)


def test_ball_query_kernel_contract():
    rng = np.random.RandomState(3)
    N, S, K = 2048, 16, 16
    xyz = rng.uniform(-10, 10, (2, N, 3)).astype(np.float32)
    cent = xyz[:, :S] + rng.uniform(-0.1, 0.1, (2, S, 3)).astype(np.float32)

    dist2, idx = pallas_ballquery.ball_query_pallas(
        jnp.asarray(xyz), jnp.asarray(cent), K)
    dist2, idx = np.asarray(dist2), np.asarray(idx)

    assert idx.min() >= 0 and idx.max() < N
    # ascending candidate distances
    assert (np.diff(dist2, axis=-1) >= -1e-5).all()
    # (idx, dist2) self-consistency: reported distance is the true distance
    # of the reported point
    true_d2 = ((np.take_along_axis(
        xyz[:, None].repeat(S, 1), idx[..., None].repeat(3, -1), 2)
        - cent[:, :, None]) ** 2).sum(-1)
    np.testing.assert_allclose(dist2, true_d2, rtol=1e-4, atol=1e-4)
    # the global nearest point is always candidate 0 (it is the minimum of
    # its stride class, and candidates are emitted in ascending order)
    d2_full = ((cent[:, :, None] - xyz[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(dist2[..., 0], d2_full.min(-1),
                               rtol=1e-4, atol=1e-4)


def test_ball_query_grouped_emission():
    rng = np.random.RandomState(4)
    N, S = 2048, 16
    xyz = rng.uniform(-10, 10, (2, N, 3)).astype(np.float32)
    cent = xyz[:, :S]

    specs = ((1.5, 8), (3.0, 16))
    rels = pallas_ballquery.ball_query_multi_grouped_pallas(
        jnp.asarray(xyz), jnp.asarray(cent), specs)
    assert len(rels) == 2
    for (radius, k), rel in zip(specs, rels):
        rel = np.asarray(rel)
        assert rel.shape == (2, S, k, 3)
        # emitted relative coordinates stay within the ball (padding repeats
        # in-radius hits; all-empty neighborhoods emit index-0's rel coords,
        # which cannot happen here since each centroid IS a point -> d2=0)
        np.testing.assert_array_less(
            (rel ** 2).sum(-1), radius ** 2 + 1e-4)


def test_banded_ball_query_contract_and_fps_consistency():
    """The z-banded fused FPS+group path (ops.grouping.fps_group_banded):
    centroid set/order bit-identical to furthest_point_sample('blockwise') +
    gather, emitted rels are true in-radius neighbors, and in-radius recall
    matches the full-scan grouped kernel on band-friendly data."""
    from pointrcnn_tpu.ops import sampling
    from pointrcnn_tpu.ops.grouping import (
        fps_group_banded,
        fps_group_banded_supported,
    )

    rng = np.random.RandomState(5)
    B, N, npoint = 2, 4096, 1024
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[..., 0] = rng.uniform(-20, 20, (B, N))
    xyz[..., 1] = rng.uniform(-1, 2, (B, N))
    xyz[..., 2] = rng.uniform(0, 60, (B, N))

    assert fps_group_banded_supported(N, npoint, (8, 16))
    specs = ((1.0, 8), (2.0, 16))
    new_xyz, rels = fps_group_banded(jnp.asarray(xyz), npoint, specs)
    new_xyz = np.asarray(new_xyz)

    idx = np.asarray(sampling.furthest_point_sample(
        jnp.asarray(xyz), npoint, method="blockwise"))
    want = np.take_along_axis(xyz, idx[..., None], axis=1)
    np.testing.assert_array_equal(new_xyz, want)

    for (radius, k), rel in zip(specs, rels):
        rel = np.asarray(rel)
        assert rel.shape == (B, npoint, k, 3)
        # every emitted offset is within the ball...
        np.testing.assert_array_less((rel ** 2).sum(-1), radius ** 2 + 1e-4)
        # ...and lands exactly on a real point of the cloud
        pts = new_xyz[:, :, None, :] + rel  # (B, npoint, k, 3)
        for b in range(B):
            flat = pts[b].reshape(-1, 3)[:: max(1, (npoint * k) // 64)]
            d = np.abs(flat[:, None, :] - xyz[b][None]).sum(-1).min(1)
            assert d.max() < 1e-4, d.max()

    # distinct in-radius neighbors captured: banded vs full-scan kernel
    from pointrcnn_tpu.ops.pallas_ballquery import (
        ball_query_multi_grouped_pallas,
    )

    full = ball_query_multi_grouped_pallas(jnp.asarray(xyz), jnp.asarray(new_xyz), specs)
    for (radius, k), rel_b, rel_f in zip(specs, rels, full):
        def distinct(rel):
            rel = np.asarray(rel)
            cnt = []
            for b in range(B):
                for s in range(0, npoint, npoint // 32):
                    r = rel[b, s]
                    r = r[(r ** 2).sum(-1) < radius ** 2 - 1e-6]
                    cnt.append(len(np.unique(np.round(r, 4), axis=0)))
            return np.array(cnt)
        db, df = distinct(rel_b), distinct(rel_f)
        # banded recall within 2% of the full scan on average
        assert db.mean() >= 0.98 * df.mean(), (db.mean(), df.mean())


def test_banded_guard_takes_fallback_on_thin_bands():
    """Structural guard for the banded ball query (PARITY deviation #6b):
    equal-count z-bands over a dense z-cluster become thinner than the ball
    radius, so the band +-1 search would drop true in-radius neighbors >= 2
    bands away.  fps_group_banded must detect this at runtime (interior band
    z-extent < r_max) and route to the full-scan kernel instead."""
    from pointrcnn_tpu.ops import grouping
    from pointrcnn_tpu.ops.grouping import (
        fps_group_banded,
        fps_group_banded_supported,
    )
    from pointrcnn_tpu.ops.pallas_ballquery import (
        ball_query_multi_grouped_banded,
        ball_query_multi_grouped_pallas,
    )
    from pointrcnn_tpu.ops.sampling import _blockwise_stripes

    rng = np.random.RandomState(6)
    B, N, npoint = 1, 4096, 1024
    s = _blockwise_stripes(N, npoint)
    assert s >= 4  # the guard is only load-bearing with interior bands

    # adversarial scene: the whole cloud lives in a 0.2 m z-slab (every
    # band's extent ~0.05 << r_max) but spreads in x/y, so true in-radius
    # neighborhoods span MANY z-bands
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[..., 0] = rng.uniform(-15, 15, (B, N))
    xyz[..., 1] = rng.uniform(-1, 1, (B, N))
    xyz[..., 2] = rng.uniform(0.0, 0.2, (B, N))

    specs = ((1.0, 8), (2.0, 16))
    assert fps_group_banded_supported(N, npoint, tuple(k for _, k in specs))

    new_xyz, rels = fps_group_banded(jnp.asarray(xyz), npoint, specs)
    new_xyz_j = jnp.asarray(np.asarray(new_xyz))

    # the fallback path the guard should have taken (same sorted table)
    perm = np.argsort(xyz[..., 2], axis=1)
    xs = np.take_along_axis(xyz, perm[..., None], axis=1)
    full = ball_query_multi_grouped_pallas(
        jnp.asarray(xs), new_xyz_j, specs, point0=jnp.asarray(xyz[:, 0:1]))
    banded = ball_query_multi_grouped_banded(
        jnp.asarray(xs), new_xyz_j, specs, s, point0=jnp.asarray(xyz[:, 0:1]))

    for rel_g, rel_f, rel_b in zip(rels, full, banded):
        rel_g, rel_f, rel_b = map(np.asarray, (rel_g, rel_f, rel_b))
        # the guard routed to the full scan...
        np.testing.assert_array_equal(rel_g, rel_f)
        # ...and it mattered: the raw banded search finds a different
        # (poorer) neighbor set on this scene
        assert not np.array_equal(rel_b, rel_f)

    # sanity: a z-spread scene keeps the banded fast path (bit-equal to the
    # raw banded kernel, NOT to the full scan)
    xyz2 = np.zeros((B, N, 3), np.float32)
    xyz2[..., 0] = rng.uniform(-15, 15, (B, N))
    xyz2[..., 1] = rng.uniform(-1, 1, (B, N))
    xyz2[..., 2] = rng.uniform(0, 60, (B, N))
    new2, rels2 = fps_group_banded(jnp.asarray(xyz2), npoint, specs)
    perm2 = np.argsort(xyz2[..., 2], axis=1)
    xs2 = np.take_along_axis(xyz2, perm2[..., None], axis=1)
    banded2 = ball_query_multi_grouped_banded(
        jnp.asarray(xs2), jnp.asarray(np.asarray(new2)), specs, s,
        point0=jnp.asarray(xyz2[:, 0:1]))
    for rel_g, rel_b in zip(rels2, banded2):
        np.testing.assert_array_equal(np.asarray(rel_g), np.asarray(rel_b))
