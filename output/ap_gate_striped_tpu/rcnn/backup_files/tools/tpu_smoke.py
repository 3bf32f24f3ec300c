"""On-TPU kernel validation: Pallas/approx paths vs exact XLA oracles.

The pytest suite pins itself to CPU (tests/conftest.py) so it can run
anywhere; this script exercises the TPU-only code paths — Pallas FPS, the
one-hot MXU gather, approx ball query / roipool selection — on the real chip
and cross-checks them against the exact formulations.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() in ("tpu", "axon"), (
        f"not on TPU (backend={jax.default_backend()})"
    )
    from __graft_entry__ import _synthetic_cloud
    from pointrcnn_tpu.ops.common import gather_points
    from pointrcnn_tpu.ops.grouping import ball_query
    from pointrcnn_tpu.ops.pallas_fps import furthest_point_sample_pallas
    from pointrcnn_tpu.ops.roipool3d import roipool3d
    from pointrcnn_tpu.ops.sampling import _fps_xla

    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
        if not ok:
            failures.append(name)

    # 1) Pallas FPS == XLA FPS
    for B, N, S in [(4, 16384, 4096), (400, 512, 128), (2, 4096, 1024)]:
        pts = jnp.asarray(
            np.random.RandomState(0).randn(B, N, 3).astype(np.float32) * 10
        )
        got = jax.device_get(furthest_point_sample_pallas(pts, S))
        ref = jax.device_get(jax.jit(lambda x: _fps_xla(x, S))(pts))
        check(f"pallas fps B{B} N{N}", (got == ref).all())

    # 2) one-hot gather == take_along_axis (exact path bit-exact)
    B, N, C, M = 8, 512, 67, 4096
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M)).astype(np.int32))
    got = jax.device_get(jax.jit(lambda t, i: gather_points(t, i, exact=True))(table, idx))
    ref = jax.device_get(jnp.take_along_axis(table, idx[..., None], axis=1))
    check("one-hot gather exact", np.array_equal(got, ref))
    got_a = jax.device_get(jax.jit(lambda t, i: gather_points(t, i, exact=False))(table, idx))
    check("one-hot gather bf16", np.max(np.abs(got_a - ref)) < 0.05,
          f"max err {np.max(np.abs(got_a - ref)):.4f}")

    # 3) approx ball query: in-radius invariants
    pts = jnp.asarray(_synthetic_cloud(2, 16384, seed=2))
    cent = pts[:, :512]
    idx = jax.device_get(jax.jit(lambda p, c: ball_query(p, c, 1.0, 16))(pts, cent))
    p_np, c_np = jax.device_get(pts), jax.device_get(cent)
    bad = 0
    for b in range(2):
        d2 = np.sum((c_np[b][:, None] - p_np[b][idx[b]]) ** 2, -1)
        hits = (np.sum((c_np[b][:, None] - p_np[b][None]) ** 2, -1) < 1.0).sum(1)
        bad += int((((d2 > 1.0 + 1e-4).any(1)) & (hits > 0)).sum())
    check("approx ball query in-radius", bad == 0, f"{bad} bad rows")

    # 3a) fused Pallas ball query: distance consistency + recall vs exact kNN
    from pointrcnn_tpu.ops.pallas_ballquery import (
        ball_query_pallas,
        ball_query_pallas_supported,
    )

    assert ball_query_pallas_supported(16384, 4096, 32)
    d2_p, i_p2 = jax.device_get(
        jax.jit(lambda p, c: ball_query_pallas(p, c, 32))(pts, pts[:, :4096])
    )
    p_np = jax.device_get(pts)
    err, rec, cnt = 0.0, 0.0, 0
    for b in range(2):
        for s in np.random.RandomState(3).choice(4096, 32, replace=False):
            dd = ((p_np[b, s][None] - p_np[b]) ** 2).sum(-1)
            err = max(err, float(np.abs(dd[i_p2[b, s]] - d2_p[b, s]).max()))
            rec += len(set(i_p2[b, s]) & set(np.argsort(dd)[:32])) / 32
            cnt += 1
    check("pallas ball query dists", err < 1e-5, f"max err {err:.1e}")
    check("pallas ball query recall", rec / cnt > 0.9, f"recall {rec/cnt:.3f}")

    # 3b) Pallas 3-NN vs exact iterative extraction
    from pointrcnn_tpu.ops.pallas_knn import three_nn_pallas

    known = pts[:, :4096]
    d_p, i_p = jax.device_get(three_nn_pallas(pts, known))
    d2 = np.sum(
        (jax.device_get(pts)[:, :, None] - jax.device_get(known)[:, None]) ** 2, -1
    )
    want_d = np.sqrt(np.sort(d2, axis=2)[:, :, :3])
    check("pallas 3nn dists", np.abs(np.sort(d_p, 2) - want_d).max() < 1e-2,
          f"max err {np.abs(np.sort(d_p, 2) - want_d).max():.4f}")

    # 4) roipool approx selection: pooled points inside enlarged boxes
    feats = jnp.asarray(rng.randn(2, 16384, 4).astype(np.float32))
    rois = jnp.zeros((2, 8, 7), jnp.float32).at[..., 3:6].set(4.0).at[..., 2].set(30.0)
    pooled, empty = jax.jit(
        lambda p, f, r: roipool3d(p, f, r, 1.0, 64)
    )(pts, feats, rois)
    pooled, empty = jax.device_get(pooled), jax.device_get(empty)
    ok = True
    for b in range(2):
        for m in range(8):
            if empty[b, m]:
                continue
            q = pooled[b, m, :, :3]
            ok &= bool(
                (np.abs(q[:, 0] - 0.0) <= 3.0 + 1e-3).all()
                and (np.abs(q[:, 2] - 30.0) <= 3.0 + 1e-3).all()
            )
    check("roipool in-box", ok)

    # 6) fused gather+MLP+max kernel == XLA formulation
    from pointrcnn_tpu.ops.pallas_mlp import fused_group_mlp_max, fused_mlp_max
    from pointrcnn_tpu.ops.grouping import group_points

    rng = np.random.RandomState(5)
    B, N, C, S, K = 16, 512, 128, 128, 64
    xyzg = jnp.asarray(rng.uniform(-30, 30, (B, N, 3)).astype(np.float32))
    featg = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    new_xyzg = xyzg[:, :S]
    idxg = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))
    ws, bs2, cin = [], [], C + 3
    for f in (128, 128, 128):
        ws.append(jnp.asarray(rng.randn(cin, f).astype(np.float32) * 0.05))
        bs2.append(jnp.asarray(rng.randn(f).astype(np.float32) * 0.1))
        cin = f
    ref = jax.device_get(jax.jit(lambda x, fe, nx, i: fused_mlp_max(
        group_points(x, fe, nx, i, True, jnp.bfloat16), ws, bs2))(
        xyzg, featg, new_xyzg, idxg))
    got = jax.device_get(jax.jit(lambda x, fe, nx, i: fused_group_mlp_max(
        x, fe, nx, i, ws, bs2, True))(xyzg, featg, new_xyzg, idxg))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    check("fused group+mlp+max", err < 2e-2, f"rel {err:.1e}")

    # 7) the fused kernel is differentiable (custom VJP recomputes through
    # the XLA formulation) — this is load-bearing for rcnn-stage training,
    # where the FIXED RPN runs the fused eval path inside the loss gradient
    def loss_fused(fe):
        return jnp.sum(jnp.sin(fused_group_mlp_max(
            xyzg, fe, new_xyzg, idxg, ws, bs2, True)))

    def loss_ref(fe):
        return jnp.sum(jnp.sin(fused_mlp_max(
            group_points(xyzg, fe, new_xyzg, idxg, True, jnp.bfloat16), ws, bs2)))

    gf = jax.device_get(jax.jit(jax.grad(loss_fused))(featg))
    gr = jax.device_get(jax.jit(jax.grad(loss_ref))(featg))
    gerr = np.abs(gf - gr).max() / (np.abs(gr).max() + 1e-9)
    check("fused kernel grad (custom VJP)", gerr < 5e-2, f"rel {gerr:.1e}")

    # 8) folded-geometry mode (the RCNN SA default): canonical-frame
    # coordinates, fwd vs the hilo kernel and grads vs the XLA formulation
    xyzc = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)).astype(np.float32))
    new_xyzc = xyzc[:, :S]
    ref_f = jax.device_get(jax.jit(lambda x, fe, nx, i: fused_group_mlp_max(
        x, fe, nx, i, ws, bs2, True))(xyzc, featg, new_xyzc, idxg))
    got_f = jax.device_get(jax.jit(lambda x, fe, nx, i: fused_group_mlp_max(
        x, fe, nx, i, ws, bs2, True, fold_geometry=True))(
        xyzc, featg, new_xyzc, idxg))
    err_f = np.abs(got_f - ref_f).max() / (np.abs(ref_f).max() + 1e-9)
    check("fused fold fwd vs hilo", err_f < 3e-2, f"rel {err_f:.1e}")

    def loss_fold(x, fe):
        return jnp.sum(jnp.sin(fused_group_mlp_max(
            x, fe, new_xyzc, idxg, ws, bs2, True, fold_geometry=True)))

    def loss_ref_c(x, fe):
        return jnp.sum(jnp.sin(fused_mlp_max(
            group_points(x, fe, new_xyzc, idxg, True, jnp.bfloat16), ws, bs2)))

    gxf, gff = jax.device_get(jax.jit(jax.grad(loss_fold, (0, 1)))(xyzc, featg))
    gxr, gfr = jax.device_get(jax.jit(jax.grad(loss_ref_c, (0, 1)))(xyzc, featg))
    gerr_f = max(
        np.abs(gff - gfr).max() / (np.abs(gfr).max() + 1e-9),
        np.abs(gxf - gxr).max() / (np.abs(gxr).max() + 1e-9),
    )
    check("fused fold grad (Pallas bwd)", gerr_f < 8e-2, f"rel {gerr_f:.1e}")

    # 8b) hi/lo split survives XLA's excess-precision pass: the naive
    # convert-round-trip form got folded to lo == 0 on chip (round 5),
    # silently costing half a bf16 ulp (~6 cm at 30 m) in every hi/lo
    # kernel's relative coordinates
    from pointrcnn_tpu.ops.common import split_hilo

    xs_hl = jnp.asarray(
        np.random.RandomState(8).uniform(-70, 70, (4096,)).astype(np.float32))
    hi_hl, lo_hl = jax.jit(split_hilo)(xs_hl)
    rec = jax.device_get(hi_hl.astype(jnp.float32) + lo_hl.astype(jnp.float32))
    xs_np = jax.device_get(xs_hl)
    hl_err = np.abs(rec - xs_np) / np.maximum(np.abs(xs_np), 1e-6)
    check("split_hilo on chip", float(np.median(np.abs(jax.device_get(lo_hl)))) > 0
          and hl_err.max() < 2.0 ** -14, f"rel {hl_err.max():.1e}")

    # 9) the BN-train neighborhood gather kernel (ops.pallas_gather) —
    # the default TPU path for RPN SA2-SA4 grouping under training.  fwd vs
    # take_along_axis and VJP vs the XLA scatter gradient, at the SA2 train
    # shape class.
    from pointrcnn_tpu.ops.pallas_gather import (
        group_points_pallas, group_points_pallas_supported)

    rng = np.random.RandomState(9)
    B, N, C, S, K = 4, 4096, 96, 1024, 32
    xg = jnp.asarray(rng.uniform(-30, 30, (B, N, 3)).astype(np.float32))
    fg = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    nxg = xg[:, :S]
    ig = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))
    assert group_points_pallas_supported(fg, ig)

    def xla_group(x, f, nx):
        gx = jnp.take_along_axis(x[:, None].repeat(S, axis=1), ig[..., None], axis=2)
        gf = jnp.take_along_axis(f[:, None].repeat(S, axis=1), ig[..., None], axis=2)
        return jnp.concatenate([(gx - nx[:, :, None, :]).astype(jnp.bfloat16),
                                gf.astype(jnp.bfloat16)], axis=-1)

    got9 = jax.device_get(jax.jit(lambda x, f, nx: group_points_pallas(
        x, f, nx, ig))(xg, fg, nxg)).astype(np.float32)
    ref9 = jax.device_get(jax.jit(xla_group)(xg, fg, nxg)).astype(np.float32)
    feat_ok = np.array_equal(got9[..., 3:], ref9[..., 3:])
    rel_err9 = np.abs(got9[..., :3] - ref9[..., :3])
    # one bf16 ulp of the larger magnitude (the two casts may straddle a
    # power-of-two boundary: ref just under 2^k, got one ulp above)
    mag9 = np.maximum(np.abs(ref9[..., :3]), np.abs(got9[..., :3]))
    rel_ok = (rel_err9 <= np.maximum(mag9 * 2.0 ** -7, 30 * 2.0 ** -15)).all()
    check("pallas_gather fwd", feat_ok and rel_ok,
          f"rel_max {rel_err9.max():.2e}")

    ct9 = jnp.asarray(rng.randn(B, S, K, 3 + C).astype(np.float32)).astype(
        jnp.bfloat16).astype(jnp.float32)
    gp9 = jax.device_get(jax.jit(jax.grad(
        lambda x, f, nx: jnp.sum(group_points_pallas(
            x, f, nx, ig).astype(jnp.float32) * ct9), (0, 1, 2)))(xg, fg, nxg))
    gr9 = jax.device_get(jax.jit(jax.grad(
        lambda x, f, nx: jnp.sum(xla_group(
            x, f, nx).astype(jnp.float32) * ct9), (0, 1, 2)))(xg, fg, nxg))
    gerr9 = max(np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
                for a, b in zip(gp9, gr9))
    check("pallas_gather VJP", gerr9 < 1e-4, f"rel {gerr9:.1e}")

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
