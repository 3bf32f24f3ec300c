import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.sampling import furthest_point_sample
from pointrcnn_tpu.ops.grouping import ball_query, group_points, three_nn, three_interpolate
from pointrcnn_tpu.ops.iou3d import (
    aligned_iou_bev,
    boxes_iou3d,
    boxes_iou_bev,
    boxes_overlap_bev,
)
from pointrcnn_tpu.ops.nms import nms_bev
from pointrcnn_tpu.ops.roipool3d import roipool3d
from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev


# ---------------------------------------------------------------- oracles


def np_fps(xyz, npoint):
    """Sequential FPS oracle (CUDA furthest_point_sampling semantics)."""
    n = xyz.shape[0]
    idxs = np.zeros(npoint, np.int64)
    dists = np.full(n, np.inf)
    last = 0
    for i in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, axis=1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
        idxs[i] = last
    return idxs


def np_ball_query(xyz, new_xyz, radius, nsample):
    """CUDA ball_query oracle: first nsample in point order, pad=first hit."""
    S, N = new_xyz.shape[0], xyz.shape[0]
    out = np.zeros((S, nsample), np.int64)
    for s in range(S):
        cnt = 0
        for k in range(N):
            if np.sum((xyz[k] - new_xyz[s]) ** 2) < radius ** 2:
                if cnt == 0:
                    out[s, :] = k
                out[s, cnt] = k
                cnt += 1
                if cnt == nsample:
                    break
    return out


def clip_polygon(poly, a, b):
    """Clip convex polygon by half-plane left of segment a->b (SH step)."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        side_cur = np.cross(b - a, cur - a)
        side_nxt = np.cross(b - a, nxt - a)
        if side_cur >= 0:
            out.append(cur)
        if side_cur * side_nxt < 0:
            t = side_cur / (side_cur - side_nxt)
            out.append(cur + t * (nxt - cur))
    return out


def np_rot_overlap(box_a, box_b):
    """Independent Sutherland-Hodgman oracle for rotated rect intersection."""
    def corners(box):
        x1, y1, x2, y2, ang = box
        c = np.array([(x1 + x2) / 2, (y1 + y2) / 2])
        base = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float64)
        d = base - c
        rot = np.stack(
            [d[:, 0] * np.cos(ang) + d[:, 1] * np.sin(ang),
             -d[:, 0] * np.sin(ang) + d[:, 1] * np.cos(ang)], axis=1)
        return rot + c

    ca, cb = corners(box_a), corners(box_b)
    # ensure counter-clockwise order for the clipper
    def ccw(p):
        area = 0.0
        for i in range(len(p)):
            j = (i + 1) % len(p)
            area += p[i][0] * p[j][1] - p[j][0] * p[i][1]
        return p if area > 0 else p[::-1]

    poly = list(ccw(ca))
    cb = ccw(cb)
    for i in range(4):
        poly = clip_polygon(np.array(poly), cb[i], cb[(i + 1) % 4])
        if not poly:
            return 0.0
        poly = list(poly)
    area = 0.0
    for i in range(len(poly)):
        j = (i + 1) % len(poly)
        area += poly[i][0] * poly[j][1] - poly[j][0] * poly[i][1]
    return abs(area) / 2


def np_greedy_nms(iou, thresh):
    K = iou.shape[0]
    keep = []
    suppressed = np.zeros(K, bool)
    for i in range(K):
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = False if i in keep else suppressed[i]
    return keep


def random_bev(n, seed, spread=10.0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(-spread, spread, n)
    cy = rng.uniform(-spread, spread, n)
    l = rng.uniform(2, 5, n)
    w = rng.uniform(1, 2.5, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - l / 2, cy - w / 2, cx + l / 2, cy + w / 2, ry], axis=1).astype(np.float32)


# ---------------------------------------------------------------- tests


def test_fps_matches_oracle():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
    for b in range(2):
        want = np_fps(xyz[b].astype(np.float64), 32)
        np.testing.assert_array_equal(got[b], want)


def test_fps_spread():
    """Sampled points should cover the cloud better than the prefix."""
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 512, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64))[0]
    assert len(np.unique(idx)) == 64
    sampled = xyz[0][idx]
    d_fps = np.min(np.linalg.norm(xyz[0][:, None] - sampled[None], axis=-1), axis=1).max()
    d_prefix = np.min(np.linalg.norm(xyz[0][:, None] - xyz[0][:64][None], axis=-1), axis=1).max()
    assert d_fps < d_prefix


def test_fps_blockwise_semantics_and_quality():
    """Blockwise FPS == exact per-band FPS over equal-count z-bands (indices
    mapped back through the z-sort), and its coverage radius stays within
    1.5x of exact greedy FPS on uniform data."""
    rng = np.random.RandomState(2)
    N, npoint = 4096, 512
    xyz = rng.uniform(-40, 40, (2, N, 3)).astype(np.float32)

    from pointrcnn_tpu.ops.sampling import _blockwise_stripes

    s = _blockwise_stripes(N, npoint)
    assert s > 1
    got = np.asarray(
        furthest_point_sample(jnp.asarray(xyz), npoint, method="blockwise")
    )
    Ns, nps = N // s, npoint // s
    for b in range(2):
        perm = np.argsort(xyz[b, :, 2], kind="stable")
        xs = xyz[b][perm]
        for j in range(s):
            band_idx = got[b, j * nps : (j + 1) * nps]
            want_local = np_fps(xs[j * Ns : (j + 1) * Ns].astype(np.float64), nps)
            np.testing.assert_array_equal(band_idx, perm[want_local + j * Ns])
            # every pick lies inside its band's z-range
            zlo, zhi = xs[j * Ns, 2], xs[(j + 1) * Ns - 1, 2]
            assert ((xyz[b, band_idx, 2] >= zlo) & (xyz[b, band_idx, 2] <= zhi)).all()
        assert len(np.unique(got[b])) == npoint

    exact = np.asarray(furthest_point_sample(jnp.asarray(xyz), npoint))

    def cover(pts, idx):
        sel = pts[idx]
        d = np.linalg.norm(pts[:, None] - sel[None], axis=-1)
        return d.min(axis=1).max()

    for b in range(2):
        assert cover(xyz[b], got[b]) < 1.5 * cover(xyz[b], exact[b])


def test_fps_blockwise_small_n_falls_back_exact():
    rng = np.random.RandomState(3)
    xyz = rng.randn(2, 512, 3).astype(np.float32)  # < 2*1024: no striping
    a = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64, method="blockwise"))
    b = np.asarray(furthest_point_sample(jnp.asarray(xyz), 64, method="exact"))
    np.testing.assert_array_equal(a, b)


def test_ball_query_exact_matches_oracle():
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 256, 3).astype(np.float32) * 2
    new_xyz = xyz[:, ::16]  # 16 centroids
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.8, 8, method="exact"))
    want = np_ball_query(xyz[0].astype(np.float64), new_xyz[0].astype(np.float64), 0.8, 8)
    np.testing.assert_array_equal(got[0], want)


def test_ball_query_approx_invariants():
    rng = np.random.RandomState(12)
    xyz = rng.randn(1, 256, 3).astype(np.float32) * 2
    new_xyz = xyz[:, ::16]
    radius, nsample = 0.8, 8
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), radius, nsample))
    d2 = np.sum((new_xyz[0][:, None] - xyz[0][None]) ** 2, -1)
    hits = (d2 < radius ** 2).sum(1)
    for s in range(got.shape[1]):
        sel = got[0, s]
        sel_d2 = d2[s, sel]
        if hits[s] == 0:
            np.testing.assert_array_equal(sel, 0)
        else:
            # every selected point is in radius (pads repeat an in-radius hit)
            assert np.all(sel_d2 < radius ** 2 + 1e-5)
            # no unnecessary duplicates when enough hits exist
            if hits[s] >= nsample:
                assert len(np.unique(sel)) >= nsample * 0.75  # approx recall slack


def test_ball_query_empty_rows():
    xyz = jnp.ones((1, 32, 3))
    new_xyz = jnp.full((1, 4, 3), 100.0)
    idx = np.asarray(ball_query(xyz, new_xyz, 0.5, 8))
    np.testing.assert_array_equal(idx, 0)


def test_gather_mm_bwd_matches_xla_gather_vjp():
    """The transposed-matmul gather VJP (ops.common._gather_mm_bwd) must
    produce the same forward and the same feature gradients (to bf16
    rounding) as the XLA gather it replaces on the SA2 train path."""
    from pointrcnn_tpu.ops.common import _gather_mm_bwd

    rng = np.random.RandomState(4)
    B, N, C, S, K = 2, 256, 24, 64, 8
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))

    out = _gather_mm_bwd(pts, idx)
    want = jnp.take_along_axis(pts, idx.reshape(B, -1)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want).reshape(B, S, K, C))

    cot = rng.randn(B, S, K, C).astype(np.float32)
    g_mm = jax.grad(lambda p: (_gather_mm_bwd(p, idx) * cot).sum())(pts)
    g_ref = jax.grad(lambda p: (
        jnp.take_along_axis(p, idx.reshape(B, -1)[..., None], axis=1)
        .reshape(B, S, K, C) * cot).sum())(pts)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_group_points_relative_coords():
    rng = np.random.RandomState(3)
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 5).astype(np.float32)
    new_xyz = xyz[:, :4]
    idx = ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 1.5, 8)
    g = np.asarray(group_points(jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz), idx))
    assert g.shape == (2, 4, 8, 8)
    idx_np = np.asarray(idx)
    for b in range(2):
        for s in range(4):
            np.testing.assert_allclose(
                g[b, s, :, :3], xyz[b][idx_np[b, s]] - new_xyz[b, s], atol=1e-6
            )
            np.testing.assert_allclose(g[b, s, :, 3:], feats[b][idx_np[b, s]], atol=1e-6)


def test_three_nn_interpolate():
    rng = np.random.RandomState(4)
    known = rng.randn(1, 32, 3).astype(np.float32)
    unknown = rng.randn(1, 128, 3).astype(np.float32)
    feats = rng.randn(1, 32, 6).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d2 = np.sum((unknown[0][:, None] - known[0][None]) ** 2, axis=-1)
    want_idx = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_allclose(np.sort(np.asarray(dist)[0], 1), np.sort(np.sqrt(np.take_along_axis(d2, want_idx, 1)), 1), atol=1e-4)
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, dist))
    d = np.asarray(dist)[0]
    w = (1.0 / (d + 1e-8))
    w = w / w.sum(1, keepdims=True)
    want = np.einsum("nk,nkc->nc", w, feats[0][np.asarray(idx)[0]])
    np.testing.assert_allclose(out[0], want, atol=1e-4)


def test_rotated_overlap_identical_and_disjoint():
    a = np.array([[0, 0, 4, 2, 0.3]], np.float32)
    ov = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(ov, [[8.0]], rtol=1e-4)
    b = np.array([[100, 100, 104, 102, 1.0]], np.float32)
    ov2 = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov2, [[0.0]], atol=1e-6)


def test_rotated_overlap_45deg_square():
    """Unit square vs itself rotated 45 deg about the same center: octagon
    area = 2*(sqrt(2)-1)."""
    sq = np.array([[-0.5, -0.5, 0.5, 0.5, 0.0]], np.float32)
    rot = np.array([[-0.5, -0.5, 0.5, 0.5, np.pi / 4]], np.float32)
    ov = float(np.asarray(boxes_overlap_bev(jnp.asarray(sq), jnp.asarray(rot)))[0, 0])
    np.testing.assert_allclose(ov, 2 * (np.sqrt(2) - 1), rtol=1e-4)


def test_rotated_overlap_matches_sh_oracle():
    a = random_bev(24, seed=5)
    b = random_bev(24, seed=6)
    got = np.asarray(boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(24):
        for j in range(0, 24, 4):
            want = np_rot_overlap(a[i].astype(np.float64), b[j].astype(np.float64))
            np.testing.assert_allclose(got[i, j], want, atol=2e-3)


def test_aligned_iou():
    a = np.array([[0, 0, 2, 2, 0.5]], np.float32)
    b = np.array([[1, 1, 3, 3, -0.2]], np.float32)
    got = float(np.asarray(aligned_iou_bev(jnp.asarray(a), jnp.asarray(b)))[0, 0])
    np.testing.assert_allclose(got, 1.0 / 7.0, rtol=1e-5)


def test_iou3d_full_overlap_and_known_case():
    box = np.array([[5.0, 1.0, 10.0, 1.5, 1.6, 3.9, 0.7]], np.float32)
    iou = float(np.asarray(boxes_iou3d(jnp.asarray(box), jnp.asarray(box)))[0, 0])
    np.testing.assert_allclose(iou, 1.0, rtol=1e-4)
    # shifted vertically by half height: bev identical, height overlap halved
    box2 = box.copy()
    box2[0, 1] += 0.75
    iou2 = float(np.asarray(boxes_iou3d(jnp.asarray(box), jnp.asarray(box2)))[0, 0])
    np.testing.assert_allclose(iou2, 0.5 / 1.5, rtol=1e-3)


def test_nms_matches_oracle():
    n = 64
    boxes = random_bev(n, seed=7, spread=6.0)
    rng = np.random.RandomState(8)
    scores = rng.rand(n).astype(np.float32)
    idx, valid = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), thresh=0.3,
                         pre_max=n, post_max=n, rotated=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    got = idx[valid]
    # oracle on score-sorted boxes
    order = np.argsort(-scores)
    sb = boxes[order]
    iou = np.asarray(aligned_iou_bev(jnp.asarray(sb), jnp.asarray(sb)))
    keep_sorted = []
    suppressed = np.zeros(n, bool)
    for i in range(n):
        if suppressed[i]:
            continue
        keep_sorted.append(i)
        suppressed |= iou[i] > 0.3
        suppressed[i] = False
        suppressed[:i + 1] = suppressed[:i + 1] & False if False else suppressed[:i + 1]
    want = order[[i for i in keep_sorted]]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # scores of survivors should be in descending order
    assert np.all(np.diff(scores[got]) <= 1e-7)


def test_nms_rotated_and_post_cap():
    boxes = random_bev(32, seed=9, spread=3.0)
    scores = np.linspace(1, 0, 32).astype(np.float32)
    idx, valid = nms_bev(jnp.asarray(boxes), jnp.asarray(scores), thresh=0.1,
                         pre_max=32, post_max=4, rotated=True)
    assert np.asarray(valid).sum() <= 4
    assert np.asarray(idx).shape == (4,)
    # top scoring box always kept
    assert np.asarray(idx)[0] == 0


def test_roipool3d_semantics():
    rng = np.random.RandomState(10)
    B, N, C, M, K = 1, 200, 4, 3, 16
    xyz = rng.uniform(-5, 5, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[0, 0] = [0, 1, 0, 2, 2, 2, 0.0]     # some points
    boxes[0, 1] = [100, 1, 100, 2, 2, 2, 0.3]  # empty
    boxes[0, 2] = [0, 1, 0, 10, 10, 10, 0.5]   # many points
    pooled, empty = roipool3d(jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(boxes),
                              extra_width=0.0, num_sampled=K)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert pooled.shape == (B, M, K, 3 + C)
    np.testing.assert_array_equal(empty[0], [False, True, False])
    np.testing.assert_allclose(pooled[0, 1], 0.0)

    # oracle for box 0: first-K in-box points in order w/ cyclic duplication
    def in_box(p, b):
        cx, by, cz, h, w, l, ry = b
        cy = by - h / 2
        dx, dz = p[0] - cx, p[2] - cz
        if abs(dx) > 10 or abs(p[1] - cy) > h / 2 or abs(dz) > 10:
            return False
        xr = dx * np.cos(ry) - dz * np.sin(ry)
        zr = dx * np.sin(ry) + dz * np.cos(ry)
        return -l / 2 <= xr <= l / 2 and -w / 2 <= zr <= w / 2

    hits = [k for k in range(N) if in_box(xyz[0, k], boxes[0, 0])]
    assert 0 < len(hits) < K
    want_idx = [hits[k % len(hits)] if k >= len(hits) else hits[k] for k in range(K)]
    np.testing.assert_allclose(pooled[0, 0, :, :3], xyz[0][want_idx], atol=1e-6)
    np.testing.assert_allclose(pooled[0, 0, :, 3:], feats[0][want_idx], atol=1e-6)


def test_ball_query_multi_exact_matches_single():
    from pointrcnn_tpu.ops.grouping import ball_query_multi

    rng = np.random.RandomState(5)
    xyz = rng.uniform(-3, 3, (2, 256, 3)).astype(np.float32)
    new_xyz = xyz[:, :32]
    specs = ((0.5, 8), (1.0, 16))
    multi = ball_query_multi(
        jnp.asarray(xyz), jnp.asarray(new_xyz), specs, method="exact"
    )
    for (radius, nsample), got in zip(specs, multi):
        want = ball_query(
            jnp.asarray(xyz), jnp.asarray(new_xyz), radius, nsample, method="exact"
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roipool_method_exact_forced():
    from pointrcnn_tpu.ops.roipool3d import roipool3d

    rng = np.random.RandomState(6)
    xyz = rng.uniform(-5, 5, (1, 512, 3)).astype(np.float32)
    feats = rng.randn(1, 512, 2).astype(np.float32)
    boxes = np.array([[[0, 1, 0, 2, 3, 3, 0.3]]], np.float32)
    a, ea = roipool3d(jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(boxes), 0.0, 16, method="exact")
    b, eb = roipool3d(jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(boxes), 0.0, 16, method="auto")
    # on CPU auto == exact
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
