"""A/B the TPU-motivated approximations against their exact forms.

Round-1 shipped three AP-sensitive approximations as defaults:
  1. ball query: nearest-k ``approx_min_k`` (recall_target 0.95) instead of
     the CUDA first-nsample-in-order semantics (ops/grouping.py),
  2. roipool3d: approx first-K in point order (ops/roipool3d.py),
  3. proposal NMS: per-zone candidate cap 2048 instead of the 9000 pre-NMS
     budget (models/proposal.py).

This tool quantifies each one on KITTI-scale synthetic scenes, two ways:

* kernel-level: neighborhood in-radius recall (ball query), pooled point-set
  agreement (roipool), post-NMS survivor agreement under a redundancy stress
  (NMS cap) — weight-independent, directly measures what the approximation
  changes;
* pipeline-level: full two-stage forward with each approximation toggled,
  compared against the all-exact configuration (same parameters), reporting
  final-box match rate and per-variant latency on the current backend.

Results belong in docs/PARITY.md. Run on TPU: python tools/ab_approximations.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_scene(rng, n=16384, n_cars=12):
    """Clustered KITTI-like cloud: ground plane + dense car clusters."""
    pts = np.zeros((n, 3), np.float32)
    n_car_pts = 400 * n_cars
    n_bg = n - n_car_pts
    pts[:n_bg, 0] = rng.uniform(-30, 30, n_bg)
    pts[:n_bg, 1] = 1.6 + rng.normal(0, 0.05, n_bg)
    pts[:n_bg, 2] = rng.uniform(0, 70, n_bg)
    boxes = []
    for k in range(n_cars):
        cx, cz = rng.uniform(-25, 25), rng.uniform(8, 65)
        ry = rng.uniform(-np.pi, np.pi)
        boxes.append((cx, 1.6, cz, 1.5, 1.6, 3.9, ry))
        local = np.stack(
            [rng.uniform(-1.9, 1.9, 400), rng.uniform(-1.5, 0.0, 400),
             rng.uniform(-0.8, 0.8, 400)], 1)
        c, s = np.cos(ry), np.sin(ry)
        base = n_bg + k * 400
        pts[base:base + 400, 0] = cx + local[:, 0] * c + local[:, 2] * s
        pts[base:base + 400, 1] = 1.6 + local[:, 1]
        pts[base:base + 400, 2] = cz - local[:, 0] * s + local[:, 2] * c
    perm = rng.permutation(n)
    return pts[perm], np.array(boxes, np.float32)


def kernel_fps_coverage(batch_pts):
    """FPS exact vs blockwise, measured by what the network actually consumes:
    the centroid set's coverage of the scene.  A point's geometry reaches the
    backbone iff some SA1 centroid has it in ball-query range, so the
    meaningful FPS quality metric is per-radius coverage (fraction of points
    with >= 1 centroid within r), not centroid-set identity — different
    centroid sets with equal coverage are equally valid samplings (the
    blockwise picks are exact FPS picks inside contiguous equal-count
    z-bands that tile the scene).  Also
    reports the max point->nearest-centroid distance (worst coverage gap).
    """
    import jax.numpy as jnp

    from pointrcnn_tpu.ops.sampling import furthest_point_sample

    xyz = jnp.asarray(batch_pts)
    rows = []
    idx_e = np.asarray(furthest_point_sample(xyz, 4096, method="exact"))
    idx_b = np.asarray(furthest_point_sample(xyz, 4096, method="blockwise"))
    for radius in (0.1, 0.5, 1.0):
        cov = {}
        gap = {}
        for name, idx in (("exact", idx_e), ("blockwise", idx_b)):
            covered, worst = [], 0.0
            for b in range(batch_pts.shape[0]):
                cent = batch_pts[b][idx[b]]
                d = np.sqrt(
                    ((batch_pts[b][:, None, :] - cent[None]) ** 2).sum(-1)
                ).min(axis=1)
                covered.append((d <= radius).mean())
                worst = max(worst, float(d.max()))
            cov[name] = float(np.mean(covered))
            gap[name] = worst
        rows.append((radius, cov["exact"], cov["blockwise"],
                     gap["exact"], gap["blockwise"]))
    return rows


def kernel_ball_query(batch_pts):
    """In-radius recall of approx vs exact ball query, per SA-stage spec."""
    import jax.numpy as jnp

    from pointrcnn_tpu.ops.common import square_distance
    from pointrcnn_tpu.ops.grouping import ball_query
    from pointrcnn_tpu.ops.sampling import furthest_point_sample
    from pointrcnn_tpu.ops.common import gather_points
    import jax

    xyz = jnp.asarray(batch_pts)
    rows = []
    for npoint, radius, nsample in [
        (4096, 0.1, 16), (4096, 0.5, 32), (1024, 1.0, 32), (256, 2.0, 32),
    ]:
        sub = gather_points(xyz, furthest_point_sample(xyz, npoint))

        def stats(method):
            idx = ball_query(xyz, sub, radius, nsample, method=method)
            d = jnp.sqrt(jnp.maximum(square_distance(sub, xyz), 0.0))
            picked = jnp.take_along_axis(d, idx, axis=-1)  # (B, S, K)
            in_r = picked < radius
            avail = jnp.minimum(jnp.sum(d < radius, axis=-1), nsample)  # (B, S)
            got = jnp.sum(in_r, axis=-1)
            has = avail > 0
            # distinct in-radius hits actually captured / available
            recall = jnp.sum(jnp.where(has, jnp.minimum(got, avail), 0)) / jnp.maximum(
                jnp.sum(jnp.where(has, avail, 0)), 1)
            return float(jax.device_get(recall))

        rows.append((f"r={radius} k={nsample} S={npoint}",
                     stats("exact"), stats("approx")))
    return rows


def kernel_ball_query_banded(batch_pts):
    """In-radius recall of the z-banded fused FPS+group path (SA1) vs the
    full-scan grouped kernel on clustered scenes.  The banded query searches
    each centroid's equal-count depth band +-1 only; a neighbor is lost iff
    it lies >1 band away in z yet inside the radius — possible only when a
    band's z-extent is smaller than the radius (at SA1's r<=0.5 m each of
    the 16 equal-count bands spans meters of depth)."""
    import jax
    import jax.numpy as jnp

    from pointrcnn_tpu.ops import pallas_ballquery as pb
    from pointrcnn_tpu.ops.grouping import (
        fps_group_banded,
        fps_group_banded_supported,
    )

    n, npoint, specs = batch_pts.shape[1], 4096, ((0.1, 16), (0.5, 32))
    was_interpret = pb._INTERPRET
    if jax.default_backend() not in ("tpu", "axon"):
        # CPU run: interpret mode at a reduced shape
        pb._INTERPRET = True
        batch_pts = batch_pts[:2, ::4]
        n, npoint = n // 4, 1024
    try:
        assert fps_group_banded_supported(n, npoint, tuple(k for _, k in specs))
        xyz = jnp.asarray(batch_pts)
        new_xyz, rels_b = fps_group_banded(xyz, npoint, specs)
        rels_f = pb.ball_query_multi_grouped_pallas(xyz, new_xyz, specs)

        rows = []
        for (radius, k), rb, rf in zip(specs, rels_b, rels_f):
            def distinct(rel):
                rel = np.asarray(rel)
                m = (rel ** 2).sum(-1) < radius ** 2 - 1e-6
                tot = 0
                for b in range(rel.shape[0]):
                    for s in range(0, rel.shape[1],
                                   max(1, rel.shape[1] // 256)):
                        tot += len(np.unique(
                            np.round(rel[b, s][m[b, s]], 4), axis=0))
                return tot
            db, df = distinct(rb), distinct(rf)
            rows.append((f"r={radius} k={k}", db / max(df, 1)))
        return rows
    finally:
        pb._INTERPRET = was_interpret


def kernel_roipool(batch_pts, batch_boxes):
    import jax
    import jax.numpy as jnp

    from pointrcnn_tpu.ops.roipool3d import roipool3d

    xyz = jnp.asarray(batch_pts)
    feats = jnp.zeros((*batch_pts.shape[:2], 2), jnp.float32)
    rois = jnp.asarray(batch_boxes)
    out = {}
    for method in ("exact", "approx"):
        pooled, empty = roipool3d(xyz, feats, rois, 1.0, 512, method=method)
        out[method] = (np.asarray(jax.device_get(pooled[..., :3])),
                       np.asarray(jax.device_get(empty)))
    pe, pa = out["exact"][0], out["approx"][0]
    # compare pooled coordinate multisets per roi (order-insensitive)
    same_set = 0
    diff_frac = []
    n_rois = pe.shape[0] * pe.shape[1]
    for b in range(pe.shape[0]):
        for m in range(pe.shape[1]):
            se = {tuple(q) for q in pe[b, m].round(4).tolist()}
            sa = {tuple(q) for q in pa[b, m].round(4).tolist()}
            if se == sa:
                same_set += 1
            union = max(len(se | sa), 1)
            diff_frac.append(1.0 - len(se & sa) / union)
    return same_set / n_rois, float(np.mean(diff_frac)), bool(
        (out["exact"][1] == out["approx"][1]).all())


def _greedy_nms_numpy(boxes, scores, thresh, post_n, cap=None):
    """Exact sequential greedy rotated-BEV NMS (the reference iou3d.cpp
    bitmask-sweep semantics), host-side, on the top-``cap`` candidates."""
    from pointrcnn_tpu.utils.np_geometry import _boxes3d_to_bev_rects
    from pointrcnn_tpu.utils import native

    order = np.argsort(-scores)
    if cap is not None:
        order = order[:cap]
    boxes = boxes[order]
    rects = _boxes3d_to_bev_rects(boxes.astype(np.float32))
    areas = boxes[:, 4] * boxes[:, 5]
    alive = np.ones(len(order), bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        if len(keep) >= post_n:
            break
        rest = np.nonzero(alive[i + 1:])[0] + i + 1
        if rest.size == 0:
            continue
        ov = native.bev_overlap(rects[i:i + 1], rects[rest])[0]
        iou = ov / np.maximum(areas[i] + areas[rest] - ov, 1e-8)
        alive[rest[iou > thresh]] = False
    return keep


def kernel_nms_cap(rng):
    """Stress: heavily redundant clustered proposals (trained-RPN-like).
    The exact-uncapped greedy NMS is evaluated host-side — on the device the
    dense O(K^2) suppression matrix at K=9000 would need ~24 GB of HBM, which
    is precisely why the candidate cap exists."""
    n = 16384
    n_clusters = 25
    boxes = np.zeros((n, 7), np.float32)
    scores = np.zeros(n, np.float32)
    centers = np.stack([rng.uniform(-25, 25, n_clusters),
                        np.full(n_clusters, 1.6),
                        rng.uniform(5, 68, n_clusters)], 1)
    per = n // n_clusters
    for k in range(n_clusters):
        s = k * per
        e = s + per
        boxes[s:e, 0:3] = centers[k] + rng.normal(0, 0.4, (per, 3))
        boxes[s:e, 3:6] = [1.5, 1.6, 3.9] + rng.normal(0, 0.05, (per, 3))
        boxes[s:e, 6] = rng.normal(0, 0.3, per)
        scores[s:e] = rng.uniform(0.5, 1.0, per)  # dense high-score clusters
    rest = n_clusters * per
    boxes[rest:, 0:3] = np.stack([rng.uniform(-30, 30, n - rest),
                                  np.full(n - rest, 1.6),
                                  rng.uniform(0, 70, n - rest)], 1)
    boxes[rest:, 3:6] = [1.5, 1.6, 3.9]
    scores[rest:] = rng.uniform(0.0, 0.5, n - rest)

    res = {}
    for cap in (1024, 2048, 9000):
        keep = _greedy_nms_numpy(boxes, scores, thresh=0.8, post_n=100, cap=cap)
        res[cap] = set(keep)
    agree_1024 = len(res[1024] & res[9000]) / max(len(res[9000]), 1)
    agree_2048 = len(res[2048] & res[9000]) / max(len(res[9000]), 1)
    return agree_1024, agree_2048, len(res[9000])


def pipeline_ab(batch_pts):
    """Full two-stage forward under each toggle vs the all-exact config."""
    import jax
    import jax.numpy as jnp

    from pointrcnn_tpu.config import load_config, merge_from_list
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.utils.np_geometry import boxes_iou3d

    base = load_config(os.path.join(os.path.dirname(__file__), "..",
                                    "cfgs", "default.yaml"))

    def variant(**kv):
        pairs = []
        for k, v in kv.items():
            pairs += [k, str(v)]
        return merge_from_list(base, pairs) if pairs else base

    # NOTE on 'approx' ball-query variants: ops/grouping.ball_query upgrades
    # method='approx' to the exact first-K-in-order rank path for small
    # tables (N <= 1024 on TPU) because it is BOTH faster and CUDA-parity
    # there.  RCNN roi stages pool 512 points, so the RCNN.BALL_QUERY_METHOD
    # toggle below only changes the RPN stages (N = 16384..256); any
    # approx-vs-exact delta attributed to "ball query" is an RPN-stage
    # delta.  kernel_ball_query above measures against N = 16384 tables and
    # is unaffected.
    cfgs = {
        "all_exact": variant(**{"RPN.BALL_QUERY_METHOD": "exact",
                                "RCNN.BALL_QUERY_METHOD": "exact",
                                "RCNN.ROIPOOL_METHOD": "exact",
                                "RPN.NMS_MAX_CANDIDATES": 9000}),
        "default": variant(),
        "approx_bq_only": variant(**{"RCNN.ROIPOOL_METHOD": "exact",
                                     "RPN.NMS_MAX_CANDIDATES": 9000}),
        "approx_pool_only": variant(**{"RPN.BALL_QUERY_METHOD": "exact",
                                       "RCNN.BALL_QUERY_METHOD": "exact",
                                       "RPN.NMS_MAX_CANDIDATES": 9000,
                                       "RCNN.ROIPOOL_METHOD": "approx"}),
        "cap2048_only": variant(**{"RPN.BALL_QUERY_METHOD": "exact",
                                   "RCNN.BALL_QUERY_METHOD": "exact",
                                   "RCNN.ROIPOOL_METHOD": "exact",
                                   "RPN.NMS_MAX_CANDIDATES": 2048}),
        "fps_blockwise_only": variant(**{"RPN.BALL_QUERY_METHOD": "exact",
                                         "RCNN.BALL_QUERY_METHOD": "exact",
                                         "RCNN.ROIPOOL_METHOD": "exact",
                                         "RPN.NMS_MAX_CANDIDATES": 9000,
                                         "RPN.FPS_METHOD": "blockwise"}),
        "default_fps_blockwise": variant(**{"RPN.FPS_METHOD": "blockwise"}),
    }

    batch = {"pts_input": jnp.asarray(batch_pts)}
    model0 = PointRCNN(cfg=cfgs["all_exact"], mode="TEST")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = jax.jit(model0.init, static_argnames="train")(
        rngs, batch, train=False)

    from pointrcnn_tpu.utils.box_coder import decode_bbox_target

    def make_fwd(model, cfg):
        def fwd(v, b):
            out = model.apply(v, b, train=False)
            B = b["pts_input"].shape[0]
            rois = out["rois"]
            M = rois.shape[1]
            rcnn_reg = out["rcnn_reg"].reshape(B * M, -1)
            pred = decode_bbox_target(
                rois.reshape(-1, 7), rcnn_reg,
                anchor_size=jnp.asarray(cfg.CLS_MEAN_SIZE[0]),
                loc_scope=cfg.RCNN.LOC_SCOPE,
                loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
                num_head_bin=cfg.RCNN.NUM_HEAD_BIN,
                get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
                loc_y_scope=cfg.RCNN.LOC_Y_SCOPE,
                loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
                get_ry_fine=True,
            ).reshape(B, M, 7)
            valid = out["roi_valid"]
            return pred * valid[..., None], out["rcnn_cls"]
        return fwd

    results = {}
    for name, cfg in cfgs.items():
        model = PointRCNN(cfg=cfg, mode="TEST")
        fwd = jax.jit(make_fwd(model, cfg))
        pred, cls = fwd(variables, batch)
        jax.device_get(cls)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            pred, cls = fwd(variables, batch)
        jax.device_get(cls)
        dt = (time.perf_counter() - t0) / iters
        results[name] = {
            "boxes": np.asarray(jax.device_get(pred)),
            "ms_per_batch": dt * 1e3,
        }

    ref = results["all_exact"]
    rows = []
    for name, r in results.items():
        matched, total, center_d = 0, 0, []
        for b in range(ref["boxes"].shape[0]):
            A, Bb = ref["boxes"][b], r["boxes"][b]
            ok_a = np.abs(A).sum(1) > 0
            ok_b = np.abs(Bb).sum(1) > 0
            if ok_a.sum() == 0:
                continue
            iou = boxes_iou3d(A[ok_a], Bb[ok_b]) if ok_b.sum() else np.zeros((ok_a.sum(), 0))
            total += int(ok_a.sum())
            if iou.size:
                best = iou.max(axis=1)
                matched += int((best > 0.99).sum())
                center_d.append(
                    np.linalg.norm(
                        A[ok_a][:, 0:3][best > 0.5]
                        - Bb[ok_b][iou.argmax(axis=1)][best > 0.5][:, 0:3],
                        axis=1,
                    )
                )
        rows.append((name, matched / max(total, 1),
                     float(np.mean(np.concatenate(center_d))) if center_d else 0.0,
                     r["ms_per_batch"]))
    return rows


def main():
    rng = np.random.RandomState(0)
    scenes = [make_scene(np.random.RandomState(i)) for i in range(4)]
    batch_pts = np.stack([s[0] for s in scenes])
    import jax

    max_boxes = max(s[1].shape[0] for s in scenes)
    batch_boxes = np.zeros((len(scenes), max_boxes, 7), np.float32)
    for i, (_, b) in enumerate(scenes):
        batch_boxes[i, :b.shape[0]] = b

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    print("\n== FPS: centroid coverage of the scene (4096 of 16384) ==")
    for radius, ce, cb, ge, gb in kernel_fps_coverage(batch_pts):
        print(f"  r={radius:4.1f}  coverage exact {ce:.4f} vs blockwise {cb:.4f}"
              f"   worst gap {ge:.3f} vs {gb:.3f} m")

    print("\n== ball query: distinct in-radius hits captured (recall) ==")
    for spec, r_exact, r_approx in kernel_ball_query(batch_pts):
        print(f"  {spec:26s}  exact {r_exact:.4f}   approx {r_approx:.4f}")

    print("\n== z-banded ball query: in-radius recall vs full scan (SA1) ==")
    for spec, ratio in kernel_ball_query_banded(batch_pts):
        print(f"  {spec:26s}  banded/full distinct-hit ratio {ratio:.4f}")

    print("\n== roipool3d: pooled point-set agreement (512 pts/roi) ==")
    same, diff, empty_eq = kernel_roipool(batch_pts, batch_boxes)
    print(f"  identical pooled sets: {same*100:.1f}% of rois; "
          f"mean set difference {diff*100:.2f}%; empty flags equal: {empty_eq}")

    print("\n== NMS candidate cap: top-100 survivor agreement (exact greedy, redundancy stress) ==")
    a1024, a2048, nsurv = kernel_nms_cap(np.random.RandomState(7))
    print(f"  cap 2048 vs 9000: {a2048*100:.1f}% of {nsurv} survivors identical; "
          f"cap 1024 vs 9000: {a1024*100:.1f}%")

    print("\n== full pipeline vs all-exact (random weights, batch 4) ==")
    for name, match, cdist, ms in pipeline_ab(batch_pts):
        print(f"  {name:18s}  top-box match {match*100:5.1f}%   "
              f"matched-center delta {cdist*100:6.3f} cm   {ms:7.1f} ms/batch")


if __name__ == "__main__":
    main()
