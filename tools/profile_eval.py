"""Stage-by-stage timing of the two-stage eval forward on the current backend.

Times each sub-graph as its own jit (enqueue-many/sync-once, device_get as
the only reliable barrier on this platform) so the per-stage costs add up to
roughly the full-forward time. Used to target kernel work; results recorded
in docs/ROUND_NOTES.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("POINTRCNN_PROFILE_BATCH", "4"))
ITERS = 20


def bench(fn, *args, sync=lambda o: o):
    import jax

    out = fn(*args)
    jax.device_get(sync(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(sync(out))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.models.rpn import RPN
    from pointrcnn_tpu.models.proposal import proposal_layer
    from pointrcnn_tpu.ops.roipool3d import roipool3d
    from pointrcnn_tpu.ops.sampling import furthest_point_sample
    from pointrcnn_tpu.ops.grouping import ball_query_multi
    from pointrcnn_tpu.ops.common import gather_points

    if len(sys.argv) > 1:
        from pointrcnn_tpu.config import load_config

        cfg = load_config(sys.argv[1])
    else:
        cfg = _flagship_cfg()
    model = PointRCNN(cfg=cfg, mode="TEST")
    pts = jnp.asarray(_synthetic_cloud(BATCH, cfg.RPN.NUM_POINTS))
    batch = {"pts_input": pts}
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "target": jax.random.PRNGKey(2)}
    variables = jax.jit(model.init, static_argnames="train")(rngs, batch, train=False)

    full = jax.jit(lambda v, b: model.apply(v, b, train=False))
    t_full = bench(full, variables, batch, sync=lambda o: o["rcnn_cls"])
    print(f"full two-stage forward: {t_full:7.2f} ms/batch-{BATCH}  "
          f"({BATCH / t_full * 1e3:.1f} fps)")

    # RPN (backbone + heads)
    rpn = PointRCNN(cfg=cfg, mode="TEST")

    def rpn_only(v, b):
        out = rpn.apply(v, b, train=False, method=lambda m, bb, train: m.rpn(
            bb["pts_input"], train, 0.1))
        return out

    try:
        t_rpn = bench(jax.jit(rpn_only), variables, batch,
                      sync=lambda o: o["rpn_cls"])
        print(f"  RPN backbone+heads:   {t_rpn:7.2f} ms")
    except Exception as e:
        print("  RPN-only timing failed:", type(e).__name__, str(e)[:120])
        t_rpn = None

    # kernels at stage-1 scale
    n = cfg.RPN.NUM_POINTS
    np1 = cfg.RPN.SA_CONFIG.NPOINTS[0]
    t_fps = bench(jax.jit(lambda x: jnp.sum(furthest_point_sample(
        x, np1, method=cfg.RPN.FPS_METHOD))), pts, sync=lambda o: o)
    print(f"  FPS {n}->{np1} [{cfg.RPN.FPS_METHOD}]: {t_fps:7.2f} ms")

    sub = gather_points(pts, furthest_point_sample(pts, np1))
    specs = tuple(zip(cfg.RPN.SA_CONFIG.RADIUS[0], cfg.RPN.SA_CONFIG.NSAMPLE[0]))
    t_bq = bench(jax.jit(lambda x, s: sum(
        jnp.sum(o) for o in ball_query_multi(x, s, specs))),
        pts, sub, sync=lambda o: o)
    print(f"  ball query stage-1:   {t_bq:7.2f} ms  (specs {specs})")

    # roipool at eval scale
    feats = jnp.zeros((BATCH, n, 130), jnp.bfloat16)
    rois = jnp.zeros((BATCH, 100, 7), jnp.float32).at[..., 3:6].set(
        jnp.asarray([1.5, 1.6, 3.9]))
    t_pool = bench(jax.jit(lambda x, f, r: jnp.sum(
        roipool3d(x, f, r, 1.0, 512)[0].astype(jnp.float32))),
                   pts, feats, rois, sync=lambda o: o)
    print(f"  roipool 100x512:      {t_pool:7.2f} ms")

    # proposal layer (decode + distance-zone NMS) at eval scale
    rng2 = np.random.RandomState(7)
    scores = jnp.asarray(rng2.randn(BATCH, n).astype(np.float32))
    regs = jnp.asarray(rng2.randn(BATCH, n, 76).astype(np.float32) * 0.1)
    t_prop = bench(
        jax.jit(lambda s, r, x: proposal_layer(cfg, "TEST", s, r, x)[0]),
        scores, regs, pts, sync=lambda o: o[:1, :1, :1])
    print(f"  proposal layer+NMS:   {t_prop:7.2f} ms")

    # RCNN net from pooled canonical points (eval branch shapes)
    from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels

    rcnn = RCNNNet(cfg=cfg, num_classes=2)
    cin = rcnn_input_channels(cfg)
    pooled = jnp.asarray(
        rng2.randn(BATCH * 100, cfg.RCNN.NUM_POINTS, cin).astype(np.float32))
    v_rcnn = jax.jit(rcnn.init, static_argnames="train")(
        jax.random.PRNGKey(0), pooled, train=False)
    t_rcnn = bench(
        jax.jit(lambda v, p: rcnn.apply(v, p, train=False)["rcnn_cls"]),
        v_rcnn, pooled, sync=lambda o: o[:1])
    print(f"  RCNN net (400 rois):  {t_rcnn:7.2f} ms")


if __name__ == "__main__":
    main()
