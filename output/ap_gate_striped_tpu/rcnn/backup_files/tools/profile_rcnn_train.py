"""Stage-by-stage timing of the rcnn-mode TRAIN step (fixed RPN + online
target sampling + RCNN fwd/bwd) on the current backend.

Each sub-graph is its own jit; enqueue-many/sync-once with device_get as the
barrier (the only reliable sync through this relay).  Results feed the
round-3 RCNN-train optimization (docs/ROUND_NOTES.md).

Usage: python tools/profile_rcnn_train.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

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
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.models.rcnn import RCNNNet, rcnn_input_channels
    from pointrcnn_tpu.models.proposal import proposal_layer
    from pointrcnn_tpu.models.target import proposal_target_layer
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state, make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    cfg = _flagship_cfg().thaw()
    cfg.RPN.FIXED = True
    cfg.RCNN.ENABLED = True
    cfg = cfg.freeze()

    N = cfg.RPN.NUM_POINTS
    G = cfg.RCNN.MAX_GT_BOXES
    rng = np.random.RandomState(0)
    gt = np.zeros((B, G, 7), np.float32)
    gt[:, 0] = [0.0, 1.0, 20.0, 1.5, 1.6, 3.9, 0.3]
    gt[:, 1] = [-8.0, 1.0, 30.0, 1.5, 1.6, 3.9, -0.5]
    gt_valid = np.zeros((B, G), bool)
    gt_valid[:, :2] = True
    batch = {
        "pts_input": jnp.asarray(_synthetic_cloud(B, N)),
        "gt_boxes3d": jnp.asarray(gt),
        "gt_valid": jnp.asarray(gt_valid),
    }

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=100, steps_per_epoch=10)
    state = create_train_state(model, cfg, batch, tx)
    step = make_train_step(model, cfg, tx, donate=False)

    t_full = bench(step, state, batch, jax.random.PRNGKey(0), 0.1,
                   sync=lambda o: o[1]["loss"])
    print(f"FULL rcnn train step:        {t_full:7.2f} ms/batch-{B} "
          f"({B / t_full * 1e3:.1f} fps)")

    # forward-only loss (no grad, no optimizer)
    from pointrcnn_tpu.train.loss import model_loss

    def fwd_loss(params, bstats, batch, rng):
        out = model.apply({"params": params, "batch_stats": bstats}, batch,
                          train=True, bn_momentum=0.1,
                          rngs={"dropout": rng, "target": rng})
        loss, _ = model_loss(cfg, out, batch)
        return loss

    jfwd = jax.jit(fwd_loss)
    t_fwd = bench(jfwd, state.params, state.batch_stats, batch,
                  jax.random.PRNGKey(0))
    print(f"  fwd-only (loss):           {t_fwd:7.2f} ms")

    # fixed-RPN eval forward alone
    rpn_model = PointRCNN(cfg=cfg, mode="TRAIN")

    def rpn_only(params, bstats, pts):
        out = rpn_model.rpn_forward_only(params, bstats, pts) \
            if hasattr(rpn_model, "rpn_forward_only") else None
        return out

    from pointrcnn_tpu.models.rpn import RPN

    rpn = RPN(cfg=cfg)
    rpn_vars = {"params": state.params["rpn"],
                "batch_stats": state.batch_stats.get("rpn", {})}
    jrpn = jax.jit(lambda v, p: rpn.apply(v, p, False))
    t_rpn = bench(jrpn, rpn_vars, batch["pts_input"],
                  sync=lambda o: o["rpn_cls"])
    print(f"  RPN eval fwd:              {t_rpn:7.2f} ms")

    rpn_out = jax.device_get(jrpn(rpn_vars, batch["pts_input"]))
    rpn_out = {k: jnp.asarray(v) for k, v in rpn_out.items()}

    # proposal layer, TRAIN budgets
    jprop = jax.jit(lambda cls, reg, xyz: proposal_layer(
        cfg, "TRAIN", cls[..., 0], reg, xyz))
    t_prop = bench(jprop, rpn_out["rpn_cls"], rpn_out["rpn_reg"],
                   rpn_out["backbone_xyz"], sync=lambda o: o[0])
    print(f"  proposal layer (TRAIN):    {t_prop:7.2f} ms")

    rois, _, roi_valid = jax.device_get(
        jprop(rpn_out["rpn_cls"], rpn_out["rpn_reg"], rpn_out["backbone_xyz"]))
    rois, roi_valid = jnp.asarray(rois), jnp.asarray(roi_valid)

    # target layer alone (sampling + jitter + roipool + per-roi aug)
    seg_mask = (jax.nn.sigmoid(rpn_out["rpn_cls"][..., 0]) > 0.3).astype(jnp.float32)
    depth = jnp.linalg.norm(rpn_out["backbone_xyz"], axis=2)

    def tgt(key, rois, roi_valid, feats):
        return proposal_target_layer(
            cfg, key, rois, roi_valid, batch["gt_boxes3d"], batch["gt_valid"],
            rpn_out["backbone_xyz"], feats, seg_mask, depth)

    jtgt = jax.jit(tgt)
    t_tgt = bench(jtgt, jax.random.PRNGKey(1), rois, roi_valid,
                  rpn_out["backbone_features"], sync=lambda o: o["sampled_pts"])
    print(f"  target layer:              {t_tgt:7.2f} ms")

    target = jtgt(jax.random.PRNGKey(1), rois, roi_valid,
                  rpn_out["backbone_features"])
    pts_input = jnp.concatenate(
        [target["sampled_pts"], target["pts_feature"]], axis=2)
    pts_input = jax.device_get(pts_input)
    pts_input = jnp.asarray(pts_input)
    print(f"  (rcnn input {tuple(pts_input.shape)})")

    # RCNN net fwd / fwd+bwd alone
    rcnn = RCNNNet(cfg=cfg, num_classes=2)
    rcnn_vars = {"params": state.params["rcnn_net"]}
    if "rcnn_net" in (state.batch_stats or {}):
        rcnn_vars["batch_stats"] = state.batch_stats["rcnn_net"]

    jr_fwd = jax.jit(lambda v, x: rcnn.apply(
        v, x, True, 0.1, rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"] if "batch_stats" in rcnn_vars else []))
    t_rfwd = bench(jr_fwd, rcnn_vars, pts_input, sync=lambda o: o[0]["rcnn_cls"])
    print(f"  RCNN net fwd (train):      {t_rfwd:7.2f} ms")

    def rcnn_loss(params, x):
        v = dict(rcnn_vars)
        v["params"] = params
        out = rcnn.apply(v, x, True, 0.1,
                         rngs={"dropout": jax.random.PRNGKey(3)},
                         mutable=["batch_stats"] if "batch_stats" in rcnn_vars else [])
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out["rcnn_cls"]) + jnp.sum(out["rcnn_reg"])

    jr_bwd = jax.jit(jax.grad(rcnn_loss))
    t_rbwd = bench(jr_bwd, rcnn_vars["params"], pts_input,
                   sync=lambda o: jax.tree_util.tree_leaves(o)[0])
    print(f"  RCNN net fwd+bwd:          {t_rbwd:7.2f} ms")

    # RCNN eval-path forward for comparison (fused kernels)
    jr_eval = jax.jit(lambda v, x: rcnn.apply(v, x, False))
    t_reval = bench(jr_eval, rcnn_vars, pts_input, sync=lambda o: o["rcnn_cls"])
    print(f"  RCNN net fwd (eval/fused): {t_reval:7.2f} ms")

    acc = t_rpn + t_prop + t_tgt + t_rbwd
    print(f"  [sum rpn+prop+tgt+rcnnbwd: {acc:7.2f} ms vs full {t_full:.2f}]")


if __name__ == "__main__":
    main()
