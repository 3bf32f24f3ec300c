"""Ablation decomposition of the SHIPPING RPN train step (batch 16).

profile_rpn_bwd.py times stages with the module defaults (exact FPS, which
is NOT the shipping path); this tool builds the exact train step bench_train
runs (blockwise z-banded FPS + banded SA1 ball query + bf16 MLPs) and peels
it layer by layer:

  full step  ->  grad only (no optimizer)  ->  loss fwd  ->  backbone fwd
  plus shipping-mode SA1/SA2 in isolation (fwd and fwd+param-bwd).

Usage: python tools/profile_train_ablate.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = 10


def bench(fn, *args):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.config import merge_from_list
    from pointrcnn_tpu.models.point_rcnn import PointRCNN
    from pointrcnn_tpu.train.loss import model_loss
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state, make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])
    n = cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(0)
    batch = {
        "pts_input": jnp.asarray(_synthetic_cloud(B, n)),
        "rpn_cls_label": jnp.asarray(
            rng.choice([-1, 0, 1], size=(B, n), p=[0.05, 0.85, 0.1]).astype(np.int32)
        ),
        "rpn_reg_label": jnp.asarray(rng.randn(B, n, 7).astype(np.float32)),
    }

    model = PointRCNN(cfg=cfg, mode="TRAIN")
    tx = build_optimizer(cfg, total_steps=1000, steps_per_epoch=100)
    state = create_train_state(model, cfg, batch, tx)
    key = jax.random.PRNGKey(0)
    mom = jnp.float32(0.1)

    step = make_train_step(model, cfg, tx, donate=False)
    t_full = bench(step, state, batch, key, mom)
    print(f"  full train step:        {t_full:7.2f} ms")

    def loss_fn(params, stats):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            batch, train=True, bn_momentum=mom,
            rngs={"dropout": key, "target": key}, mutable=["batch_stats"],
        )
        loss, _ = model_loss(cfg, out, batch)
        return loss, mutated["batch_stats"]

    g = jax.jit(lambda p, s: jax.grad(loss_fn, has_aux=True)(p, s)[0])
    t_grad = bench(g, state.params, state.batch_stats)
    print(f"  grad only (no opt):     {t_grad:7.2f} ms   (optimizer+update = {t_full - t_grad:.2f})")

    f = jax.jit(lambda p, s: loss_fn(p, s)[0])
    t_fwd = bench(f, state.params, state.batch_stats)
    print(f"  loss fwd only:          {t_fwd:7.2f} ms   (bwd = {t_grad - t_fwd:.2f})")

    # backbone fwd alone (train mode)
    def bb_fwd(p, s):
        out, _ = model.apply(
            {"params": p, "batch_stats": s}, batch, train=True,
            bn_momentum=mom, rngs={"dropout": key, "target": key},
            mutable=["batch_stats"],
        )
        return out["rpn_cls"].astype(jnp.float32).sum()

    t_bb = bench(jax.jit(bb_fwd), state.params, state.batch_stats)
    print(f"  model fwd (no loss):    {t_bb:7.2f} ms   (loss terms = {t_fwd - t_bb:.2f})")

    # ---- shipping-mode SA1 in isolation --------------------------------
    from pointrcnn_tpu.models.pointnet2 import SetAbstractionMSG

    sa_cfg = cfg.RPN.SA_CONFIG
    xyz = jnp.asarray(_synthetic_cloud(B, n))
    sa1 = SetAbstractionMSG(
        npoint=sa_cfg.NPOINTS[0], radii=tuple(sa_cfg.RADIUS[0]),
        nsamples=tuple(sa_cfg.NSAMPLE[0]),
        mlps=tuple(tuple(m) for m in sa_cfg.MLPS[0]),
        bn=cfg.RPN.USE_BN, dtype=jnp.bfloat16,
        query_method=cfg.RPN.BALL_QUERY_METHOD,
        fps_method=cfg.RPN.FPS_METHOD,
    )
    v1 = sa1.init(jax.random.PRNGKey(1), xyz, None, True, 0.1)
    fwd1 = jax.jit(lambda v, x: sa1.apply(
        v, x, None, True, 0.1, mutable=["batch_stats"])[0][1]
        .astype(jnp.float32).sum())
    print(f"  SA1 fwd  [{cfg.RPN.FPS_METHOD}]: {bench(fwd1, v1, xyz):7.2f} ms")
    g1 = jax.jit(jax.grad(lambda v, x: sa1.apply(
        v, x, None, True, 0.1, mutable=["batch_stats"])[0][1]
        .astype(jnp.float32).sum()))
    print(f"  SA1 f+b  [{cfg.RPN.FPS_METHOD}]: {bench(g1, v1, xyz):7.2f} ms")

    # SA2 in isolation (shipping mode)
    sa2 = SetAbstractionMSG(
        npoint=sa_cfg.NPOINTS[1], radii=tuple(sa_cfg.RADIUS[1]),
        nsamples=tuple(sa_cfg.NSAMPLE[1]),
        mlps=tuple(tuple(m) for m in sa_cfg.MLPS[1]),
        bn=cfg.RPN.USE_BN, dtype=jnp.bfloat16,
        query_method=cfg.RPN.BALL_QUERY_METHOD,
        fps_method=cfg.RPN.FPS_METHOD,
    )
    xyz2 = jnp.asarray(_synthetic_cloud(B, sa_cfg.NPOINTS[0], seed=1))
    c1 = sum(m[-1] for m in sa_cfg.MLPS[0])
    f2 = jnp.asarray(rng.randn(B, sa_cfg.NPOINTS[0], c1).astype(np.float32))
    v2 = sa2.init(jax.random.PRNGKey(2), xyz2, f2, True, 0.1)
    fwd2 = jax.jit(lambda v, x, f: sa2.apply(
        v, x, f, True, 0.1, mutable=["batch_stats"])[0][1]
        .astype(jnp.float32).sum())
    print(f"  SA2 fwd  [{cfg.RPN.FPS_METHOD}]: {bench(fwd2, v2, xyz2, f2):7.2f} ms")
    g2 = jax.jit(jax.grad(lambda v, x, f: sa2.apply(
        v, x, f, True, 0.1, mutable=["batch_stats"])[0][1]
        .astype(jnp.float32).sum(), argnums=(0, 2)))
    print(f"  SA2 f+b  [{cfg.RPN.FPS_METHOD}]: {bench(g2, v2, xyz2, f2):7.2f} ms")


if __name__ == "__main__":
    main()
