"""Isolate the two non-model terms of the RPN train step: loss and optimizer.

profile_train_ablate attributed 29 ms to loss terms and 18 ms to
optimizer+update (batch 16).  Both are algorithmically trivial (elementwise +
reductions), so the cost must be structural: XLA gather lowering for the
take_along_axis bin selections (this backend serializes gathers, ~0.4 us/elem
— ROUND_NOTES round-1 gotchas) and per-leaf kernel overhead across the ~150
small parameter tensors in the optax chain.  This probe measures each piece
and A/Bs the candidate fixes.

Usage: python tools/probe_loss_opt.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = 20


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
    from pointrcnn_tpu.train.loss import get_rpn_loss
    from pointrcnn_tpu.train.optimizer import build_optimizer
    from pointrcnn_tpu.train.state import create_train_state

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = merge_from_list(_flagship_cfg(), ["RCNN.ENABLED", "False"])
    n = cfg.RPN.NUM_POINTS
    rng = np.random.RandomState(0)

    rpn_cls = jnp.asarray(rng.randn(B, n, 1).astype(np.float32))
    rpn_reg = jnp.asarray(rng.randn(B, n, 76).astype(np.float32))
    cls_label = jnp.asarray(
        rng.choice([-1, 0, 1], size=(B, n), p=[0.05, 0.85, 0.1]).astype(np.int32))
    reg_label = jnp.asarray(rng.randn(B, n, 7).astype(np.float32))

    # --- loss forward ---------------------------------------------------
    f_loss = jax.jit(lambda c, r, cl, rl: get_rpn_loss(cfg, c, r, cl, rl)[0])
    print(f"  rpn loss fwd:           {bench(f_loss, rpn_cls, rpn_reg, cls_label, reg_label):7.2f} ms")

    g_loss = jax.jit(jax.grad(
        lambda c, r, cl, rl: get_rpn_loss(cfg, c, r, cl, rl)[0], argnums=(0, 1)))
    print(f"  rpn loss f+b:           {bench(g_loss, rpn_cls, rpn_reg, cls_label, reg_label):7.2f} ms")

    # --- optimizer update -----------------------------------------------
    model = PointRCNN(cfg=cfg, mode="TRAIN")
    batch = {
        "pts_input": jnp.asarray(_synthetic_cloud(B, n)),
        "rpn_cls_label": cls_label,
        "rpn_reg_label": reg_label,
    }
    tx = build_optimizer(cfg, total_steps=1000, steps_per_epoch=100)
    state = create_train_state(model, cfg, batch, tx)
    leaves = jax.tree_util.tree_leaves(state.params)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"  param leaves: {len(leaves)}, total params: {n_params/1e6:.2f} M")

    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-3, state.params)
    grads = jax.device_get(grads)
    grads = jax.device_put(grads)

    import optax

    def upd(g, os_, p):
        u, new_os = tx.update(g, os_, p)
        return optax.apply_updates(p, u), new_os

    f_upd = jax.jit(upd)
    print(f"  optax update+apply:     {bench(f_upd, grads, state.opt_state, state.params):7.2f} ms")

    f_upd_d = jax.jit(upd, donate_argnums=(1, 2))
    os2 = jax.tree_util.tree_map(jnp.copy, state.opt_state)
    p2 = jax.tree_util.tree_map(jnp.copy, state.params)
    out = f_upd_d(grads, os2, p2)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f_upd_d(grads, out[1], out[0])
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"  optax update (donated): {(time.perf_counter()-t0)/ITERS*1e3:7.2f} ms")

    # pure global-norm cost over the leaves
    f_norm = jax.jit(optax.global_norm)
    print(f"  global_norm alone:      {bench(f_norm, grads):7.2f} ms")

    # flat single-vector adam as the roofline for the same math
    flat, unravel = jax.flatten_util.ravel_pytree(state.params)
    gflat = jnp.ones_like(flat) * 1e-3
    mu = jnp.zeros_like(flat)
    nu = jnp.zeros_like(flat)

    def flat_adam(g, m, v, p):
        gn = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, 1.0 / (gn + 1e-12))
        m = 0.9 * m + 0.1 * g
        v = 0.99 * v + 0.01 * g * g
        u = m / (jnp.sqrt(v) + 1e-8) + 0.001 * p
        return m, v, p - 0.002 * u

    f_flat = jax.jit(flat_adam, donate_argnums=(1, 2, 3))
    out = f_flat(gflat, mu, nu, flat)
    jax.device_get(out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f_flat(gflat, out[0], out[1], out[2])
    jax.device_get(out[0])
    print(f"  flat-vector adam:       {(time.perf_counter()-t0)/ITERS*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
