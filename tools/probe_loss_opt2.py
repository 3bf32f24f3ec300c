"""Second-stage probe: which op inside get_rpn_loss burns the 28 ms, and
which global_norm formulation is cheapest on this backend.

Usage: python tools/probe_loss_opt2.py [batch]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 16384
    M = B * n
    rng = np.random.RandomState(0)

    pred = jnp.asarray(rng.randn(M, 76).astype(np.float32))
    bins = jnp.asarray(rng.randint(0, 12, size=(M,)).astype(np.int32))
    fg = jnp.asarray((rng.rand(M) < 0.1).astype(np.float32))

    # --- the three candidate forms of the bin-residual select -----------
    f_gather = jax.jit(lambda p, b: jnp.take_along_axis(
        p[:, 24:36], b[:, None], axis=1)[:, 0].sum())
    print(f"  take_along_axis (M,12):  {bench(f_gather, pred, bins):7.2f} ms")

    def onehot_sel(p, b):
        oh = (b[:, None] == jnp.arange(12, dtype=jnp.int32)[None, :])
        return jnp.sum(jnp.where(oh, p[:, 24:36], 0.0), axis=1).sum()
    f_oh = jax.jit(onehot_sel)
    print(f"  one-hot select (M,12):   {bench(f_oh, pred, bins):7.2f} ms")

    # --- log_softmax + nll (as in _masked_softmax_ce) --------------------
    def ce_gather(p, b, m):
        logp = jax.nn.log_softmax(p[:, :12], axis=-1)
        nll = -jnp.take_along_axis(logp, b[:, None], axis=1)[:, 0]
        return jnp.sum(nll * m) / jnp.clip(jnp.sum(m), 1.0, None)
    print(f"  softmax-CE gather:       {bench(jax.jit(ce_gather), pred, bins, fg):7.2f} ms")

    def ce_onehot(p, b, m):
        logp = jax.nn.log_softmax(p[:, :12], axis=-1)
        oh = (b[:, None] == jnp.arange(12, dtype=jnp.int32)[None, :])
        nll = -jnp.sum(jnp.where(oh, logp, 0.0), axis=1)
        return jnp.sum(nll * m) / jnp.clip(jnp.sum(m), 1.0, None)
    print(f"  softmax-CE one-hot:      {bench(jax.jit(ce_onehot), pred, bins, fg):7.2f} ms")

    # --- global norm variants --------------------------------------------
    import optax
    leaves = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in
              [(3, 16)] * 20 + [(16, 16)] * 20 + [(128, 128)] * 30 +
              [(64,)] * 30 + [(512, 128)] * 6]
    tree = {f"l{i}": l for i, l in enumerate(leaves)}
    print(f"  [{len(leaves)} leaves, {sum(int(np.prod(l.shape)) for l in leaves)/1e6:.2f} M params]")

    print(f"  optax.global_norm:       {bench(jax.jit(optax.global_norm), tree):7.2f} ms")

    f_vdot = jax.jit(lambda t: jnp.sqrt(sum(
        jnp.vdot(l, l) for l in jax.tree_util.tree_leaves(t))))
    print(f"  sum-of-vdots norm:       {bench(f_vdot, tree):7.2f} ms")

    f_stack = jax.jit(lambda t: jnp.sqrt(jnp.sum(jnp.stack(
        [jnp.sum(l * l) for l in jax.tree_util.tree_leaves(t)]))))
    print(f"  stacked-sums norm:       {bench(f_stack, tree):7.2f} ms")

    big = jnp.asarray(rng.randn(3_050_000).astype(np.float32))
    f_big = jax.jit(lambda x: jnp.sqrt(jnp.vdot(x, x)))
    print(f"  single 3M-vec reduction: {bench(f_big, big):7.2f} ms")

    # elementwise-only chain over the same leaves (adam-shaped, no norms)
    def ew(t):
        return jax.tree_util.tree_map(lambda l: l * 0.9 + 0.1 * l * l, t)
    print(f"  per-leaf elementwise:    {bench(jax.jit(ew), tree):7.2f} ms")


if __name__ == "__main__":
    main()
