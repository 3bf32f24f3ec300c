"""Per-stage fwd+bwd timing of the RCNN net's sub-modules on TPU.

Targets the round-3 backward optimization: which SA stage's materialized
neighborhood tensors dominate the 49 ms backward.

Usage: python tools/profile_rcnn_bwd.py [rois]
"""

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
    from __graft_entry__ import _flagship_cfg
    from pointrcnn_tpu.models.pointnet2 import SetAbstraction
    from pointrcnn_tpu.models.layers import SharedMLP

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = _flagship_cfg()
    c = cfg.RCNN

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # stage inputs mirroring the train path: (R, 512, 3) xyz + (R, 512, 128)
    xyz = jnp.asarray(rng.uniform(-2, 2, (R, c.NUM_POINTS, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(R, c.NUM_POINTS, 128).astype(np.float32))

    def stage(k, npoint, n_in, cin):
        sa = SetAbstraction(
            npoint=npoint if npoint != -1 else None,
            radius=c.SA_CONFIG.RADIUS[k], nsample=c.SA_CONFIG.NSAMPLE[k],
            mlp=tuple(c.SA_CONFIG.MLPS[k]), bn=c.USE_BN, ball_chunk=128,
            dtype=jnp.bfloat16, query_method="approx",
        )
        x = jnp.asarray(rng.uniform(-2, 2, (R, n_in, 3)).astype(np.float32))
        f = jnp.asarray(rng.randn(R, n_in, cin).astype(np.float32))
        v = sa.init(key, x, f, True, 0.1)

        fwd = jax.jit(lambda v, x, f: sa.apply(v, x, f, True, 0.1)[1].sum())
        t_f = bench(fwd, v, x, f)

        g = jax.jit(jax.grad(
            lambda v, x, f: sa.apply(v, x, f, True, 0.1)[1].sum(), argnums=(0, 2)))
        t_fb = bench(g, v, x, f)
        print(f"  SA{k} (npoint={npoint}, n_in={n_in}, cin={cin}):"
              f" fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")

    stage(0, c.SA_CONFIG.NPOINTS[0], c.NUM_POINTS, 128)
    stage(1, c.SA_CONFIG.NPOINTS[1], c.SA_CONFIG.NPOINTS[0], c.SA_CONFIG.MLPS[0][-1])
    stage(2, c.SA_CONFIG.NPOINTS[2], c.SA_CONFIG.NPOINTS[1], c.SA_CONFIG.MLPS[1][-1])

    # xyz_up + merge on (R, 512, .)
    up = SharedMLP(tuple(c.XYZ_UP_LAYER), bn=c.USE_BN, dtype=jnp.bfloat16)
    xin = jnp.asarray(rng.randn(R, c.NUM_POINTS, 5).astype(np.float32))
    vu = up.init(key, xin, True, 0.1)
    g_up = jax.jit(jax.grad(lambda v, x: up.apply(v, x, True, 0.1).sum(),
                            argnums=(0, 1)))
    print(f"  xyz_up fwd+bwd: {bench(g_up, vu, xin):7.2f} ms")


if __name__ == "__main__":
    main()
