"""Component decomposition of the RPN train-step hotspots (SA1/SA2 at batch
16): FPS variants, fused grouped ball query, train-mode SharedMLP fwd/bwd,
SA2 gather+group.  Companion to tools/profile_rpn_bwd.py (per-stage totals).
"""

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
    from __graft_entry__ import _synthetic_cloud
    from pointrcnn_tpu.models.layers import SharedMLP
    from pointrcnn_tpu.ops.common import gather_points
    from pointrcnn_tpu.ops.grouping import ball_query_multi, group_points
    from pointrcnn_tpu.ops.sampling import furthest_point_sample

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(_synthetic_cloud(B, 16384))

    # NOTE: every benched fn reduces its output to a scalar INSIDE jit — a
    # device_get of a big array goes through the remote TPU relay and costs
    # far more than the kernel (a 100 MB fetch measured ~1.3 s).
    for method in ("exact", "blockwise"):
        f = jax.jit(lambda x, m=method: furthest_point_sample(x, 4096, method=m).sum())
        print(f"  SA1 FPS 16384->4096 [{method}]: {bench(f, xyz):7.2f} ms")

    # SA1 fused grouped ball query (emits rel coords)
    from pointrcnn_tpu.ops.pallas_ballquery import (
        ball_query_multi_grouped_pallas,
        ball_query_pallas_supported,
    )

    cent = xyz[:, :4096, :]
    specs = ((0.1, 16), (0.5, 32))
    if ball_query_pallas_supported(16384, 4096, 32):
        f = jax.jit(lambda x, c: sum(
            r.astype(jnp.float32).sum()
            for r in ball_query_multi_grouped_pallas(x, c, specs)))
        print(f"  SA1 grouped ball query: {bench(f, xyz, cent):7.2f} ms")

    # SA1 train MLPs on rel coords (BN): scale2 (B, 4096, 32, 3)->[32,32,64]
    mlp = SharedMLP((32, 32, 64), bn=True, dtype=jnp.bfloat16)
    rel = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 4096, 32, 3)).astype(np.float32))
    v = mlp.init(key, rel, True, 0.1)
    fwd = jax.jit(lambda v, x: mlp.apply(v, x, True, 0.1, reduce_max=True,
                                         mutable=["batch_stats"])[0].sum())
    print(f"  SA1 mlp2 train fwd:  {bench(fwd, v, rel):7.2f} ms")
    g = jax.jit(jax.grad(lambda v, x: mlp.apply(
        v, x, True, 0.1, reduce_max=True, mutable=["batch_stats"])[0].sum(),
        argnums=(0, 1)))
    print(f"  SA1 mlp2 train f+b:  {bench(g, v, rel):7.2f} ms")

    # SA2: ball query over N=4096 table + gather+group of 96-d features
    xyz2 = xyz[:, :4096, :]
    cent2 = xyz[:, :1024, :]
    feats2 = jnp.asarray(rng.randn(B, 4096, 96).astype(np.float32))
    f = jax.jit(lambda x, c: sum(
        i.sum() for i in ball_query_multi(x, c, ((0.5, 16), (1.0, 32)))))
    print(f"  SA2 ball query:      {bench(f, xyz2, cent2):7.2f} ms")
    idx = ball_query_multi(xyz2, cent2, ((0.5, 16), (1.0, 32)))[1]

    f = jax.jit(lambda x, ft, c, i: group_points(
        x, ft, c, i, True, out_dtype=jnp.bfloat16).astype(jnp.float32).sum())
    print(f"  SA2 gather+group fwd: {bench(f, xyz2, feats2, cent2, idx):7.2f} ms")
    g = jax.jit(jax.grad(lambda ft: group_points(
        xyz2, ft, cent2, idx, True, out_dtype=jnp.bfloat16)
        .astype(jnp.float32).sum()))
    print(f"  SA2 gather+group f+b: {bench(g, feats2):7.2f} ms")

    # SA2 train MLP scale2: (B, 1024, 32, 99) -> [64, 96, 128]
    mlp2 = SharedMLP((64, 96, 128), bn=True, dtype=jnp.bfloat16)
    grouped = jnp.asarray(rng.randn(B, 1024, 32, 99).astype(np.float32))
    v2 = mlp2.init(key, grouped, True, 0.1)
    fwd = jax.jit(lambda v, x: mlp2.apply(v, x, True, 0.1, reduce_max=True,
                                          mutable=["batch_stats"])[0].sum())
    print(f"  SA2 mlp2 train fwd:  {bench(fwd, v2, grouped):7.2f} ms")
    g = jax.jit(jax.grad(lambda v, x: mlp2.apply(
        v, x, True, 0.1, reduce_max=True, mutable=["batch_stats"])[0].sum(),
        argnums=(0, 1)))
    print(f"  SA2 mlp2 train f+b:  {bench(g, v2, grouped):7.2f} ms")


if __name__ == "__main__":
    main()
