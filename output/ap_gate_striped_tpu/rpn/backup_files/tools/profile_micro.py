"""Micro-benchmarks for hotspot decomposition (dispatch overhead, ball-query
distance vs selection, roipool mask/select/gather).  Scratch tool for kernel
targeting; numbers land in docs/ROUND_NOTES.md."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4
N = 16384
S = 4096
M = 100
K = 512
ITERS = 20


def bench(fn, *args, sync=None):
    import jax

    out = fn(*args)
    jax.device_get(sync(out) if sync else out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.device_get(sync(out) if sync else out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_cloud
    from pointrcnn_tpu.ops.common import square_distance, gather_points
    from pointrcnn_tpu.ops.grouping import ball_query_multi
    from pointrcnn_tpu.utils.box_ops import enlarge_box3d, points_in_boxes3d

    xyz = jnp.asarray(_synthetic_cloud(BATCH, N))
    cent = xyz[:, :S]

    t = bench(jax.jit(lambda x: x + 1), jnp.zeros((8,), jnp.float32))
    print(f"dispatch overhead:        {t:6.2f} ms")

    specs = ((0.1, 16), (0.5, 32))
    f = jax.jit(lambda a, b: ball_query_multi(a, b, specs)[1])
    t = bench(f, xyz, cent, sync=lambda o: o[:1, :1, :1])
    print(f"ball_query_multi SA1:     {t:6.2f} ms")

    def d2_only(a, b):
        from pointrcnn_tpu.ops.common import chunked_map
        return chunked_map(lambda c: square_distance(c, a), b, 512)

    f = jax.jit(d2_only)
    t = bench(f, xyz, cent, sync=lambda o: o[:1, :1, :1])
    print(f"  d2 matrix only (f32):   {t:6.2f} ms")

    def bq_sel(a, b):
        from pointrcnn_tpu.ops.common import chunked_map
        def per_chunk(c):
            d2 = square_distance(c, a)
            _, idx = jax.lax.approx_min_k(d2, 32, recall_target=0.95)
            return idx
        return chunked_map(per_chunk, b, 512)

    f = jax.jit(bq_sel)
    t = bench(f, xyz, cent, sync=lambda o: o[:1, :1, :1])
    print(f"  d2 + approx_min_k(32):  {t:6.2f} ms")

    # same but bf16 distance matrix
    def bq_sel_bf16(a, b):
        from pointrcnn_tpu.ops.common import chunked_map
        def per_chunk(c):
            d2 = square_distance(c, a).astype(jnp.bfloat16)
            _, idx = jax.lax.approx_min_k(d2, 32, recall_target=0.95)
            return idx
        return chunked_map(per_chunk, b, 512)

    f = jax.jit(bq_sel_bf16)
    try:
        t = bench(f, xyz, cent, sync=lambda o: o[:1, :1, :1])
        print(f"  d2 bf16 + approx_min_k: {t:6.2f} ms")
    except Exception as e:
        print(f"  d2 bf16 + approx_min_k: FAILED {type(e).__name__}")

    # ---- roipool decomposition ----
    rng = np.random.RandomState(0)
    boxes = np.zeros((BATCH, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-40, 40, (BATCH, M))
    boxes[..., 1] = rng.uniform(-1, 3, (BATCH, M))
    boxes[..., 2] = rng.uniform(0, 70, (BATCH, M))
    boxes[..., 3:6] = [1.5, 1.6, 3.9]
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (BATCH, M))
    boxes = jnp.asarray(boxes)
    feats = jnp.zeros((BATCH, N, 128), jnp.float32)

    f = jax.jit(lambda x, b: points_in_boxes3d(x, enlarge_box3d(b, 1.0)))
    mask = f(xyz, boxes)
    t = bench(f, xyz, boxes, sync=lambda o: o[:1, :1, :1])
    print(f"roipool mask (B,M,N):     {t:6.2f} ms")

    def sel(mask):
        order = jnp.where(mask, jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2), N)
        vals, _ = jax.lax.approx_min_k(order.astype(jnp.float32), K)
        return vals

    f = jax.jit(sel)
    t = bench(f, mask, sync=lambda o: o[:1, :1, :1])
    print(f"roipool select top-{K}:   {t:6.2f} ms")

    idx = jnp.argsort(jnp.zeros((BATCH, M, K)), axis=-1).astype(jnp.int32)

    def gath(x, feats, idx):
        table = jnp.concatenate([x, feats], axis=-1)
        return gather_points(table, idx)

    f = jax.jit(gath)
    t = bench(f, xyz, feats, idx, sync=lambda o: o[:1, :1, :1, :1])
    print(f"roipool gather 131ch:     {t:6.2f} ms")

    from pointrcnn_tpu.ops.roipool3d import roipool3d
    f = jax.jit(lambda x, ft, b: roipool3d(x, ft, b, 1.0, K)[0])
    t = bench(f, xyz, feats, boxes, sync=lambda o: o[:1, :1, :1, :1])
    print(f"roipool full:             {t:6.2f} ms")


if __name__ == "__main__":
    main()
