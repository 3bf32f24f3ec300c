"""Decompose SA1's shipping-mode geometry: z-sort, gathers, blockwise FPS,
banded ball query — and A/B the argsort+gather z-sort against a multi-operand
lax.sort (no gather).

Usage: python tools/probe_sa1_geom.py [batch]
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
    from __graft_entry__ import _synthetic_cloud

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N, npoint = 16384, 4096
    specs = ((0.1, 16), (0.5, 32))
    xyz = jnp.asarray(_synthetic_cloud(B, N))

    from pointrcnn_tpu.ops.grouping import fps_group_banded
    from pointrcnn_tpu.ops.sampling import _blockwise_stripes, furthest_point_sample
    from pointrcnn_tpu.ops.pallas_ballquery import (
        ball_query_multi_grouped_banded,
        ball_query_multi_grouped_pallas,
    )

    s = _blockwise_stripes(N, npoint)
    print(f"  stripes s={s}")

    f_total = jax.jit(lambda x: fps_group_banded(x, npoint, specs)[1][1].sum())
    print(f"  fps_group_banded total:  {bench(f_total, xyz):7.2f} ms")

    f_sort = jax.jit(lambda x: jnp.take_along_axis(
        x, jnp.argsort(x[..., 2], axis=1).astype(jnp.int32)[..., None], axis=1).sum())
    print(f"  argsort + xyz gather:    {bench(f_sort, xyz):7.2f} ms")

    f_arg = jax.jit(lambda x: jnp.argsort(x[..., 2], axis=1).sum())
    print(f"  argsort alone:           {bench(f_arg, xyz):7.2f} ms")

    def multisort(x):
        z = x[..., 2]
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], z.shape)
        zs, xs0, xs1, xs2, perm = jax.lax.sort(
            (z, x[..., 0], x[..., 1], x[..., 2], idx), dimension=1, num_keys=1)
        return xs0.sum() + xs1.sum() + xs2.sum() + perm.sum()
    print(f"  lax.sort 5-operand:      {bench(jax.jit(multisort), xyz):7.2f} ms")

    # FPS on the sorted table
    Ns = N // s
    xs = jnp.take_along_axis(
        xyz, jnp.argsort(xyz[..., 2], axis=1).astype(jnp.int32)[..., None], axis=1)
    f_fps = jax.jit(lambda t: furthest_point_sample(
        t.reshape(B * s, Ns, 3), npoint // s, method="exact").sum())
    print(f"  per-band exact FPS:      {bench(f_fps, xs):7.2f} ms")

    new_xyz = jax.jit(lambda t: t[:, ::4])(xs)[:, :npoint]
    p0 = xyz[:, 0:1]
    f_bq = jax.jit(lambda t, c: ball_query_multi_grouped_banded(
        t, c, specs, s, point0=p0)[1].sum())
    print(f"  banded ball query:       {bench(f_bq, xs, new_xyz):7.2f} ms")
    f_bqf = jax.jit(lambda t, c: ball_query_multi_grouped_pallas(
        t, c, specs, point0=p0)[1].sum())
    print(f"  full-scan ball query:    {bench(f_bqf, xs, new_xyz):7.2f} ms")

    # the final centroid gather (B, npoint) rows from the sorted table
    sidx = jnp.asarray(np.random.RandomState(0).randint(
        0, N, size=(B, npoint)).astype(np.int32))
    f_g1 = jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1).sum())
    print(f"  centroid gather (tala):  {bench(f_g1, xs, sidx):7.2f} ms")

    from pointrcnn_tpu.ops.common import gather_points
    f_g2 = jax.jit(lambda t, i: gather_points(t, i).sum())
    print(f"  centroid gather (1-hot): {bench(f_g2, xs, sidx):7.2f} ms")


if __name__ == "__main__":
    main()
