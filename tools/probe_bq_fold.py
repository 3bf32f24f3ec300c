"""Controlled same-process A/B of the ball-query kernel's extraction stage.

Sweeps the post-scan fold width (_XW) and kmax inside ONE process so relay/
compile noise can't masquerade as a win, at the SA1 train shape (B=16,
N=16384, s=16 bands, kmax=32) and the SA2 full-scan shape.

Usage: python tools/probe_bq_fold.py [batch]
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
    from pointrcnn_tpu.ops import pallas_ballquery as bq

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N, npoint, s = 16384, 4096, 16
    xyz = jnp.asarray(_synthetic_cloud(B, N))
    xs = jnp.sort(xyz[..., 2], axis=1)  # only z order matters for timing
    xst = jnp.take_along_axis(
        xyz, jnp.argsort(xyz[..., 2], axis=1).astype(jnp.int32)[..., None], 1)
    cent = xst[:, ::4][:, :npoint]
    kt = jnp.transpose(xst.astype(jnp.float32), (0, 2, 1))

    for kmax in (4, 32):
        for xw in (512, 256, 128, 64):
            bq._XW = xw
            # _ball_query_pallas* are module-level jits: _XW is captured at
            # trace time, so the cache must be dropped between sweep points
            bq._ball_query_pallas_banded.clear_cache()
            f = jax.jit(lambda c, t, k=kmax: bq._ball_query_pallas_banded(
                c, t, k, s, emit_rel=True, W=512)[2].sum())
            t = bench(f, cent, kt)
            print(f"  banded  kmax={kmax:3d} XW={xw:4d}: {t:7.2f} ms")
    # full-scan kernel at the SA2 shape (N=4096 candidates, S=1024)
    xyz2 = jnp.asarray(_synthetic_cloud(B, 4096, seed=1))
    cent2 = xyz2[:, :1024]
    kt2 = jnp.transpose(xyz2.astype(jnp.float32), (0, 2, 1))
    for xw in (512, 128, 64):
        bq._XW = xw
        bq._ball_query_pallas.clear_cache()
        f = jax.jit(lambda c, t: bq._ball_query_pallas(
            c, t, 32, emit_rel=False, W=512)[0].sum())
        print(f"  full    kmax= 32 XW={xw:4d}: {bench(f, cent2, kt2):7.2f} ms")
    bq._XW = 128


if __name__ == "__main__":
    main()
