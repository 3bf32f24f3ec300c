"""Autotune the fused group-MLP-max kernel's chunking on the real chip.

Sweeps the centroid-chunk (forward) and row-budget (backward) knobs of
ops/pallas_mlp at the production RCNN SA shapes (default car config:
B = 4 x 100 rois; SA1 512->128 K=64, SA2 128->32 K=64) and prints ms per
call.  Results feed the _CHUNK_S_MAX / _MAX_ROWS_BWD defaults; the env
overrides (POINTRCNN_MLP_CHUNK_S / POINTRCNN_MLP_ROWS_BWD) let a deployment
pin the winner without editing source.

Usage: python tools/tune_fused_mlp.py [--iters 30]
"""

import argparse
import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# production RCNN SA shapes from cfgs/default.yaml (B = batch4 x 100 rois)
SHAPES = [
    # (tag, B, N, S, K, cin, mlps)
    ("rcnn-sa1", 400, 512, 128, 64, 128, (128, 128, 128)),
    ("rcnn-sa2", 400, 128, 32, 64, 128, (128, 128, 256)),
]


def bench(fn, args, iters):
    import jax

    # sync on a scalar slice: device_get of full outputs crawls through the
    # ~34 MB/s relay and would dominate the measurement
    out = fn(*args)
    jax.device_get(out[:1, :1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out[:1, :1, :1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import pointrcnn_tpu.ops.pallas_mlp as pm

    rng = np.random.RandomState(0)
    for tag, B, N, S, K, cin, mlps in SHAPES:
        xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(0, 1, (B, N, cin)).astype(np.float32))
        new_xyz = xyz[:, :S]
        idx = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))
        ws, c = [], cin + 3
        for f in mlps:
            ws.append(jnp.asarray(rng.normal(0, 0.1, (c, f)).astype(np.float32)))
            c = f
        bs = [jnp.zeros((f,), jnp.float32) for f in mlps]

        print(f"== {tag}: B={B} N={N} S={S} K={K} cin={cin} mlps={mlps}")
        for chunk in (16, 32, 64, 128):
            if S % chunk and chunk > S:
                continue
            pm._CHUNK_S_MAX = chunk
            # bf16 is the kernel's (only) compute dtype — f32 would gate it off
            if not pm.fused_group_mlp_max_supported(feats, idx, jnp.bfloat16):
                print(f"  fwd chunk {chunk:4d}: unsupported")
                continue
            fwd = jax.jit(lambda *a: pm.fused_group_mlp_max(*a, ws, bs, True))
            try:
                t = bench(fwd, (xyz, feats, new_xyz, idx), args.iters)
                print(f"  fwd chunk {chunk:4d}: {t:7.3f} ms")
            except Exception as e:  # Mosaic VMEM OOM etc.
                print(f"  fwd chunk {chunk:4d}: FAILED {type(e).__name__}")

        pm._CHUNK_S_MAX = int(os.environ.get("POINTRCNN_MLP_CHUNK_S", 64))
        for rows in (1024, 2048, 4096):
            pm._MAX_ROWS_BWD = rows
            if not pm.fused_group_bwd_supported(feats, idx):
                print(f"  bwd rows {rows:5d}: unsupported")
                continue

            def loss(x, f):
                return jnp.sum(pm.fused_group_mlp_max(x, f, new_xyz, idx, ws, bs, True))

            g = jax.jit(jax.grad(loss, argnums=1))
            try:
                t = bench(g, (xyz, feats), args.iters)
                print(f"  bwd rows {rows:5d}: {t:7.3f} ms")
            except Exception as e:
                print(f"  bwd rows {rows:5d}: FAILED {type(e).__name__}")
        pm._MAX_ROWS_BWD = int(os.environ.get("POINTRCNN_MLP_ROWS_BWD", 2048))


if __name__ == "__main__":
    main()
