"""A/B the fused group-MLP-max geometry modes (hilo vs fold) on-chip at the
production RCNN SA shapes, forward and backward.  Scratch tool; results in
docs/ROUND_NOTES.md."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPES = [
    ("rcnn-sa1", 400, 512, 128, 64, 128, (128, 128, 128)),
    ("rcnn-sa2", 400, 128, 32, 64, 128, (128, 128, 256)),
]
ITERS = 30


def bench(fn, args):
    import jax

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf[(slice(0, 1),) * leaf.ndim])

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import pointrcnn_tpu.ops.pallas_mlp as pm

    rng = np.random.RandomState(0)
    for tag, B, N, S, K, cin, mlps in SHAPES:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(B, N, cin).astype(np.float32))
        new_xyz = jnp.asarray(rng.randn(B, S, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, S, K)).astype(np.int32))
        ws, bs, c = [], [], cin + 3
        for f in mlps:
            ws.append(jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05))
            bs.append(jnp.asarray(rng.randn(f).astype(np.float32) * 0.05))
            c = f
        ws, bs = tuple(ws), tuple(bs)
        for fold in (False, True):
            fwd = jax.jit(lambda x, f, nx, i: pm.fused_group_mlp_max(
                x, f, nx, i, ws, bs, True, fold_geometry=fold))
            t = bench(fwd, (xyz, feats, new_xyz, idx))
            print(f"{tag} fwd fold={int(fold)}: {t:7.2f} ms")

            def loss(x, f):
                return jnp.sum(pm.fused_group_mlp_max(
                    x, f, new_xyz, idx, ws, bs, True, fold_geometry=fold))

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t = bench(g, (xyz, feats))
            print(f"{tag} bwd fold={int(fold)}: {t:7.2f} ms")
        # numeric delta at canonical-frame magnitudes
        a = jax.device_get(jax.jit(lambda: pm.fused_group_mlp_max(
            xyz, feats, new_xyz, idx, ws, bs, True, fold_geometry=False))())
        b = jax.device_get(jax.jit(lambda: pm.fused_group_mlp_max(
            xyz, feats, new_xyz, idx, ws, bs, True, fold_geometry=True))())
        scale = np.abs(a).max()
        print(f"{tag} max|fold-hilo|/max|out|: {np.abs(a - b).max() / scale:.2e}")


if __name__ == "__main__":
    main()
