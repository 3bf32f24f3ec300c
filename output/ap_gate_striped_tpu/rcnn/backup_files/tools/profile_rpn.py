"""Per-stage timing of the RPN backbone (SA1-4, FP4-1, heads) on the current
backend.  Companion to profile_eval.py; used to target kernel work."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4
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

    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.models.pointnet2 import SetAbstractionMSG, FeaturePropagation
    from pointrcnn_tpu.models.layers import HeadMLP

    cfg = _flagship_cfg()
    sa_cfg = cfg.RPN.SA_CONFIG
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    xyz = jnp.asarray(_synthetic_cloud(BATCH, cfg.RPN.NUM_POINTS))

    # run the SA chain once to capture each stage's inputs
    l_xyz, l_feats = [xyz], [None]
    sa_mods, sa_vars = [], []
    for k in range(len(sa_cfg.NPOINTS)):
        sa = SetAbstractionMSG(
            npoint=sa_cfg.NPOINTS[k],
            radii=tuple(sa_cfg.RADIUS[k]),
            nsamples=tuple(sa_cfg.NSAMPLE[k]),
            mlps=tuple(tuple(tuple(m) for m in sa_cfg.MLPS[k])),
            dtype=dtype,
        )
        v = sa.init(rng, l_xyz[k], l_feats[k], False)
        f = jax.jit(lambda v, x, ft, sa=sa: sa.apply(v, x, ft, False))
        nx, nf = f(v, l_xyz[k], l_feats[k])
        t = bench(f, v, l_xyz[k], l_feats[k], sync=lambda o: o[1][:1, :1, :1])
        print(f"  SA{k+1} {l_xyz[k].shape[1]:>6}->{sa_cfg.NPOINTS[k]:<5}: {t:6.2f} ms")
        l_xyz.append(nx)
        l_feats.append(nf)
        sa_mods.append((sa, v))

    fp_feats = list(l_feats)
    for i in range(-1, -(len(cfg.RPN.FP_MLPS) + 1), -1):
        fp = FeaturePropagation(mlp=tuple(cfg.RPN.FP_MLPS[i]), dtype=dtype)
        args = (l_xyz[i - 1], l_xyz[i], fp_feats[i - 1], fp_feats[i])
        v = fp.init(rng, *args, False)
        f = jax.jit(lambda v, a, b, c, d, fp=fp: fp.apply(v, a, b, c, d, False))
        out = f(v, *args)
        t = bench(f, v, *args, sync=lambda o: o[:1, :1, :1])
        print(f"  FP{len(cfg.RPN.FP_MLPS)+i+1} {l_xyz[i].shape[1]:>6}->{l_xyz[i-1].shape[1]:<6}: {t:6.2f} ms")
        fp_feats[i - 1] = out

    feats = fp_feats[0]
    for name, hidden, nout in (
        ("cls head", tuple(cfg.RPN.CLS_FC), 1),
        ("reg head", tuple(cfg.RPN.REG_FC), 76),
    ):
        h = HeadMLP(hidden=hidden, out_features=nout, dp_ratio=0.5, dtype=dtype)
        v = h.init({"params": rng, "dropout": rng}, feats, False)
        f = jax.jit(lambda v, x, h=h: h.apply(v, x, False))
        f(v, feats)
        t = bench(f, v, feats, sync=lambda o: o[:1, :1])
        print(f"  {name}: {t:6.2f} ms")


if __name__ == "__main__":
    main()
