"""Per-stage fwd and fwd+bwd timing of the RPN backbone on TPU (train mode).

Round-4 target: the RPN train step (reference train_rcnn.py --train_mode rpn,
SURVEY §3.1) runs at ~109 fps/chip vs 7.4% MFU on eval — this breaks the
109 fps down by SA/FP stage to find where the backward goes.

Usage: python tools/profile_rpn_bwd.py [batch]
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
    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.models.pointnet2 import FeaturePropagation, SetAbstractionMSG
    from pointrcnn_tpu.models.layers import HeadMLP

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = _flagship_cfg()
    sa_cfg = cfg.RPN.SA_CONFIG
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)

    npoints = list(sa_cfg.NPOINTS)
    n_in = [cfg.RPN.NUM_POINTS] + npoints[:-1]
    cins = [0] + [sum(m[-1] for m in sa_cfg.MLPS[k]) for k in range(len(npoints) - 1)]

    print(f"== RPN backbone per-stage (batch {B}, train mode, BN) ==")
    tot_f, tot_fb = 0.0, 0.0
    sa_xyz = []
    for k in range(len(npoints)):
        sa = SetAbstractionMSG(
            npoint=npoints[k], radii=tuple(sa_cfg.RADIUS[k]),
            nsamples=tuple(sa_cfg.NSAMPLE[k]),
            mlps=tuple(tuple(m) for m in sa_cfg.MLPS[k]),
            bn=cfg.RPN.USE_BN, dtype=jnp.bfloat16,
        )
        x = jnp.asarray(_synthetic_cloud(B, n_in[k], seed=k))
        f = (jnp.asarray(rng.randn(B, n_in[k], cins[k]).astype(np.float32))
             if cins[k] else None)
        sa_xyz.append(x)
        v = sa.init(key, x, f, True, 0.1)

        if f is None:
            fwd = jax.jit(lambda v, x, sa=sa: sa.apply(
                v, x, None, True, 0.1, mutable=["batch_stats"])[0][1].sum())
            t_f = bench(fwd, v, x)
            g = jax.jit(jax.grad(lambda v, x, sa=sa: sa.apply(
                v, x, None, True, 0.1, mutable=["batch_stats"])[0][1].sum()))
            t_fb = bench(g, v, x)
        else:
            fwd = jax.jit(lambda v, x, f, sa=sa: sa.apply(
                v, x, f, True, 0.1, mutable=["batch_stats"])[0][1].sum())
            t_f = bench(fwd, v, x, f)
            g = jax.jit(jax.grad(lambda v, x, f, sa=sa: sa.apply(
                v, x, f, True, 0.1, mutable=["batch_stats"])[0][1].sum(),
                argnums=(0, 2)))
            t_fb = bench(g, v, x, f)
        tot_f += t_f
        tot_fb += t_fb
        print(f"  SA{k + 1} (N={n_in[k]:>5} -> S={npoints[k]:>4}, cin={cins[k]:>3}):"
              f" fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")

    # FP stages: FP_MLPS[i] consumes (level i unknown, level i+1 known)
    fp_cins = [sum(m[-1] for m in sa_cfg.MLPS[k]) for k in range(len(npoints))]
    skip = [0] + fp_cins[:-1]  # unknown-side features at each level
    fp_known = list(fp_cins)
    fp_known[-1] = fp_cins[-1]
    known_c = fp_cins[-1]
    for i in range(len(cfg.RPN.FP_MLPS) - 1, -1, -1):
        fp = FeaturePropagation(mlp=tuple(cfg.RPN.FP_MLPS[i]), bn=cfg.RPN.USE_BN,
                                dtype=jnp.bfloat16)
        n_unk = n_in[i]
        m_kn = npoints[i]
        unk_c = skip[i]
        ux = jnp.asarray(_synthetic_cloud(B, n_unk, seed=10 + i))
        kx = jnp.asarray(_synthetic_cloud(B, m_kn, seed=20 + i))
        uf = (jnp.asarray(rng.randn(B, n_unk, unk_c).astype(np.float32))
              if unk_c else None)
        kf = jnp.asarray(rng.randn(B, m_kn, known_c).astype(np.float32))
        v = fp.init(key, ux, kx, uf, kf, True, 0.1)

        if uf is None:
            g = jax.jit(jax.grad(lambda v, kf, fp=fp, ux=ux, kx=kx: fp.apply(
                v, ux, kx, None, kf, True, 0.1,
                mutable=["batch_stats"])[0].sum(), argnums=(0, 1)))
            t_fb = bench(g, v, kf)
            fwd = jax.jit(lambda v, kf, fp=fp, ux=ux, kx=kx: fp.apply(
                v, ux, kx, None, kf, True, 0.1,
                mutable=["batch_stats"])[0].sum())
            t_f = bench(fwd, v, kf)
        else:
            g = jax.jit(jax.grad(lambda v, uf, kf, fp=fp, ux=ux, kx=kx: fp.apply(
                v, ux, kx, uf, kf, True, 0.1,
                mutable=["batch_stats"])[0].sum(), argnums=(0, 1, 2)))
            t_fb = bench(g, v, uf, kf)
            fwd = jax.jit(lambda v, uf, kf, fp=fp, ux=ux, kx=kx: fp.apply(
                v, ux, kx, uf, kf, True, 0.1,
                mutable=["batch_stats"])[0].sum())
            t_f = bench(fwd, v, uf, kf)
        known_c = cfg.RPN.FP_MLPS[i][-1]
        tot_f += t_f
        tot_fb += t_fb
        print(f"  FP{i + 1} (n={n_unk:>5}, m={m_kn:>4}, skip={unk_c:>3}):"
              f" fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")

    # heads on (B, N, 128)
    feats = jnp.asarray(rng.randn(B, cfg.RPN.NUM_POINTS, cfg.RPN.FP_MLPS[0][-1])
                        .astype(np.float32))
    for name, hidden, out_c in (
        ("cls", tuple(cfg.RPN.CLS_FC), 1),
        ("reg", tuple(cfg.RPN.REG_FC), 76),
    ):
        head = HeadMLP(hidden=hidden, out_features=out_c, bn=cfg.RPN.USE_BN,
                       dp_ratio=0.0, dtype=jnp.bfloat16)
        v = head.init(key, feats, True, 0.1)
        g = jax.jit(jax.grad(lambda v, f, head=head: head.apply(
            v, f, True, 0.1, mutable=["batch_stats"])[0].sum(), argnums=(0, 1)))
        t_fb = bench(g, v, feats)
        tot_fb += t_fb
        print(f"  {name}_head: fwd+bwd {t_fb:7.2f} ms")

    print(f"  -- sum fwd {tot_f:7.2f} ms   sum fwd+bwd {tot_fb:7.2f} ms "
          f"({B / tot_fb * 1e3:.1f} fps equiv)")


if __name__ == "__main__":
    main()
