"""Decompose the fused group-MLP-max kernel's gap to its FLOP bound.

Round-4 left the RCNN fused kernel at ~65% of its gather-matmul FLOP bound
with chunking exonerated (PARITY.md).  Hypothesis for the remainder: the
VPU one-hot construction (iota + compare over rows x N elements) serializes
with the MXU phases inside each grid step — at the RCNN SA1 shape the
build's element count (rows x N) times the VPU rate is comparable to the
gather matmul's MAC count over the MXU rate, so an unoverlapped build alone
predicts ~55-70% MXU occupancy.

Variants timed at the production RCNN SA shapes (same BlockSpecs/grid as
ops.pallas_mlp, fold mode):

- full        : the production kernel body
- no_build    : one-hot replaced by a VMEM-resident constant operand block
                (same matmuls, zero build cost) — the attribution bound
- no_mlp      : build + gather matmul + max only (layer 2..n dropped)
- mxu_only    : one dense bf16 matmul of the same total MACs (peak check)

Usage: python tools/probe_fused_gap.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    # (tag, B, N, S, K, f0p, mlps) — production RCNN SA shapes (batch 4 x
    # 100 rois), fold mode (geometry folded into the f0p table lanes)
    SHAPES = [
        ("rcnn-sa1", 400, 512, 128, 64, 128, (128, 128, 128)),
        ("rcnn-sa2", 400, 128, 32, 64, 128, (128, 128, 256)),
    ]

    def make_kernel(n_layers, K, f0p, variant, bb=1):
        def kernel(*refs):
            p = 0
            table_ref = refs[p]; p += 1
            idx_ref = refs[p]; p += 1
            ohc_ref = None
            if variant == "no_build":
                ohc_ref = refs[p]; p += 1
            cent_ref = refs[p]; p += 1
            nl = n_layers if variant != "no_mlp" else 1
            ws = refs[p : p + nl - 1]; p += nl - 1
            bs = refs[p : p + nl]; p += nl
            out_ref = refs[p]

            if variant == "multib":
                # bb batch rows per grid step: amortize the fixed per-step
                # cost over bb sub-matmuls
                n = table_ref.shape[1]
                s_chunk = idx_ref.shape[1]
                rows = s_chunk * K
                for i in range(bb):
                    idx3 = idx_ref[i][:, :, None]
                    cols3 = jax.lax.broadcasted_iota(
                        jnp.int32, (s_chunk, K, n), 2)
                    oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)
                    g = jnp.dot(oh, table_ref[i],
                                preferred_element_type=jnp.float32)
                    x = (g[:, :f0p].reshape(s_chunk, K, f0p)
                         - cent_ref[i][:, None, :]).reshape(rows, f0p)
                    x = jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)
                    for j in range(1, nl):
                        x = jnp.dot(x.astype(jnp.bfloat16),
                                    ws[j - 1][...].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                        x = jnp.maximum(
                            x + bs[j][...].astype(jnp.float32), 0.0)
                    cout = x.shape[-1]
                    out_ref[i] = jnp.max(x.reshape(s_chunk, K, cout), axis=1)
                return

            n = table_ref.shape[1]
            s_chunk = idx_ref.shape[1]
            rows = s_chunk * K

            if variant == "no_build":
                oh = ohc_ref[0]
                g = jnp.dot(oh, table_ref[0],
                            preferred_element_type=jnp.float32)
            elif variant == "split2":
                # two-half manual split: half 1's one-hot build (VPU) has no
                # data dependence on half 0's matmul (MXU) — if Mosaic
                # software-pipelines across them, the build cost hides
                h = s_chunk // 2
                gs = []
                for hh in range(2):
                    idx3 = idx_ref[0][hh * h:(hh + 1) * h][:, :, None]
                    cols3 = jax.lax.broadcasted_iota(jnp.int32, (h, K, n), 2)
                    oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(h * K, n)
                    gs.append(jnp.dot(oh, table_ref[0],
                                      preferred_element_type=jnp.float32))
                g = jnp.concatenate(gs, axis=0)
            else:
                idx3 = idx_ref[0][:, :, None]
                cols3 = jax.lax.broadcasted_iota(jnp.int32, (s_chunk, K, n), 2)
                oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)
                g = jnp.dot(oh, table_ref[0],
                            preferred_element_type=jnp.float32)
            x = (g[:, :f0p].reshape(s_chunk, K, f0p)
                 - cent_ref[0][:, None, :]).reshape(rows, f0p)
            x = jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)
            for i in range(1, nl):
                x = jnp.dot(x.astype(jnp.bfloat16),
                            ws[i - 1][...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                x = jnp.maximum(x + bs[i][...].astype(jnp.float32), 0.0)
            cout = x.shape[-1]
            out_ref[0] = jnp.max(x.reshape(s_chunk, K, cout), axis=1)

        return kernel

    def build_call(B, N, S, K, f0p, mlps, variant, bb=1):
        from pointrcnn_tpu.ops.pallas_mlp import _pick_chunk

        chunk_s = _pick_chunk(S, K)
        rows = chunk_s * K
        nl = len(mlps) if variant != "no_mlp" else 1
        grid = (B // bb, S // chunk_s)
        fixed = lambda b, s: (0, 0)
        in_specs = [
            pl.BlockSpec((bb, N, f0p), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, chunk_s, K), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ]
        if variant == "no_build":
            # constant one-hot operand: one (rows, N) block reused by every
            # grid step — it rides VMEM after the first fetch
            in_specs.append(pl.BlockSpec((1, rows, N), lambda b, s: (0, 0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((bb, chunk_s, f0p),
                                     lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        ws = [np.random.randn(mlps[i], mlps[i + 1]).astype(np.float32) * 0.05
              for i in range(nl - 1)]
        bs = [np.zeros((1, mlps[i]), np.float32) for i in range(nl)]
        for w in ws:
            in_specs.append(pl.BlockSpec(w.shape, fixed,
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, fixed,
                                         memory_space=pltpu.VMEM))
        cout = mlps[nl - 1]

        kern = make_kernel(len(mlps), K, f0p, variant, bb=bb)
        call = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((bb, chunk_s, cout),
                                   lambda b, s: (b, s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, cout), jnp.float32),
        )
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.randn(B, N, f0p).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, N, (B, chunk_s * (S // chunk_s), K)).astype(np.int32))
        cent = jnp.asarray(rng.randn(B, S, f0p).astype(np.float32))
        operands = [table, idx]
        if variant == "no_build":
            operands.append(jnp.full((1, rows, N), 0.001, jnp.bfloat16))
        operands.append(cent)
        operands += [jnp.asarray(w) for w in ws]
        operands += [jnp.asarray(b) for b in bs]
        # MAC counts
        macs = B * S * K * N * f0p  # gather matmul
        for i in range(nl - 1):
            macs += B * S * K * mlps[i] * mlps[i + 1]
        return jax.jit(lambda *a: call(*a)), operands, macs, chunk_s

    def bench(fn, operands, iters):
        out = fn(*operands)
        jax.device_get(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*operands)
        jax.device_get(out.ravel()[:1])
        return (time.perf_counter() - t0) / iters

    PEAK = 197e12  # bf16 TF/s, v5e

    for tag, B, N, S, K, f0p, mlps in SHAPES:
        print(f"== {tag}: B{B} N{N} S{S} K{K} f0p{f0p} mlps{mlps}")
        base_ms = None
        for variant in ("full", "multib:2", "multib:4", "multib:8",
                        "split2", "no_build", "no_mlp",
                        "dense_xla", "mxu_only"):
            bb = 1
            if variant.startswith("multib"):
                bb = int(variant.split(":")[1])
                if B % bb:
                    continue
                try:
                    fn, operands, macs, chunk_s = build_call(
                        B, N, S, K, f0p, mlps, "multib", bb=bb)
                    dt = bench(fn, operands, args.iters)
                except Exception as e:
                    print(f"  {variant:9s}: FAILED "
                          f"({type(e).__name__}: {str(e)[:80]})")
                    continue
                note = ""
                if base_ms:
                    note = f"  ({(base_ms - dt) / base_ms * 100:+.1f}% vs full)"
                print(f"  {variant:9s}: {dt * 1e3:7.3f} ms  "
                      f"MXU {2 * macs / dt / PEAK * 100:5.1f}% of peak"
                      f"  [chunk {chunk_s}]{note}")
                continue
            if variant == "dense_xla":
                # the gather matmul's exact per-step shape as a plain XLA
                # batched matmul: what the MXU achieves on (rows x N x f0p)
                # bf16 with NO build/epilogue — shape-specific peak
                from pointrcnn_tpu.ops.pallas_mlp import _pick_chunk
                chunk_s = _pick_chunk(S, K)
                rows = chunk_s * K
                steps = B * (S // chunk_s)
                bdim = min(steps, 64)
                a = jnp.zeros((bdim, rows, N), jnp.bfloat16)
                t = jnp.zeros((bdim, N, f0p), jnp.bfloat16)
                f = jax.jit(lambda a, t: jnp.einsum(
                    "brn,bnf->brf", a, t,
                    preferred_element_type=jnp.float32))
                dt = bench(f, (a, t), args.iters)
                eff = bdim * rows * N * f0p
                print(f"  {variant:9s}: {dt * 1e3:7.3f} ms  "
                      f"MXU {2 * eff / dt / PEAK * 100:5.1f}% of peak  "
                      f"[{bdim} steps of (rows {rows} x N {N} x f0p {f0p})]")
                continue
            if variant == "mxu_only":
                rows_all = B * S * K
                macs = B * S * K * N * f0p
                for i in range(len(mlps) - 1):
                    macs += B * S * K * mlps[i] * mlps[i + 1]
                # one dense matmul with the same MAC count
                m = 8192
                kdim = 2048
                ncols = max(128, int(macs / (m * kdim)))
                a = jnp.zeros((m, kdim), jnp.bfloat16)
                b = jnp.zeros((kdim, ncols), jnp.bfloat16)
                f = jax.jit(lambda a, b: jnp.dot(
                    a, b, preferred_element_type=jnp.float32))
                dt = bench(lambda *o: f(*o), (a, b), args.iters)
                eff_macs = m * kdim * ncols
                print(f"  {variant:9s}: {dt * 1e3:7.3f} ms  "
                      f"MXU {2 * eff_macs / dt / PEAK * 100:5.1f}% of peak")
                continue
            fn, operands, macs, chunk_s = build_call(
                B, N, S, K, f0p, mlps, variant)
            dt = bench(fn, operands, args.iters)
            note = ""
            if variant == "full":
                base_ms = dt
            elif base_ms:
                note = f"  ({(base_ms - dt) / base_ms * 100:+.1f}% vs full)"
            print(f"  {variant:9s}: {dt * 1e3:7.3f} ms  "
                  f"MXU {2 * macs / dt / PEAK * 100:5.1f}% of peak"
                  f"  [chunk {chunk_s}]{note}")


if __name__ == "__main__":
    main()
