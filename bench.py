"""Headline benchmark: full two-stage eval-forward throughput on TPU.

Workload mirrors the reference's benchmark path (SURVEY.md §6 / BASELINE.md):
batch 4, 16384 input points, RPN pre/post-NMS 9000/100 @ 0.8, RCNN 512
points/roi, i.e. `eval_rcnn.py --eval_mode rcnn` per batch — RPN backbone +
proposal decode/NMS + roi pooling + RCNN refinement, end to end in one jit.

The reference publishes no throughput numbers (BASELINE.md). We anchor
``vs_baseline`` to 10 frames/sec/GPU, a representative measured rate for the
reference implementation's full eval loop on its era GPU (PyTorch 1.0,
1080Ti-class); the north-star target is >=5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_FPS = 10.0
BATCH = 4
WARMUP = 3
ITERS = 20


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _synthetic_cloud
    from pointrcnn_tpu.models.point_rcnn import PointRCNN

    cfg = _flagship_cfg()
    model = PointRCNN(cfg=cfg, mode="TEST")
    batch = {"pts_input": jnp.asarray(_synthetic_cloud(BATCH, cfg.RPN.NUM_POINTS))}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "target": jax.random.PRNGKey(2),
    }
    variables = jax.jit(model.init, static_argnames="train")(rngs, batch, train=False)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))

    for _ in range(WARMUP):
        out = fwd(variables, batch)
    # device_get is the reliable sync barrier on this platform
    # (block_until_ready returns early through the remote relay)
    jax.device_get(out["rcnn_cls"])

    # enqueue all iterations, then sync once: executions serialise on the
    # single core, so total time = device time + one ~28 ms relay round-trip
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(variables, batch)
    jax.device_get(out["rcnn_cls"])
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    import sys

    # MFU: analytic matmul FLOPs of the forward (utils/flops.py; XLA
    # cost_analysis can't serve — Pallas custom calls report 0 flops and
    # one-hot MXU gathers inflate the count with data movement)
    from pointrcnn_tpu.utils.flops import device_peak_flops, eval_forward_flops

    fc = eval_forward_flops(cfg, mode="TEST")
    peak, kind = device_peak_flops(jax.devices()[0])
    mfu = fps * fc.mlp / peak

    print(
        "note: vs_baseline anchors to an ASSUMED 10 fps for the reference "
        "implementation (it publishes no throughput numbers; 10 fps is a "
        "representative full-eval-loop rate on its era 1080Ti-class GPU)",
        file=sys.stderr,
    )
    print(
        f"note: MFU numerator = {fc.mlp / 1e9:.1f} GF/frame model matmuls "
        f"(+{fc.geometry / 1e9:.1f} GF geometry, excluded); peak = "
        f"{peak / 1e12:.0f} TF/s bf16 on {kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "two_stage_eval_throughput",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_FPS, 3),
                "model_gflops_per_frame": round(fc.mlp / 1e9, 3),
                "mfu": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
