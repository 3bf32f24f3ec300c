"""Two-stage eval-forward throughput for an arbitrary config on TPU.

Same workload shape as bench.py (jitted RPN + proposal/NMS + roipool + RCNN
forward) but config-selectable, for the stretch configs:

    python tools/bench_forward.py cfgs/car_2x.yaml [batch]
    python tools/bench_forward.py cfgs/people.yaml [batch]

Prints one JSON line with fps + analytic MFU (utils/flops.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 3
ITERS = 20


def main():
    from pointrcnn_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_cloud
    from pointrcnn_tpu.config import load_config
    from pointrcnn_tpu.models.point_rcnn import PointRCNN, num_classes_for
    from pointrcnn_tpu.utils.flops import device_peak_flops, eval_forward_flops

    cfg_file = sys.argv[1] if len(sys.argv) > 1 else "cfgs/default.yaml"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = load_config(cfg_file)

    model = PointRCNN(cfg=cfg, mode="TEST")
    data = {"pts_input": jnp.asarray(_synthetic_cloud(batch, cfg.RPN.NUM_POINTS))}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "target": jax.random.PRNGKey(2),
    }
    variables = jax.jit(model.init, static_argnames="train")(rngs, data, train=False)
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))

    for _ in range(WARMUP):
        out = fwd(variables, data)
    jax.device_get(out["rcnn_cls"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(variables, data)
    jax.device_get(out["rcnn_cls"])
    dt = time.perf_counter() - t0

    fps = batch * ITERS / dt
    fc = eval_forward_flops(cfg, mode="TEST", num_classes=num_classes_for(cfg))
    peak, kind = device_peak_flops(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": "two_stage_eval_throughput",
                "config": os.path.basename(cfg_file),
                "batch": batch,
                "num_points": cfg.RPN.NUM_POINTS,
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "model_gflops_per_frame": round(fc.mlp / 1e9, 3),
                "mfu": round(fps * fc.mlp / peak, 4),
                "device": kind,
            }
        )
    )


if __name__ == "__main__":
    main()
