"""Op-level device-time table for the full two-stage eval forward.

Runs the flagship forward under ``jax.profiler.trace`` and aggregates the
device-stream op durations from the exported perfetto trace — the ground
truth for kernel targeting (the stage-jit decomposition in profile_eval.py
carries per-call overheads that don't exist in the fused graph).

Usage: python tools/trace_eval.py [--iters 8] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

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

    out = fwd(variables, batch)
    jax.device_get(out["rcnn_cls"])  # compile + sync

    tmpdir = tempfile.mkdtemp(prefix="trace_eval_")
    with jax.profiler.trace(tmpdir):
        for _ in range(args.iters):
            out = fwd(variables, batch)
        jax.device_get(out["rcnn_cls"])

    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace produced; files under", tmpdir)
        for p in glob.glob(os.path.join(tmpdir, "**", "*"), recursive=True):
            print(" ", p)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device-stream pids: find thread names that look like TPU/device streams
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    if not tot:
        print("pids seen:", pid_name)
        return

    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total_us = sum(tot.values())
    print(f"total device-op time: {total_us / 1e3 / args.iters:.2f} ms/iter "
          f"over {args.iters} iters   (streams: "
          f"{[pid_name[p] for p in dev_pids] or 'ALL'})")
    print(f"{'ms/iter':>9}  {'%':>5}  {'calls':>6}  op")
    for name, us in rows[: args.top]:
        print(f"{us / 1e3 / args.iters:9.3f}  {100 * us / total_us:5.1f}  "
              f"{cnt[name] // args.iters:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
