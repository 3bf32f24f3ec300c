"""Map profiler fusion names (fusion.NNN) back to model source locations via
the compiled HLO's op metadata.  Scratch tool for kernel targeting."""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4


def main():
    names = sys.argv[1:] or ["fusion.16", "fusion.674", "fusion.129",
                             "fusion.7", "fusion.6", "fusion.5",
                             "select_reduce_fusion", "subtract_convert_fusion",
                             "copy.1101", "copy.1105", "while.61", "while.50",
                             "fusion.49", "fusion.36", "approx_top_k.0"]
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
    compiled = fwd.lower(variables, batch).compile()
    hlo = compiled.as_text()

    # index: computation name -> the root/first instruction metadata lines
    for name in names:
        pat = re.compile(
            r"^\s*(?:ROOT )?[%\w.\-]*\s*=.*(?:fusion|custom-call|while)\(.*"
            + re.escape(name), re.M)
        # simpler: find 'name = ' definition lines and their metadata
        lines = [l for l in hlo.splitlines()
                 if re.search(r"%?" + re.escape(name) + r"\b\s*=", l)]
        print(f"== {name}: {len(lines)} defs")
        for l in lines[:3]:
            meta = re.search(r'metadata=\{([^}]*)\}', l)
            kind = re.search(r"=\s*\S+\s+(\w+)", l)
            calls = re.search(r"calls=([%\w.\-]+)", l)
            print("   kind:", kind.group(1) if kind else "?",
                  "| calls:", calls.group(1) if calls else "-")
            if meta:
                print("   meta:", meta.group(1)[:300])
            else:
                # look inside the called computation for metadata
                if calls:
                    cname = calls.group(1).lstrip("%")
                    m = re.search(re.escape(cname) + r"\s*\{(.*?)\n\}", hlo,
                                  re.S)
                    if m:
                        metas = re.findall(r'op_name="([^"]+)"', m.group(1))
                        uniq = []
                        for x in metas:
                            if x not in uniq:
                                uniq.append(x)
                        for x in uniq[:6]:
                            print("   op_name:", x[:240])


if __name__ == "__main__":
    main()
