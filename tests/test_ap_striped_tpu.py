"""Chip-only AP gate for the SHIPPING approximation stack.

The CPU suite's AP gates run at 1024 points where every production
approximation silently degrades to exact (``_blockwise_stripes`` returns 1,
the banded ball query and approx roipool are TPU-gated).  This test runs the
same two-stage train->eval->official-AP pipeline at the striped regime
(4096 points, stripes s>=2) on the real TPU backend, so the configuration
that produces the BENCH numbers — blockwise z-banded FPS, the band±1 SA1
ball query, approx_min_k roipool, the bf16 fused group-MLP kernels and the
pallas_gather BN-train grouping — is the one being AP-asserted.  This is
the reference's README-number regime (reference README.md:76-82 via
eval_rcnn.py:459-683) applied to the shipping config.

Skipped automatically off-chip; the CI-visible record of the chip run lives
in docs/ROUND_NOTES.md.  Run manually with:

    python -m pytest tests/test_ap_striped_tpu.py -x -q --no-header -p no:cacheprovider

(without the suite conftest forcing the CPU platform — i.e. from a checkout
where jax sees the TPU, override with POINTRCNN_ALLOW_TPU_TESTS=1.)
"""

import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def _on_chip() -> bool:
    # the suite conftest pins jax to CPU; this test only makes sense when the
    # process actually has the TPU backend AND the user opted in (it trains
    # two stages to convergence — minutes of chip time)
    if not os.environ.get("POINTRCNN_ALLOW_TPU_TESTS"):
        return False
    import jax

    return jax.default_backend() in ("tpu", "axon")


@pytest.mark.slow
@pytest.mark.skipif("not _on_chip()")
def test_striped_production_stack_reaches_ap(tmp_path):
    import ap_gate

    ret = ap_gate.run_gate(
        str(tmp_path / "work"), rpn_epochs=250, rcnn_epochs=150,
        num_samples=24, batch_size=4, set_cfgs=list(ap_gate.STRIPED_SET),
        n_points=4400, pts_per_obj=1200,
    )
    print("ap_gate(striped,tpu):", json.dumps({k: round(v, 2) for k, v in ret.items()}))

    # same floors as the exact-mode CPU gate (test_ap_convergence.py): the
    # approximation stack must not cost detection quality
    assert ret["roi_recall_0.5"] >= 0.9, ret
    assert ret["recall_0.7"] >= 0.85, ret
    assert ret["final_total"] >= 40, ret
    assert ret["Car_3d_easy"] >= 65.0, ret
    assert ret["Car_bev_easy"] >= 78.0, ret
