"""The detection-quality gate: train RPN then RCNN on the synthetic fixture
through the real CLIs, evaluate through the real joint-eval path (KITTI
result files + the official 11-point AP evaluator), and assert an absolute
AP.  This is the end-to-end proof that the assembled system detects objects
— the rung the reference climbs empirically against its README numbers
(eval_rcnn.py:459-683 -> eval.py:608-678, README.md:80).

Fixture/thresholds rationale: tools/ap_gate.py docstring.  Measured on this
recipe (round 4): Car_3d_easy 81.2, Car_bev_easy 90.9, recall@0.7(3D) 0.98,
45/48 detections.  The 11-point protocol caps AP at ~90.9 for a perfect
detector at 48 gt (threshold quantization), so the floors below are
comfortably inside what a healthy pipeline reproduces and far above what
any stage regression yields (a mis-assembled pipeline scores < 40; see the
DontCare-region and threshold-quantization traps the fixture design avoids).
"""

import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


@pytest.mark.slow
def test_two_stage_pipeline_reaches_ap(tmp_path):
    import ap_gate

    # 250/150 epochs measured Car_3d_easy 81.2 on this recipe; 180-epoch RPN
    # training landed at 65.4 — the extra RPN epochs buy the margin
    ret = ap_gate.run_gate(
        str(tmp_path / "work"), rpn_epochs=250, rcnn_epochs=150,
        num_samples=24, batch_size=4,
    )
    print("ap_gate:", json.dumps({k: round(v, 2) for k, v in ret.items()}))

    # this convergence run IS the multi-device training proof: in the
    # suite's 8-virtual-device environment, tools/train.py builds a 4-device
    # data mesh for batch 4 (the largest divisor), so BOTH stages train
    # hundreds of sharded donated steps — BN stats, OneCycle, checkpointing
    # all evolving under the mesh — and still hit the AP floors below
    # (reference analog: --mgpus DataParallel, train_rcnn.py:198-200)
    assert ret["mesh_devices"] == 4, ret

    # proposal stage healthy: every gt found at 0.5 3D IoU pre-refinement
    assert ret["roi_recall_0.5"] >= 0.9, ret
    # refinement lifts localization to 0.7 3D IoU for nearly every gt
    assert ret["recall_0.7"] >= 0.85, ret
    # nearly every gt survives score threshold + final NMS into the files
    assert ret["final_total"] >= 40, ret
    # official KITTI AP on the written result files
    assert ret["Car_3d_easy"] >= 65.0, ret
    assert ret["Car_bev_easy"] >= 78.0, ret
    assert ret["Car_image_easy"] >= 78.0, ret


@pytest.mark.slow
def test_multiclass_people_pipeline_reaches_ap(tmp_path):
    """Multi-class (People = Pedestrian + Cyclist) AP gate: the 3-class
    CrossEntropy head, per-class anchors in the bin codec, per-class NMS /
    result writing and the per-class official AP tables — the reference's
    Ped/Cyclist workflow (eval.py:608-678 multi-class AP over the
    cfgs/*people*.yaml configs).

    Measured on this recipe (round 5): under the suite's 4-device mesh
    Pedestrian_3d_easy 54.5, Cyclist_3d_easy 54.5, recall@0.7(3D) 0.92,
    45/48 detections (single-device: 45.5 / 54.5 / 0.81 / 40).  The
    11-point protocol quantizes these fixture APs to multiples of ~9.09
    (100/11), so the floors below sit at least one quantization notch under
    the measured values — a single lost recall decile fails them.
    """
    import ap_gate

    ret = ap_gate.run_gate(
        str(tmp_path / "work"), rpn_epochs=250, rcnn_epochs=150,
        num_samples=24, batch_size=4, cfg_file=ap_gate.AP_CFG_PEOPLE,
        classes=("Pedestrian", "Cyclist"),
    )
    print("ap_gate(people):", json.dumps({k: round(v, 2) for k, v in ret.items()}))

    # both stages trained under the 4-device data mesh (8-virtual-device env)
    assert ret["mesh_devices"] == 4, ret
    # refinement localizes most gt of BOTH classes to 0.7 3D IoU
    assert ret["recall_0.7"] >= 0.70, ret
    assert ret["final_total"] >= 32, ret
    # per-class official AP through the multi-class writer/evaluator chain
    assert ret["Pedestrian_3d_easy"] >= 40.0, ret
    assert ret["Cyclist_3d_easy"] >= 45.0, ret
    assert ret["Pedestrian_bev_easy"] >= 40.0, ret
    assert ret["Cyclist_bev_easy"] >= 45.0, ret
