import numpy as np

from pointrcnn_tpu.eval import kitti_eval


def make_anno(boxes7, names=None, scores=None, bbox_h=50.0):
    """boxes7: (N, 7) [x, y, z, l, h, w, ry] camera boxes."""
    n = len(boxes7)
    names = names or ["Car"] * n
    anno = {
        "name": np.array(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": np.array([b[6] for b in boxes7]),
        "bbox": np.array([[100 + 80 * i, 100, 160 + 80 * i, 100 + bbox_h] for i in range(n)]).reshape(n, 4),
        "dimensions": np.array([[b[3], b[4], b[5]] for b in boxes7]).reshape(n, 3),
        "location": np.array([b[0:3] for b in boxes7]).reshape(n, 3),
        "rotation_y": np.array([b[6] for b in boxes7]),
        "score": np.array(scores if scores is not None else [-10.0] * n),
    }
    return anno


def random_scene(rng, n):
    boxes = []
    for i in range(n):
        boxes.append(
            [rng.uniform(-20, 20), rng.uniform(0, 2), rng.uniform(5, 60),
             3.9, 1.5, 1.6, rng.uniform(-np.pi, np.pi)]
        )
    return boxes


def test_perfect_detections_ap_100():
    rng = np.random.RandomState(0)
    gt_annos, dt_annos = [], []
    for f in range(10):
        boxes = random_scene(rng, 6)
        gt_annos.append(make_anno(boxes))
        dt_annos.append(make_anno(boxes, scores=list(rng.uniform(0.5, 1.0, 6))))
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert abs(ret["Car_3d_easy"] - 100.0) < 1e-6, result
    assert abs(ret["Car_bev_easy"] - 100.0) < 1e-6
    assert abs(ret["Car_image_easy"] - 100.0) < 1e-6
    assert abs(ret["Car_aos_easy"] - 100.0) < 1e-6


def test_half_detections_lower_ap():
    rng = np.random.RandomState(1)
    gt_annos, dt_annos = [], []
    for f in range(10):
        boxes = random_scene(rng, 6)
        gt_annos.append(make_anno(boxes))
        # detect only half the objects
        dt_annos.append(make_anno(boxes[:3], scores=list(rng.uniform(0.5, 1.0, 3))))
    _, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert ret["Car_3d_easy"] < 60.0
    assert ret["Car_3d_easy"] > 10.0


def test_shifted_boxes_fail_07_but_match_05():
    """Boxes shifted so IoU lands between 0.5 and 0.7."""
    rng = np.random.RandomState(2)
    gt_annos, dt_annos = [], []
    for f in range(10):
        boxes = random_scene(rng, 6)
        shifted = [list(b) for b in boxes]
        for b in shifted:
            b[0] += 0.7  # shift along x: IoU approx (3.9-0.7)/(3.9+0.7) = 0.7-
        gt_annos.append(make_anno(boxes))
        dt_annos.append(make_anno(shifted, scores=list(rng.uniform(0.5, 1.0, 6))))
    _, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"])
    # strict 0.7-overlap 3D AP suffers; bbox 2D (identical bboxes) stays 100
    assert ret["Car_3d_easy"] < 50.0
    assert abs(ret["Car_image_easy"] - 100.0) < 1e-6


def test_difficulty_gating():
    """Small 2D box height -> gt ignored for easy, counted for moderate."""
    rng = np.random.RandomState(3)
    gt_annos, dt_annos = [], []
    for f in range(10):
        boxes = random_scene(rng, 6)
        gt_annos.append(make_anno(boxes, bbox_h=30.0))  # height 30 < 40 (easy min)
        dt_annos.append(make_anno(boxes, scores=list(rng.uniform(0.5, 1.0, 6)), bbox_h=30.0))
    _, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, ["Car"])
    # moderate AP is perfect; easy has no valid gt -> stays 0
    assert abs(ret["Car_3d_moderate"] - 100.0) < 1e-6
    assert ret["Car_3d_easy"] == 0.0


def test_image_box_overlap():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], float)
    got = kitti_eval.image_box_overlap(a, b)
    np.testing.assert_allclose(got[0, 0], 25 / 175, rtol=1e-6)
    assert got[0, 1] == 0.0


def test_get_thresholds():
    scores = np.linspace(1, 0, 100)
    th = kitti_eval.get_thresholds(scores.copy(), num_gt=100)
    assert len(th) == 41
    assert th[0] == scores[0]
    # thresholds are descending
    assert np.all(np.diff(th) <= 0)


def _random_annos(rng, n_frames=25, max_gt=12, max_dt=14):
    """Randomized gt/dt anno pairs exercising classes, DontCare, difficulty
    gates, and sub-threshold scores."""
    names = ["Car", "Van", "Pedestrian", "Cyclist", "DontCare", "Truck"]
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        ng = rng.randint(0, max_gt)
        nd = rng.randint(0, max_dt)

        def boxes(n, with_score):
            loc = np.stack([rng.uniform(-20, 20, n), rng.uniform(0, 2, n),
                            rng.uniform(5, 60, n)], 1)
            dims = np.stack([rng.uniform(2.5, 4.5, n), rng.uniform(1.2, 1.9, n),
                             rng.uniform(1.4, 1.9, n)], 1)  # l, h, w
            x1 = rng.uniform(0, 1100, n); y1 = rng.uniform(0, 300, n)
            bbox = np.stack([x1, y1, x1 + rng.uniform(20, 140, n),
                             y1 + rng.uniform(20, 120, n)], 1)
            d = {
                "name": np.array([names[rng.randint(0, len(names))] for _ in range(n)]),
                "truncated": rng.uniform(0, 0.6, n),
                "occluded": rng.randint(0, 4, n),
                "alpha": rng.uniform(-np.pi, np.pi, n),
                "bbox": bbox, "dimensions": dims, "location": loc,
                "rotation_y": rng.uniform(-np.pi, np.pi, n),
                "score": rng.uniform(0, 1, n) if with_score else np.full(n, -10.0),
            }
            return d

        gt = boxes(ng, False)
        dt = boxes(nd, True)
        dt["name"] = np.array(
            [n for n in dt["name"] if n != "DontCare"] +
            ["Car"] * int((dt["name"] == "DontCare").sum())
        )
        # make some detections overlap some gts so matching paths fire
        for j in range(min(ng, nd)):
            if rng.rand() < 0.6:
                dt["bbox"][j] = gt["bbox"][j] + rng.uniform(-8, 8, 4)
                dt["location"][j] = gt["location"][j] + rng.uniform(-0.4, 0.4, 3)
                dt["dimensions"][j] = gt["dimensions"][j] * rng.uniform(0.9, 1.1, 3)
                dt["rotation_y"][j] = gt["rotation_y"][j] + rng.uniform(-0.2, 0.2)
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_native_protocol_equivalence(monkeypatch):
    """The C++ AP kernels reproduce the Python oracle bit-for-bit on
    randomized annotations, for all 3 metrics (+AOS) and both overlap sets."""
    from pointrcnn_tpu.utils import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(11)
    gt_annos, dt_annos = _random_annos(rng)
    min_overlaps = np.stack([
        np.array([[0.7, 0.5], [0.7, 0.5], [0.7, 0.5]]),
        np.array([[0.7, 0.5], [0.5, 0.25], [0.5, 0.25]]),
    ], 0)  # (2, 3, 2 classes)

    results = {}
    for use_native in (True, False):
        if not use_native:
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_tried", True)
        for metric in (0, 1, 2):
            ret = kitti_eval.eval_class(
                gt_annos, dt_annos, [0, 1], [0, 1, 2], metric, min_overlaps,
                compute_aos=(metric == 0),
            )
            results[(use_native, metric)] = ret
        monkeypatch.undo()

    for metric in (0, 1, 2):
        a, b = results[(True, metric)], results[(False, metric)]
        np.testing.assert_array_equal(a["precision"], b["precision"])
        np.testing.assert_array_equal(a["recall"], b["recall"])
        np.testing.assert_array_equal(a["orientation"], b["orientation"])
