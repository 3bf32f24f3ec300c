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


# ----------------------------------------------- reference-code AP parity


def _rotate_iou_gpu_eval(boxes, qboxes, criterion=-1):
    """Stand-in for the reference's numba.cuda rotate_iou_gpu_eval
    (rotate_iou.py:294): same (N, 5) [x, z, x_dim, y_dim, ry] rbbox layout
    and criterion semantics (devRotateIoUEval rotate_iou.py:248: -1 IoU,
    0/1 one-sided, else raw intersection area), rotated overlap from this
    repo's shapely-pinned host twin."""
    from pointrcnn_tpu.utils import native

    a = np.asarray(boxes, np.float32)
    b = np.asarray(qboxes, np.float32)

    def rects(x):
        return np.stack(
            [x[:, 0] - x[:, 2] / 2, x[:, 1] - x[:, 3] / 2,
             x[:, 0] + x[:, 2] / 2, x[:, 1] + x[:, 3] / 2, x[:, 4]], 1)

    inter = native.bev_overlap(rects(a), rects(b)).astype(np.float32)
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None, :]
    if criterion == -1:
        return inter / np.maximum(area_a + area_b - inter, 1e-12)
    if criterion == 0:
        return inter / np.maximum(area_a, 1e-12)
    if criterion == 1:
        return inter / np.maximum(area_b, 1e-12)
    return inter


def _load_reference_eval():
    """Import the reference's tools/kitti_object_eval_python/eval.py in pure
    python: numba stubbed to identity decorators (the kernels are plain
    nested-loop python), the numba.cuda rotated IoU replaced by the host
    twin above."""
    import importlib.util
    import sys
    import types

    if "ref_kitti_eval" in sys.modules:
        return sys.modules["ref_kitti_eval"]

    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")

        def jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        nb.jit = jit
        nb.prange = range
        sys.modules["numba"] = nb

    pkg = sys.modules.setdefault("tools", types.ModuleType("tools"))
    if not hasattr(pkg, "__path__"):
        pkg.__path__ = []
    sub = sys.modules.setdefault(
        "tools.kitti_object_eval_python",
        types.ModuleType("tools.kitti_object_eval_python"))
    if not hasattr(sub, "__path__"):
        sub.__path__ = []
    riou = types.ModuleType("tools.kitti_object_eval_python.rotate_iou")
    riou.rotate_iou_gpu_eval = _rotate_iou_gpu_eval
    sys.modules["tools.kitti_object_eval_python.rotate_iou"] = riou
    pkg.kitti_object_eval_python = sub
    sub.rotate_iou = riou

    spec = importlib.util.spec_from_file_location(
        "ref_kitti_eval",
        "/root/reference/tools/kitti_object_eval_python/eval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_kitti_eval"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_official_ap_matches_reference_eval_code():
    """get_official_eval_result parity against the reference's OWN eval.py
    (eval.py:608-678 + the full numba statistics stack underneath it,
    running as plain python): identical mAP numbers for bbox/bev/3d/aos on
    randomized annotations.  This converts the 'transcribed AP protocol'
    into a measured equivalence."""
    import copy

    ref = _load_reference_eval()
    rng = np.random.RandomState(123)
    # >=50 frames: the reference partitions into 50 parts and
    # crashes on empty parts (eval.py get_split_parts)
    gt_annos, dt_annos = _random_annos(rng, n_frames=60)

    ref_str, ref_ret = ref.get_official_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Car"])
    our_str, our_ret = kitti_eval.get_official_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Car"])

    # ours additionally reports aos keys; the reference ret_dict stops at
    # image/bev/3d (eval.py:661-672) — compare its keys, then aos via do_eval
    assert set(ref_ret) <= set(our_ret), (sorted(our_ret), sorted(ref_ret))
    for k in sorted(ref_ret):
        np.testing.assert_allclose(our_ret[k], ref_ret[k], rtol=0,
                                   atol=1e-6, err_msg=k)

    min_overlaps = np.stack([
        np.array([[0.7, 0.5, 0.5, 0.7, 0.5]] * 3),
        np.array([[0.7, 0.5, 0.5, 0.7, 0.5],
                  [0.5, 0.25, 0.25, 0.5, 0.25],
                  [0.5, 0.25, 0.25, 0.5, 0.25]]),
    ], 0)[:, :, [0]]
    *_, ref_aos = ref.do_eval(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), [0], min_overlaps,
        True)
    for d, name in enumerate(("easy", "moderate", "hard")):
        np.testing.assert_allclose(
            our_ret[f"Car_aos_{name}"], ref_aos[0, d, 0], rtol=0, atol=1e-6,
            err_msg=f"aos {name}")

    # multi-class protocol too (Pedestrian/Cyclist rows of min_overlaps)
    ref_str2, ref_ret2 = ref.get_official_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Pedestrian"])
    our_str2, our_ret2 = kitti_eval.get_official_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Pedestrian"])
    for k in sorted(ref_ret2):
        # the reference hardcodes 'Car_*' ret_dict keys for every class
        # (eval.py:668-676); ours names them by the evaluated class
        np.testing.assert_allclose(
            our_ret2[k.replace("Car_", "Pedestrian_")], ref_ret2[k],
            rtol=0, atol=1e-6, err_msg=k)


def test_coco_ap_matches_reference_eval_code(monkeypatch):
    """get_coco_eval_result / do_coco_style_eval parity against the
    reference's OWN eval.py (eval.py:590-606, 681-740): identical averaged
    AP over the overlap-threshold linspace."""
    import copy

    # numpy>=1.20 compat shim: the reference unpacks a float64 count into
    # np.linspace (eval.py:593-596), accepted by the numpy of its era
    real_linspace = np.linspace
    monkeypatch.setattr(
        np, "linspace",
        lambda lo, hi, num=50, **kw: real_linspace(lo, hi, int(num), **kw))

    ref = _load_reference_eval()
    rng = np.random.RandomState(321)
    gt_annos, dt_annos = _random_annos(rng, n_frames=60)

    ref_str = ref.get_coco_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Car"])
    our_str, our_ret = kitti_eval.get_coco_eval_result(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), ["Car"])
    # the reference returns only the formatted string; its numbers are
    # %.2f-rounded — compare the numeric lines verbatim
    ref_lines = [l.strip() for l in ref_str.strip().splitlines()]
    our_lines = [l.strip() for l in our_str.strip().splitlines()]
    assert ref_lines == our_lines, (ref_lines, our_lines)

    # and the unrounded arrays via do_coco_style_eval
    overlap_ranges = np.zeros([3, 3, 1])
    overlap_ranges[:, :, 0] = np.array([0.5, 0.95, 10])[:, None]
    ref_vals = ref.do_coco_style_eval(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), [0],
        overlap_ranges, True)
    our_vals = kitti_eval.do_coco_style_eval(
        copy.deepcopy(gt_annos), copy.deepcopy(dt_annos), [0],
        overlap_ranges, True)
    for rv, ov, name in zip(ref_vals, our_vals, ("bbox", "bev", "3d", "aos")):
        np.testing.assert_allclose(ov, rv, rtol=0, atol=1e-6, err_msg=name)


def test_filter_annos_low_score():
    rng = np.random.RandomState(5)
    _, dt_annos = _random_annos(rng, n_frames=8)
    thresh = 0.5
    kept = kitti_eval.filter_annos_low_score(
        [dict(a) for a in dt_annos], thresh)
    for orig, new in zip(dt_annos, kept):
        mask = orig["score"] >= thresh
        assert (new["score"] >= thresh).all()
        assert len(new["score"]) == int(mask.sum())
        np.testing.assert_array_equal(new["bbox"], orig["bbox"][mask])


def test_label_parser_matches_reference_kitti_common(tmp_path):
    """get_label_anno(s) parity with the reference's kitti_common.py
    (result-txt parsing feeds the AP evaluator; reference
    kitti_common.py:293-346), incl. the hwl->lhw dimension reorder, the
    16-column score detection, and empty files."""
    import importlib.util
    import sys
    import types

    if "skimage" not in sys.modules:  # kitti_common imports skimage.io
        sk = types.ModuleType("skimage")
        sk.io = types.ModuleType("skimage.io")
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk.io
    spec = importlib.util.spec_from_file_location(
        "ref_kitti_common",
        "/root/reference/tools/kitti_object_eval_python/kitti_common.py")
    kc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kc)

    rng = np.random.RandomState(9)
    names = ["Car", "Pedestrian", "DontCare"]
    for idx, with_score in ((0, True), (1, False), (2, True)):
        lines = []
        n = (0, 3, 5)[idx]
        for i in range(n):
            vals = [names[rng.randint(3)], f"{rng.rand():.2f}",
                    str(rng.randint(0, 4)), f"{rng.uniform(-3, 3):.2f}"]
            vals += [f"{v:.2f}" for v in rng.uniform(0, 1200, 4)]   # bbox
            vals += [f"{v:.2f}" for v in rng.uniform(1, 4, 3)]      # h w l
            vals += [f"{v:.2f}" for v in rng.uniform(-30, 60, 3)]   # xyz
            vals += [f"{rng.uniform(-3, 3):.2f}"]                   # ry
            if with_score:
                vals += [f"{rng.rand():.4f}"]
            lines.append(" ".join(vals))
        (tmp_path / f"{idx:06d}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))

    ref_annos = kc.get_label_annos(str(tmp_path), image_ids=[0, 1, 2])
    our_annos = kitti_eval.get_label_annos(str(tmp_path), image_ids=[0, 1, 2])

    assert len(ref_annos) == len(our_annos) == 3
    for r, o in zip(ref_annos, our_annos):
        for k in ("name", "truncated", "occluded", "alpha", "bbox",
                  "dimensions", "location", "rotation_y", "score"):
            assert k in o, k
            np.testing.assert_array_equal(np.asarray(o[k]), np.asarray(r[k]),
                                          err_msg=k)
