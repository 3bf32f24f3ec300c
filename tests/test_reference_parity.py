"""Direct numeric parity against the REFERENCE's own torch modules.

Every other parity test in this suite compares against hand-transcribed
oracles; a transcription error there would be invisible.  These tests import
the reference's pure-torch/numpy modules from /root/reference (CPU torch is
installed in this container) and assert allclose against *their* outputs:

- ``decode_bbox_target``           (lib/utils/bbox_transform.py:24-121)
- ``get_reg_loss`` + focal/Dice/CE (lib/utils/loss_utils.py:7-233)
- box geometry, numpy + torch      (lib/utils/kitti_utils.py:32-160)
- ``generate_rpn_training_labels`` (lib/datasets/kitti_rcnn_dataset.py:364-394,
  real scipy Delaunay ``in_hull``)
- ``Calibration``                  (lib/utils/calibration.py:24-140)
- ``Object3d``                     (lib/utils/object3d.py:11-102)

The reference needs two import shims that do NOT touch the numerics under
test: an ``easydict`` stand-in (lib/config.py's dependency; not installed
here) and empty ``roipool3d_cuda``/``iou3d_cuda`` modules (GPU extensions;
none of the functions exercised below call into them).  ``torch.cuda
.FloatTensor`` is aliased to the CPU constructor for the same reason — the
reference allocates its one-hot scratch tensors with it unconditionally.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


class _AttrDict(dict):
    """Minimal easydict.EasyDict stand-in (attribute-style dict)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in dict(d or {}, **kwargs).items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, _AttrDict):
            value = _AttrDict(value)
        super().__setattr__(name, value)
        self[name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    __setitem__ = dict.__setitem__


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with the shims installed."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = _AttrDict
        sys.modules["easydict"] = m
    for cuda_ext in ("roipool3d_cuda", "iou3d_cuda"):
        sys.modules.setdefault(cuda_ext, types.ModuleType(cuda_ext))
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor  # CPU container
        # decode_bbox_target does anchor.to(roi.get_device()); on CPU
        # get_device() returns -1, which .to() rejects — map it to "cpu"
        orig_get_device = torch.Tensor.get_device

        def _get_device(self):
            d = orig_get_device(self)
            return "cpu" if isinstance(d, int) and d < 0 else d

        torch.Tensor.get_device = _get_device

    import lib.utils.bbox_transform as bbox_transform
    import lib.utils.calibration as calibration
    import lib.utils.kitti_utils as kitti_utils
    import lib.utils.loss_utils as loss_utils
    import lib.utils.object3d as object3d

    mods = {
        "bbox_transform": bbox_transform,
        "calibration": calibration,
        "kitti_utils": kitti_utils,
        "loss_utils": loss_utils,
        "object3d": object3d,
    }
    try:
        import lib.datasets.kitti_rcnn_dataset as kitti_rcnn_dataset

        mods["kitti_rcnn_dataset"] = kitti_rcnn_dataset
    except Exception:
        mods["kitti_rcnn_dataset"] = None
    return mods


def _rand_boxes(rng, n, degenerate_ok=False):
    """Plausible KITTI-range boxes (x, y, z, h, w, l, ry)."""
    boxes = np.empty((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-30, 30, n)
    boxes[:, 1] = rng.uniform(-1, 3, n)
    boxes[:, 2] = rng.uniform(0, 70, n)
    boxes[:, 3] = rng.uniform(1.2, 2.2, n)  # h
    boxes[:, 4] = rng.uniform(1.4, 2.0, n)  # w
    boxes[:, 5] = rng.uniform(3.0, 4.6, n)  # l
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


# --------------------------------------------------------------- box codec

DECODE_VARIANTS = [
    # (xz_fine, y_by_bin, ry_fine) — RPN coarse/fine and RCNN refinement
    (True, False, False),
    (False, False, False),   # published-ckpt RPN mode (LOC_XZ_FINE False)
    (True, False, True),     # RCNN refinement head
    (True, True, True),      # y-by-bin variant
    (False, True, False),
]


@pytest.mark.parametrize("xz_fine,y_by_bin,ry_fine", DECODE_VARIANTS)
@pytest.mark.parametrize("roi_kind", ["points3", "boxes7"])
def test_decode_bbox_target_vs_reference(ref, xz_fine, y_by_bin, ry_fine, roi_kind):
    from pointrcnn_tpu.utils.box_coder import decode_bbox_target, reg_channel_count

    rng = np.random.RandomState(0 if xz_fine else 1)
    n = 257
    loc_scope, loc_bin_size, num_head_bin = 3.0, 0.5, 12
    anchor = np.array([1.52, 1.63, 3.88], np.float32)
    C = reg_channel_count(loc_scope, loc_bin_size, num_head_bin, xz_fine, y_by_bin)
    pred = rng.randn(n, C).astype(np.float32)
    if roi_kind == "points3":
        roi = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    else:
        roi = _rand_boxes(rng, n)

    got = np.asarray(
        decode_bbox_target(
            roi, pred, loc_scope, loc_bin_size, num_head_bin, anchor,
            get_xz_fine=xz_fine, get_y_by_bin=y_by_bin, get_ry_fine=ry_fine,
        )
    )
    want = ref["bbox_transform"].decode_bbox_target(
        torch.from_numpy(roi.copy()), torch.from_numpy(pred),
        loc_scope, loc_bin_size, num_head_bin, torch.from_numpy(anchor),
        get_xz_fine=xz_fine, get_y_by_bin=y_by_bin, get_ry_fine=ry_fine,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ losses

def test_dice_loss_vs_reference(ref):
    from pointrcnn_tpu.utils.losses import dice_loss

    rng = np.random.RandomState(2)
    logits = rng.randn(4096).astype(np.float32) * 3
    target = rng.choice([-1, 0, 1], 4096).astype(np.float32)
    got = float(dice_loss(logits, target))
    want = float(
        ref["loss_utils"].DiceLoss(ignore_target=-1)(
            torch.from_numpy(logits), torch.from_numpy(target)
        )
    )
    assert abs(got - want) < 1e-5


def test_sigmoid_focal_loss_vs_reference(ref):
    from pointrcnn_tpu.utils.losses import sigmoid_focal_loss

    rng = np.random.RandomState(3)
    logits = rng.randn(2048, 1).astype(np.float32) * 4
    target = (rng.rand(2048, 1) > 0.7).astype(np.float32)
    weights = rng.rand(2048, 1).astype(np.float32)
    got = np.asarray(sigmoid_focal_loss(logits, target, weights))
    want = ref["loss_utils"].SigmoidFocalClassificationLoss()(
        torch.from_numpy(logits), torch.from_numpy(target), torch.from_numpy(weights)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sigmoid_ce_vs_reference(ref):
    from pointrcnn_tpu.utils.losses import sigmoid_cross_entropy_with_logits

    rng = np.random.RandomState(4)
    logits = rng.randn(1024).astype(np.float32) * 6
    labels = (rng.rand(1024) > 0.5).astype(np.float32)
    got = np.asarray(sigmoid_cross_entropy_with_logits(logits, labels))
    want = ref["loss_utils"]._sigmoid_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


REG_LOSS_VARIANTS = [
    # (xz_fine, y_by_bin, ry_fine, loc_scope, loc_bin_size, num_head_bin)
    (True, False, False, 3.0, 0.5, 12),    # RPN defaults (config.py RPN.*)
    (False, False, False, 3.0, 0.5, 12),
    (True, False, True, 1.5, 0.5, 9),      # RCNN defaults
    (True, True, True, 1.5, 0.5, 9),
]


@pytest.mark.parametrize(
    "xz_fine,y_by_bin,ry_fine,loc_scope,loc_bin_size,num_head_bin",
    REG_LOSS_VARIANTS,
)
def test_get_reg_loss_vs_reference(
    ref, xz_fine, y_by_bin, ry_fine, loc_scope, loc_bin_size, num_head_bin
):
    from pointrcnn_tpu.utils.box_coder import reg_channel_count
    from pointrcnn_tpu.utils.losses import get_reg_loss

    rng = np.random.RandomState(5)
    n = 128
    anchor = np.array([1.52, 1.63, 3.88], np.float32)
    C = reg_channel_count(loc_scope, loc_bin_size, num_head_bin, xz_fine, y_by_bin)
    pred = rng.randn(n, C).astype(np.float32)
    reg_label = np.empty((n, 7), np.float32)
    reg_label[:, 0] = rng.uniform(-loc_scope * 1.2, loc_scope * 1.2, n)  # incl. clamp edge
    reg_label[:, 1] = rng.uniform(-0.8, 0.8, n)
    reg_label[:, 2] = rng.uniform(-loc_scope * 1.2, loc_scope * 1.2, n)
    reg_label[:, 3:6] = anchor * rng.uniform(0.8, 1.25, (n, 3))
    reg_label[:, 6] = rng.uniform(-2 * np.pi, 2 * np.pi, n)

    # our masked-mean form, with a genuine mask: the reference sees only the
    # masked rows (it gathers fg rows with fancy indexing)
    fg_mask = rng.rand(n) > 0.4
    loc, angle, size, d = get_reg_loss(
        pred, reg_label, fg_mask, loc_scope, loc_bin_size, num_head_bin, anchor,
        get_xz_fine=xz_fine, get_y_by_bin=y_by_bin, get_ry_fine=ry_fine,
    )
    r_loc, r_angle, r_size, r_d = ref["loss_utils"].get_reg_loss(
        torch.from_numpy(pred[fg_mask]), torch.from_numpy(reg_label[fg_mask].copy()),
        loc_scope, loc_bin_size, num_head_bin, torch.from_numpy(anchor),
        get_xz_fine=xz_fine, get_y_by_bin=y_by_bin, get_ry_fine=ry_fine,
    )
    assert abs(float(loc) - float(r_loc)) < 1e-4
    assert abs(float(angle) - float(r_angle)) < 1e-4
    assert abs(float(size) - float(r_size)) < 1e-4
    for k in ("loss_x_bin", "loss_z_bin", "loss_ry_bin", "loss_ry_res"):
        assert abs(float(d[k]) - float(r_d[k])) < 1e-4, k


# ---------------------------------------------------------------- geometry

def test_rotate_pc_along_y_vs_reference(ref):
    from pointrcnn_tpu.utils import np_geometry

    rng = np.random.RandomState(6)
    pc = rng.randn(512, 5).astype(np.float32) * 10
    angle = float(rng.uniform(-np.pi, np.pi))
    got = np_geometry.rotate_pc_along_y(pc.copy(), angle)
    want = ref["kitti_utils"].rotate_pc_along_y(pc.copy(), angle)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rotate_pc_along_y_torch_vs_reference(ref):
    from pointrcnn_tpu.utils.box_ops import rotate_pc_along_y

    rng = np.random.RandomState(7)
    pc = rng.randn(64, 512, 4).astype(np.float32) * 10
    angle = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
    got = np.asarray(rotate_pc_along_y(pc, angle))
    want = ref["kitti_utils"].rotate_pc_along_y_torch(
        torch.from_numpy(pc.copy()), torch.from_numpy(angle)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_boxes3d_to_corners3d_vs_reference(ref):
    from pointrcnn_tpu.utils import box_ops, np_geometry

    rng = np.random.RandomState(8)
    boxes = _rand_boxes(rng, 96)
    want = ref["kitti_utils"].boxes3d_to_corners3d(boxes.copy(), rotate=True)
    np.testing.assert_allclose(
        np_geometry.boxes3d_to_corners3d(boxes), want, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(box_ops.boxes3d_to_corners3d(boxes)), want, rtol=1e-3, atol=1e-3
    )
    # torch variant too
    want_t = ref["kitti_utils"].boxes3d_to_corners3d_torch(
        torch.from_numpy(boxes.copy())
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(box_ops.boxes3d_to_corners3d(boxes)), want_t, rtol=1e-3, atol=1e-3
    )


def test_boxes3d_to_bev_vs_reference(ref):
    from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev

    rng = np.random.RandomState(9)
    boxes = _rand_boxes(rng, 128)
    got = np.asarray(boxes3d_to_bev(boxes))
    want = ref["kitti_utils"].boxes3d_to_bev_torch(torch.from_numpy(boxes)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_enlarge_box3d_vs_reference(ref):
    from pointrcnn_tpu.utils import box_ops, np_geometry

    rng = np.random.RandomState(10)
    boxes = _rand_boxes(rng, 64)
    for extra in (0.2, 1.0):
        want = ref["kitti_utils"].enlarge_box3d(boxes.copy(), extra_width=extra)
        np.testing.assert_allclose(
            np_geometry.enlarge_box3d(boxes, extra), want, rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(box_ops.enlarge_box3d(boxes, extra)), want,
            rtol=1e-6, atol=1e-6,
        )


def test_in_hull_vs_oriented_box_test(ref):
    """The Delaunay in_hull fg test (kitti_utils.py:163-177) vs our exact
    oriented-box test — SURVEY §7 claims equivalence for boxes; measure it."""
    from pointrcnn_tpu.utils.np_geometry import points_in_boxes3d

    rng = np.random.RandomState(11)
    boxes = _rand_boxes(rng, 12)
    corners = ref["kitti_utils"].boxes3d_to_corners3d(boxes, rotate=True)
    # points clustered around the boxes so plenty land inside
    pts = np.concatenate([
        b[None, 0:3] + rng.randn(400, 3).astype(np.float32)
        * np.array([2.5, 1.2, 2.5], np.float32)
        for b in boxes
    ])
    ours = points_in_boxes3d(pts, boxes)  # (M, N)
    for k in range(boxes.shape[0]):
        want = ref["kitti_utils"].in_hull(pts, corners[k])
        assert np.sum(want) > 10  # the cluster actually hits the box
        # identical up to points within float-eps of a face
        disagree = np.flatnonzero(ours[k] != want)
        assert disagree.size <= max(1, int(0.001 * pts.shape[0])), (
            f"box {k}: {disagree.size} disagreements"
        )


# ---------------------------------------------------------- label generator

def test_rpn_training_labels_vs_reference(ref):
    """Host + device label generators vs the reference's own staticmethod
    (real Delaunay in_hull), incl. overlapping boxes (last-box-wins)."""
    if ref["kitti_rcnn_dataset"] is None:
        pytest.skip("reference kitti_rcnn_dataset not importable")
    import jax.numpy as jnp

    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.train.labels import rpn_training_labels

    rng = np.random.RandomState(12)
    boxes = _rand_boxes(rng, 8)
    # force overlaps: boxes 6/7 duplicate 0/1 shifted slightly
    boxes[6] = boxes[0]
    boxes[6, 0] += 0.5
    boxes[7] = boxes[1]
    boxes[7, 2] += 0.4
    pts = np.concatenate([
        b[None, 0:3] + rng.randn(300, 3).astype(np.float32)
        * np.array([2.5, 1.0, 2.5], np.float32)
        for b in boxes
    ]).astype(np.float32)

    want_cls, want_reg = ref["kitti_rcnn_dataset"].KittiRCNNDataset.\
        generate_rpn_training_labels(pts, boxes)
    got_cls, got_reg = KittiRCNNDataset.generate_rpn_training_labels(pts, boxes)

    fg_both = (want_cls == 1) & (got_cls == 1)
    disagree = np.sum(want_cls != got_cls)
    # Delaunay vs exact box test may differ within float-eps of a face
    assert disagree <= max(1, int(0.002 * pts.shape[0])), disagree
    np.testing.assert_allclose(
        got_reg[fg_both], want_reg[fg_both], rtol=1e-4, atol=1e-4
    )

    # device generator on the same scene (padded with invalid boxes)
    pad = np.zeros((4, 7), np.float32)
    gt = np.concatenate([boxes, pad]).astype(np.float32)
    valid = np.array([True] * 8 + [False] * 4)
    dev_cls, dev_reg = rpn_training_labels(
        jnp.asarray(pts), jnp.asarray(gt), jnp.asarray(valid)
    )
    dev_cls, dev_reg = np.asarray(dev_cls), np.asarray(dev_reg)
    assert np.sum(dev_cls != want_cls) <= max(1, int(0.002 * pts.shape[0]))
    fg_both_d = (want_cls == 1) & (dev_cls == 1)
    np.testing.assert_allclose(
        dev_reg[fg_both_d], want_reg[fg_both_d], rtol=1e-4, atol=1e-4
    )


# -------------------------------------------------------------- calibration

CALIB_TEXT = """P0: 7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P1: 7.215377e+02 0.000000e+00 6.095593e+02 -3.875744e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P2: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P3: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
R0_rect: 9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01
Tr_velo_to_cam: 7.533745e-03 -9.999714e-01 -6.166020e-04 -4.069766e-03 1.480249e-02 7.280733e-04 -9.998902e-01 -7.631618e-02 9.998621e-01 7.523790e-03 1.480755e-02 -2.717806e-01
Tr_imu_to_velo: 9.999976e-01 7.553071e-04 -2.035826e-03 -8.086759e-01 -7.854027e-04 9.998898e-01 -1.482298e-02 3.195559e-01 2.024406e-03 1.482454e-02 9.998881e-01 -7.997231e-01
"""


def test_calibration_vs_reference(ref, tmp_path):
    from pointrcnn_tpu.data.calibration import Calibration

    f = tmp_path / "000000.txt"
    f.write_text(CALIB_TEXT)
    ours, theirs = Calibration(str(f)), ref["calibration"].Calibration(str(f))

    rng = np.random.RandomState(13)
    pts_lidar = rng.uniform([-40, -40, -3], [40, 40, 1], (500, 3)).astype(np.float32)
    np.testing.assert_allclose(
        ours.lidar_to_rect(pts_lidar), theirs.lidar_to_rect(pts_lidar),
        rtol=1e-4, atol=1e-4,
    )
    pts_rect = theirs.lidar_to_rect(pts_lidar)
    pts_rect[:, 2] = np.abs(pts_rect[:, 2]) + 1.0  # in front of the camera
    img_ours, d_ours = ours.rect_to_img(pts_rect)
    img_ref, d_ref = theirs.rect_to_img(pts_rect)
    np.testing.assert_allclose(img_ours, img_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-4, atol=1e-4)

    u = rng.uniform(0, 1200, 300)
    v = rng.uniform(0, 370, 300)
    depth = rng.uniform(1, 70, 300)
    np.testing.assert_allclose(
        ours.img_to_rect(u, v, depth), theirs.img_to_rect(u, v, depth),
        rtol=1e-4, atol=1e-4,
    )

    boxes = _rand_boxes(rng, 16)
    boxes[:, 2] = np.abs(boxes[:, 2]) + 5.0
    corners = ref["kitti_utils"].boxes3d_to_corners3d(boxes, rotate=True)
    got_boxes, got_corners = ours.corners3d_to_img_boxes(corners)
    want_boxes, want_corners = theirs.corners3d_to_img_boxes(corners)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got_corners, want_corners, rtol=1e-4, atol=1e-3)


# ------------------------------------------------------------------ labels

LABEL_LINE = (
    "Car 0.00 1 -1.58 587.01 173.33 614.12 200.12 "
    "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59"
)


def test_object3d_vs_reference(ref):
    from pointrcnn_tpu.data.object3d import Object3d

    ours, theirs = Object3d(LABEL_LINE), ref["object3d"].Object3d(LABEL_LINE)
    assert ours.cls_type == theirs.cls_type
    assert ours.level == theirs.level
    # the reference spells it 'trucation' (object3d.py:14)
    assert np.isclose(ours.truncation, theirs.trucation)
    for attr in ("occlusion", "alpha", "h", "w", "l", "ry", "score"):
        assert np.isclose(getattr(ours, attr), getattr(theirs, attr)), attr
    np.testing.assert_allclose(ours.pos, theirs.pos)
    np.testing.assert_allclose(ours.box2d, theirs.box2d)
    assert ours.to_kitti_format() == theirs.to_kitti_format()
