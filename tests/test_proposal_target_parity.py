"""ProposalTargetLayer distributional parity vs the reference's OWN code.

The reference's RoI target sampler (lib/rpn/proposal_target_layer.py:14-341)
is stochastic (np.random permutations, torch.rand jitters, retry-until-IoU
while loops), so unlike the deterministic network forwards it cannot be
pinned sample-for-sample.  Instead the REAL reference class runs here on CPU
(CUDA extensions supplied by tests/ref_cuda_ext_torch.py) for many seeded
trials on a fixed scene, our vmapped fixed-shape layer
(pointrcnn_tpu/models/target.py) runs for the same number of keys, and the
induced *training-target distributions* must agree:

- label composition: P(cls_label == 1 / 0 / -1), reg_valid fraction
- IoU-after-jitter distribution of the sampled rois (mean/std, fg and bg)
- post-jitter roi displacement from the pre-jitter candidates
- canonical-transform outputs: center offsets, heading, pooled-point stats

Both documented deviations of our layer (docs/PARITY.md "Known intentional
deviations" #3 and #4) are covered: #3 (symmetric vs negatively-biased
per-roi rotation augmentation) is *measured* in
test_rotation_bias_deviation_is_canonical_noop — the reference's own
data_augmentation applied to a canonicalised scene shows the rotation angle
cancels out of every training target, so the [-pi/18, 0) bias cannot change
the training distribution; #4 (degenerate scenes masked instead of the
reference's pdb crash) is asserted directly on our layer since the
reference's branch is a crash by construction.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

from test_reference_parity import _AttrDict  # noqa: E402

from pointrcnn_tpu.config import default_config  # noqa: E402
from pointrcnn_tpu.utils.np_geometry import boxes_iou3d as boxes_iou3d_np  # noqa: E402

R_PER_IMAGE = 16
NUM_POOL_PTS = 64
AUG_TIMES = 10


@pytest.fixture(scope="module")
def ref_layer():
    """Import the reference ProposalTargetLayer with CPU shims installed."""
    import ref_cuda_ext_torch

    for p in (REF_ROOT,):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = _AttrDict
        sys.modules["easydict"] = m
    ref_cuda_ext_torch.install()

    from lib.config import cfg as ref_cfg
    from lib.rpn.proposal_target_layer import ProposalTargetLayer

    c = ref_cfg.RCNN
    c.ROI_PER_IMAGE = R_PER_IMAGE
    c.FG_RATIO = 0.5
    c.HARD_BG_RATIO = 0.6
    c.CLS_FG_THRESH = 0.6
    c.CLS_BG_THRESH = 0.45
    c.CLS_BG_THRESH_LO = 0.05
    c.REG_FG_THRESH = 0.55
    c.ROI_FG_AUG_TIMES = AUG_TIMES
    c.REG_AUG_METHOD = "multiple"
    c.NUM_POINTS = NUM_POOL_PTS
    c.POOL_EXTRA_WIDTH = 1.0
    c.USE_INTENSITY = False
    c.USE_DEPTH = True
    ref_cfg.AUG_DATA = False
    ref_cfg.AUG_ROT_RANGE = 18
    return types.SimpleNamespace(cfg=ref_cfg, layer=ProposalTargetLayer())


def our_cfg():
    cfg = default_config()
    cfg.RCNN.ENABLED = True
    cfg.RCNN.ROI_PER_IMAGE = R_PER_IMAGE
    cfg.RCNN.ROI_FG_AUG_TIMES = AUG_TIMES
    cfg.RCNN.NUM_POINTS = NUM_POOL_PTS
    cfg.RCNN.USE_INTENSITY = False
    cfg.RCNN.ROIPOOL_METHOD = "exact"
    cfg.AUG_DATA = False
    return cfg.freeze()


def _shifted(box, frac):
    """Shift a (7,) box along its local length axis by ``frac`` of length
    (same-footprint boxes: BEV/3D IoU = (1-r)/(1+r) with r = |frac|)."""
    x, y, z, h, w, l, ry = box
    return np.array(
        [x + frac * l * np.cos(ry), y, z - frac * l * np.sin(ry), h, w, l, ry],
        np.float32,
    )


def make_scene(seed=0):
    """Fixed scene: 2 gt boxes per image with controlled fg / hard-bg /
    easy-bg roi populations, plus points inside every box so pooling is
    non-empty."""
    rng = np.random.RandomState(seed)
    B, G, N = 2, 2, 512

    gt = np.zeros((B, 4, 7), np.float32)  # zero-padded to 4 (ref crops)
    gt_valid = np.zeros((B, 4), bool)
    rois = np.zeros((B, 24, 7), np.float32)
    for b in range(B):
        for g in range(G):
            box = np.array(
                [rng.uniform(-6, 6), 1.0, 12.0 + 14.0 * g + 4 * b, 1.5, 1.6,
                 3.9, rng.uniform(-np.pi, np.pi)],
                np.float32,
            )
            gt[b, g] = box
            gt_valid[b, g] = True
            base = g * 6
            # fg: IoU ~ 0.92 / 0.74 / 0.62; hard bg: ~0.35 / 0.23 / 0.10
            for i, frac in enumerate((0.04, 0.15, 0.235, 0.48, 0.62, 0.82)):
                rois[b, base + i] = _shifted(box, frac if (b + i) % 2 else -frac)
        # easy bg: far from both gt, inside the point field
        for i in range(12, 24):
            rois[b, i] = [rng.uniform(-14, 14), 1.0, rng.uniform(40, 64),
                          1.5, 1.6, 3.9, rng.uniform(-np.pi, np.pi)]

    # sanity: the intended populations exist
    for b in range(B):
        iou = boxes_iou3d_np(rois[b], gt[b, :G])
        mo = iou.max(axis=1)
        assert (mo >= 0.55).sum() >= 4, mo
        assert ((mo >= 0.05) & (mo < 0.45)).sum() >= 4, mo
        assert (mo < 0.05).sum() >= 10, mo

    pts = np.zeros((B, N, 3), np.float32)
    n_box = 16  # points per roi/gt neighborhood
    cursor = 0
    for b in range(B):
        boxes_all = np.concatenate([gt[b, :G], rois[b]], axis=0)
        cursor = 0
        for box in boxes_all:
            x, y, z, h, w, l, ry = box
            local = np.stack(
                [rng.uniform(-l / 2, l / 2, n_box),
                 rng.uniform(-h, 0, n_box),
                 rng.uniform(-w / 2, w / 2, n_box)], axis=1)
            c, s = np.cos(ry), np.sin(ry)
            pts[b, cursor:cursor + n_box, 0] = x + local[:, 0] * c + local[:, 2] * s
            pts[b, cursor:cursor + n_box, 1] = y + local[:, 1]
            pts[b, cursor:cursor + n_box, 2] = z - local[:, 0] * s + local[:, 2] * c
            cursor += n_box
        pts[b, cursor:, 0] = rng.uniform(-20, 20, N - cursor)
        pts[b, cursor:, 1] = rng.uniform(0, 2, N - cursor)
        pts[b, cursor:, 2] = rng.uniform(5, 70, N - cursor)

    feats = rng.normal(0, 1, (B, N, 8)).astype(np.float32)
    seg = (rng.rand(B, N) > 0.5).astype(np.float32)
    depth = np.linalg.norm(pts, axis=2).astype(np.float32)
    return pts, feats, seg, depth, rois, gt, gt_valid, G


def _stats(out):
    """Per-trial summary statistics of one layer output (numpy dict)."""
    cls = np.asarray(out["cls_label"]).reshape(-1)
    iou = np.asarray(out["gt_iou"]).reshape(-1)
    reg = np.asarray(out["reg_valid_mask"]).reshape(-1)
    gt_c = np.asarray(out["gt_of_rois"]).reshape(-1, 7)
    roi = np.asarray(out["roi_boxes3d"]).reshape(-1, 7)
    pts = np.asarray(out["sampled_pts"]).reshape(-1, NUM_POOL_PTS, 3)
    fg = cls == 1
    s = {
        "p_fg": (cls == 1).mean(),
        "p_bg": (cls == 0).mean(),
        "p_ignore": (cls == -1).mean(),
        "p_reg": reg.mean(),
        "iou_mean": iou.mean(),
        "iou_std": iou.std(),
        "iou_fg_mean": iou[fg].mean() if fg.any() else 0.0,
        "ctr_xz": np.linalg.norm(gt_c[fg][:, [0, 2]], axis=1).mean() if fg.any() else 0.0,
        "ctr_y": np.abs(gt_c[fg][:, 1]).mean() if fg.any() else 0.0,
        "head_cos": np.cos(gt_c[fg][:, 6]).mean() if fg.any() else 0.0,
        "head_sin": np.sin(gt_c[fg][:, 6]).mean() if fg.any() else 0.0,
        "size_hwl": gt_c[fg][:, 3:6].mean() if fg.any() else 0.0,
        "roi_h": roi[:, 3].mean(),
        "pts_norm": np.linalg.norm(pts[fg], axis=2).mean() if fg.any() else 0.0,
    }
    return s


def run_reference(ref_layer, scene, trials):
    pts, feats, seg, depth, rois, gt, gt_valid, G = scene
    recs = []
    for t in range(trials):
        np.random.seed(10_000 + t)
        torch.manual_seed(20_000 + t)
        input_dict = {
            "roi_boxes3d": torch.from_numpy(rois.copy()),
            "gt_boxes3d": torch.from_numpy(gt.copy()),
            "rpn_xyz": torch.from_numpy(pts.copy()),
            "rpn_features": torch.from_numpy(feats.copy()),
            "seg_mask": torch.from_numpy(seg.copy()),
            "pts_depth": torch.from_numpy(depth.copy()),
        }
        with torch.no_grad():
            out = ref_layer.layer.forward(input_dict)
        recs.append(_stats({k: v.numpy() for k, v in out.items()}))
    return recs


def run_ours(cfg, scene, trials):
    import jax
    import jax.numpy as jnp

    from pointrcnn_tpu.models.target import proposal_target_layer

    pts, feats, seg, depth, rois, gt, gt_valid, G = scene
    roi_valid = np.ones(rois.shape[:2], bool)
    args = tuple(
        jnp.asarray(a) for a in
        (rois, roi_valid, gt[:, :, :7], gt_valid, pts, feats, seg, depth)
    )
    recs = []
    for t in range(trials):
        out = proposal_target_layer(cfg, jax.random.PRNGKey(t), *args)
        recs.append(_stats({k: np.asarray(v) for k, v in out.items()}))
    return recs


def compare(ref_recs, our_recs, keys, n_sigma=6.0, floor=0.015):
    """Means of each per-trial statistic agree within n_sigma combined
    standard errors (plus a small absolute floor for near-constant stats)."""
    msgs = []
    for k in keys:
        a = np.array([r[k] for r in ref_recs], np.float64)
        b = np.array([r[k] for r in our_recs], np.float64)
        se = np.sqrt(a.var() / len(a) + b.var() / len(b))
        tol = n_sigma * se + floor
        if abs(a.mean() - b.mean()) > tol:
            msgs.append(
                f"{k}: ref {a.mean():.4f}±{a.std():.4f} vs ours "
                f"{b.mean():.4f}±{b.std():.4f} (tol {tol:.4f})"
            )
    assert not msgs, "\n".join(msgs)


STAT_KEYS = [
    "p_fg", "p_bg", "p_ignore", "p_reg", "iou_mean", "iou_std", "iou_fg_mean",
    "ctr_xz", "ctr_y", "head_cos", "head_sin", "size_hwl", "roi_h", "pts_norm",
]


@pytest.mark.slow
def test_target_distributions_match_reference(ref_layer):
    """Seeded-statistics comparison of every training-target distribution
    (reference sample_rois_for_rcnn + aug_roi_by_noise_torch + pooling +
    canonical transform vs models/target.py)."""
    scene = make_scene(seed=5)
    trials = 150
    ref_layer.cfg.AUG_DATA = False
    ref_recs = run_reference(ref_layer, scene, trials)
    our_recs = run_ours(our_cfg(), scene, trials)
    compare(ref_recs, our_recs, STAT_KEYS)


@pytest.mark.slow
def test_fg_composition_is_deterministic_given_scene(ref_layer):
    """With more fg candidates than the fg budget and bg available, BOTH
    implementations fill exactly round(FG_RATIO*R) fg slots every trial
    (reference proposal_target_layer.py:122-131)."""
    scene = make_scene(seed=5)
    ref_layer.cfg.AUG_DATA = False
    ref_recs = run_reference(ref_layer, scene, 30)
    our_recs = run_ours(our_cfg(), scene, 30)
    # 6 fg candidates per image < budget 8 -> fg slots = 6 of 16 = 0.375,
    # minus the aug failures that fall below CLS_FG_THRESH (rare at these
    # source IoUs).  Both sides must show the same tight band.
    a = np.array([r["p_fg"] for r in ref_recs])
    b = np.array([r["p_fg"] for r in our_recs])
    assert a.max() <= 6 / 16 + 1e-9 and b.max() <= 6 / 16 + 1e-9
    assert a.mean() > 0.30 and b.mean() > 0.30, (a.mean(), b.mean())


def test_rotation_bias_deviation_is_canonical_noop(ref_layer):
    """Measured effect of documented deviation #3 (docs/PARITY.md).

    The reference's per-roi rotation augmentation draws angles from
    (rand - 0.5/0.5) * pi/AUG_ROT_RANGE = [-pi/18, 0) — negatively biased
    (proposal_target_layer.py:295); ours is symmetric.  This test runs the
    reference's OWN data_augmentation and shows the rotation angle cancels
    out of every canonical training target: pooled pts, rois and gt rotate
    together, and the alpha-preserving ry recompute shifts roi and gt
    headings by the same amount, so gt-minus-roi targets are invariant.
    Hence any angle distribution — biased or symmetric — yields the same
    training distribution, and the deviation is a no-op by measurement."""
    rng = np.random.RandomState(11)
    B, M, S = 2, 8, 16
    rois = np.zeros((B, M, 7), np.float32)
    rois[..., 0] = rng.uniform(-10, 10, (B, M))
    rois[..., 1] = 1.0
    rois[..., 2] = rng.uniform(8, 60, (B, M))
    rois[..., 3:6] = [1.5, 1.6, 3.9]
    rois[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    gt = rois.copy()
    gt[..., 0:3] += rng.normal(0, 0.3, (B, M, 3))
    gt[..., 6] += rng.normal(0, 0.1, (B, M))
    pts = rois[:, :, None, 0:3] + rng.normal(0, 1, (B, M, S, 3)).astype(np.float32)

    def canonical(pts, rois, gt):
        """The exact canonical transform the layer applies after aug
        (proposal_target_layer.py:45-56, via the reference's own
        rotate_pc_along_y_torch)."""
        import lib.utils.kitti_utils as kitti_utils

        pts, rois, gt = (torch.from_numpy(x.copy()) for x in (pts, rois, gt))
        roi_ry = rois[:, :, 6] % (2 * np.pi)
        roi_center = rois[:, :, 0:3]
        pts = pts - roi_center.unsqueeze(2)
        gt = gt.clone()
        gt[:, :, 0:3] = gt[:, :, 0:3] - roi_center
        gt[:, :, 6] = gt[:, :, 6] - roi_ry
        for k in range(pts.shape[0]):
            pts[k] = kitti_utils.rotate_pc_along_y_torch(pts[k], rois[k, :, 6])
            gt[k] = kitti_utils.rotate_pc_along_y_torch(
                gt[k].unsqueeze(1), roi_ry[k]).squeeze(1)
        return pts.numpy(), gt.numpy()

    base_pts, base_gt = canonical(pts, rois, gt)

    # isolate the rotation: data_augmentation draws torch.rand three times in
    # order (angles, scales, flip); pin scale = 1 and flip = +1 while keeping
    # the real (biased or symmetric) angle draw
    real_rand = torch.rand

    def run_rotation_only(angle_u):
        calls = {"n": 0}

        def fake_rand(*size, **kw):
            calls["n"] += 1
            shape = tuple(size[0]) if len(size) == 1 and isinstance(
                size[0], (tuple, list)) else size
            if calls["n"] == 1:  # angles
                return angle_u(real_rand(*shape))
            if calls["n"] == 2:  # scales -> 1.0
                return torch.full(shape, 0.5)
            return torch.ones(shape)  # flip -> +1

        torch.rand = fake_rand
        try:
            with torch.no_grad():
                tp, tr, tg = (torch.from_numpy(x.copy()) for x in (pts, rois, gt))
                ap, ar, ag = ref_layer.layer.data_augmentation(tp, tr, tg)
        finally:
            torch.rand = real_rand
        return canonical(ap.numpy(), ar.numpy(), ag.numpy())

    for seed, angle_u in ((0, lambda u: u), (1, lambda u: u),
                          # force the extreme of the biased range
                          (2, lambda u: torch.zeros_like(u))):
        torch.manual_seed(seed)
        aug_pts, aug_gt = run_rotation_only(angle_u)
        # rotation (whatever its distribution) cancels out of the canonical
        # training targets entirely -> deviation #3 is training-neutral
        np.testing.assert_allclose(aug_pts, base_pts, rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(
            aug_gt[..., 0:6], base_gt[..., 0:6], rtol=1e-4, atol=2e-4)
        dry = (aug_gt[..., 6] - base_gt[..., 6] + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(dry, 0, atol=2e-4)


def test_degenerate_scene_masks_batch():
    """Documented deviation #4: a scene with NO valid rois produces fully
    masked labels (cls_label == -1, reg_valid == 0) instead of the
    reference's pdb crash (proposal_target_layer.py:146-149)."""
    import jax
    import jax.numpy as jnp

    from pointrcnn_tpu.models.target import proposal_target_layer

    pts, feats, seg, depth, rois, gt, gt_valid, G = make_scene(seed=5)
    roi_valid = np.zeros(rois.shape[:2], bool)  # nothing valid
    out = proposal_target_layer(
        our_cfg(), jax.random.PRNGKey(0), jnp.asarray(rois),
        jnp.asarray(roi_valid), jnp.asarray(gt[:, :, :7]),
        jnp.asarray(gt_valid), jnp.asarray(pts), jnp.asarray(feats),
        jnp.asarray(seg), jnp.asarray(depth))
    assert np.all(np.asarray(out["cls_label"]) == -1)
    assert np.all(np.asarray(out["reg_valid_mask"]) == 0)
