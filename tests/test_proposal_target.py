import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.models.proposal import distance_based_proposal
from pointrcnn_tpu.models.target import proposal_target_layer, random_aug_box3d
from pointrcnn_tpu.ops.iou3d import boxes_iou3d_paired


def make_boxes(n, z_range, seed):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-20, 20, n)
    b[:, 1] = rng.uniform(0, 2, n)
    b[:, 2] = rng.uniform(*z_range, n)
    b[:, 3:6] = [1.5, 1.6, 3.9]
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def run_zones(boxes, scores, pre=64, post=16):
    return jax.jit(
        lambda p, s: distance_based_proposal(p, s, pre, post, 0.85, False, 64)
    )(jnp.asarray(boxes), jnp.asarray(scores))


def test_distance_zones_split_budget():
    near = make_boxes(40, (5, 39), seed=0)
    far = make_boxes(40, (45, 75), seed=1)
    boxes = np.concatenate([near, far])
    scores = np.random.RandomState(2).rand(80).astype(np.float32)
    out_boxes, out_scores, valid = map(np.asarray, run_zones(boxes, scores))
    post1 = int(16 * 0.7)
    # slots [0, post1) are zone 1 (z<=40), rest zone 2
    z = out_boxes[:, 2]
    assert np.all(z[:post1][valid[:post1]] <= 40.0 + 1e-4)
    assert np.all(z[post1:][valid[post1:]] > 40.0)
    assert valid.sum() > 0


def test_zone2_fallback_uses_zone1_leftovers():
    """With no boxes beyond 40m, zone-2 slots take zone-1 leftovers ranked
    past the zone-1 pre budget (reference proposal_layer.py:92-100)."""
    boxes = make_boxes(80, (5, 39), seed=3)
    scores = np.linspace(1.0, 0.01, 80).astype(np.float32)
    pre, post = 64, 16
    out_boxes, out_scores, valid = map(
        np.asarray,
        jax.jit(lambda p, s: distance_based_proposal(p, s, pre, post, 0.99, False, 128))(
            jnp.asarray(boxes), jnp.asarray(scores)
        ),
    )
    post1 = int(post * 0.7)
    pre1 = int(pre * 0.7)  # 44
    # zone-2 slots valid and filled with z<=40 leftovers (scores ranked > pre1)
    z2_scores = out_scores[post1:][valid[post1:]]
    assert len(z2_scores) > 0
    assert np.all(z2_scores <= scores[pre1 - 1])
    assert np.all(out_boxes[post1:][valid[post1:]][:, 2] <= 40.0 + 1e-4)


def tiny_target_cfg():
    cfg = default_config()
    cfg.RCNN.ROI_PER_IMAGE = 16
    cfg.RCNN.ROI_FG_AUG_TIMES = 3
    cfg.RCNN.NUM_POINTS = 32
    cfg.RCNN.MAX_GT_BOXES = 4
    cfg.AUG_DATA = False
    return cfg.freeze()


def test_target_layer_fg_bg_composition():
    cfg = tiny_target_cfg()
    rng = np.random.RandomState(4)
    B, M, G, N = 2, 32, 4, 256
    gt = np.zeros((B, G, 7), np.float32)
    gt_valid = np.zeros((B, G), bool)
    rois = np.zeros((B, M, 7), np.float32)
    for b in range(B):
        gt[b, 0] = [0, 1, 20, 1.5, 1.6, 3.9, 0.2]
        gt_valid[b, 0] = True
        # half the rois overlap the gt, half are far away
        for m in range(M):
            if m < M // 2:
                rois[b, m] = gt[b, 0] + np.concatenate([rng.uniform(-0.3, 0.3, 3), np.zeros(4)]).astype(np.float32)
            else:
                rois[b, m] = [30 + m, 1, 60, 1.5, 1.6, 3.9, 0.0]
    xyz = rng.uniform(-5, 5, (B, N, 3)).astype(np.float32)
    # plant points near the gt so pooling is non-empty
    xyz[:, :128, 0] = gt[0, 0, 0] + rng.uniform(-2, 2, (B, 128))
    xyz[:, :128, 1] = gt[0, 0, 1] - rng.uniform(0, 1.5, (B, 128))
    xyz[:, :128, 2] = gt[0, 0, 2] + rng.uniform(-2, 2, (B, 128))
    feats = rng.randn(B, N, 8).astype(np.float32)
    seg = (rng.rand(B, N) > 0.5).astype(np.float32)
    depth = np.linalg.norm(xyz, axis=2)

    out = proposal_target_layer(
        cfg, jax.random.PRNGKey(0),
        jnp.asarray(rois), jnp.ones((B, M), bool),
        jnp.asarray(gt), jnp.asarray(gt_valid),
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(seg), jnp.asarray(depth),
    )
    R = cfg.RCNN.ROI_PER_IMAGE
    cls = np.asarray(out["cls_label"]).reshape(B, R)
    iou = np.asarray(out["gt_iou"]).reshape(B, R)
    # fg slots come first and their iou exceeds the fg threshold
    fg_per_image = R // 2
    assert (iou[:, :fg_per_image] >= min(cfg.RCNN.REG_FG_THRESH, cfg.RCNN.CLS_FG_THRESH) - 1e-5).mean() > 0.8
    # bg slots have low iou
    assert (iou[:, fg_per_image:] < cfg.RCNN.CLS_BG_THRESH).all()
    # canonical gt: fg boxes should be near the roi frame origin
    gt_ct = np.asarray(out["gt_of_rois"]).reshape(B, R, 7)
    assert np.abs(gt_ct[:, :fg_per_image, 0:3]).max() < 3.0
    assert set(np.unique(cls)).issubset({-1, 0, 1})


def test_random_aug_box3d_ranges():
    boxes = jnp.asarray(make_boxes(64, (5, 60), seed=5))
    aug = np.asarray(random_aug_box3d(jax.random.PRNGKey(0), boxes, "multiple"))
    d = np.abs(aug[:, 0:3] - np.asarray(boxes)[:, 0:3])
    assert d.max() <= 1.0 + 1e-5  # largest pos_range
    ratio = aug[:, 3:6] / np.asarray(boxes)[:, 3:6]
    assert ratio.min() >= 0.85 - 1e-5 and ratio.max() <= 1.15 + 1e-5
    # jittered boxes still overlap their source
    iou = np.asarray(boxes_iou3d_paired(boxes, jnp.asarray(aug)))
    assert (iou > 0.05).mean() > 0.9
