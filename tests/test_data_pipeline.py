import os

import numpy as np
import pytest

from pointrcnn_tpu.config import default_config
from pointrcnn_tpu.data.gt_database import GTDatabaseGenerator
from pointrcnn_tpu.data.loader import DataLoader
from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
from pointrcnn_tpu.utils.np_geometry import points_in_boxes3d

from kitti_fixture import make_mini_kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    return make_mini_kitti(root, num_samples=4, n_points=4000)


def cfg_for_data():
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 1024
    cfg.GT_AUG_ENABLED = False
    cfg.RCNN.MAX_GT_BOXES = 8
    return cfg.freeze()


def test_dataset_length(kitti_root):
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    assert len(ds) == 4


def test_rpn_sample_full_checks(kitti_root):
    root, _ = kitti_root
    cfg = default_config()
    cfg.RPN.NUM_POINTS = 1024
    cfg.GT_AUG_ENABLED = False
    cfg.RCNN.MAX_GT_BOXES = 8
    cfg.RPN.USE_INTENSITY = True
    # this test checks the HOST label generator's output; the default
    # (DEVICE_LABELS) skips it in TRAIN mode
    cfg.RPN.DEVICE_LABELS = False
    cfg = cfg.freeze()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    rng = np.random.RandomState(1)
    s = ds.getitem(1, rng)
    assert s["pts_input"].shape == (1024, 4)
    assert s["rpn_cls_label"].shape == (1024,)
    assert s["rpn_reg_label"].shape == (1024, 7)
    assert s["gt_boxes3d"].shape[1] == 7
    # intensity shifted to [-0.5, 0.5]
    assert s["pts_features"].min() >= -0.5 - 1e-6
    assert s["pts_features"].max() <= 0.5 + 1e-6
    # some fg points labeled, and their reg targets point at a gt center
    fg = s["rpn_cls_label"] == 1
    assert fg.sum() > 0
    inside = points_in_boxes3d(s["pts_rect"], s["gt_boxes3d"])
    np.testing.assert_array_equal(fg, inside.any(axis=0))
    # fg point + offset = box center (y at true center)
    pt = s["pts_rect"][fg][0]
    off = s["rpn_reg_label"][fg][0]
    center = pt + off[0:3]
    centers = s["gt_boxes3d"][:, 0:3].copy()
    centers[:, 1] -= s["gt_boxes3d"][:, 3] / 2
    assert np.min(np.linalg.norm(centers - center, axis=1)) < 1e-4


def test_eval_sample_no_aug(kitti_root):
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="val", mode="EVAL")
    rng = np.random.RandomState(2)
    s = ds.getitem(0, rng)
    # EVAL keeps raw geometry (no rotation/scale/flip) and still has labels
    assert "gt_boxes3d" in s and "rpn_cls_label" in s
    s2 = ds.getitem(0, np.random.RandomState(99))
    np.testing.assert_allclose(s["gt_boxes3d"], s2["gt_boxes3d"])


def test_loader_collate_and_padding(kitti_root):
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["pts_input"].shape[0] == 2
    assert b["gt_boxes3d"].shape == (2, 8, 7)
    assert b["gt_valid"].shape == (2, 8)
    assert b["gt_valid"][:, :2].all()  # two cars per fixture scene
    # epochs reshuffle deterministically
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert b2["pts_input"].shape[0] == 2


def test_gt_database_and_paste_aug(kitti_root, tmp_path):
    root, _ = kitti_root
    gen = GTDatabaseGenerator(root, split="train", classes="Car")
    db = gen.generate_gt_database()
    assert len(db) == 8  # 4 scenes x 2 cars
    assert all(d["points"].shape[0] > 0 for d in db)
    path = str(tmp_path / "gt_database" / "train_gt_database.pkl")
    gen.save(path)

    cfg = default_config()
    cfg.RPN.NUM_POINTS = 1024
    cfg.GT_AUG_ENABLED = True
    cfg.GT_AUG_APPLY_PROB = 1.0
    cfg.GT_EXTRA_NUM = 5
    cfg.GT_AUG_RAND_NUM = False
    cfg.RCNN.MAX_GT_BOXES = 16
    cfg = cfg.freeze()
    ds = KittiRCNNDataset(
        root, cfg, npoints=1024, split="train", mode="TRAIN", gt_database_path=path
    )
    rng = np.random.RandomState(3)
    s = ds.getitem(0, rng)
    # paste-aug should add at least one extra gt box beyond the 2 originals
    assert s["gt_boxes3d"].shape[0] >= 3


def test_loader_workers_deterministic(kitti_root):
    """Multi-worker loading yields the same batches as a single worker:
    per-sample RNG depends only on (seed, epoch, idx)."""
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    one = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1))
    four = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=4))
    assert len(one) == len(four)
    for a, b in zip(one, four):
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            va, vb = a[k], b[k]
            if isinstance(va, np.ndarray) and va.dtype != object:
                np.testing.assert_array_equal(va, vb)
            else:
                assert str(va) == str(vb)


def test_loader_process_pool_matches_threads(kitti_root):
    """use_processes=True (fork workers, the reference DataLoader shape)
    yields batches identical to the thread mode: per-sample RNG depends only
    on (seed, epoch, idx), and the dataset is fork-inherited, not pickled."""
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    threads = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=2))
    procs = list(DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=2,
                            use_processes=True))
    assert len(threads) == len(procs)
    for a, b in zip(threads, procs):
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            va, vb = a[k], b[k]
            if isinstance(va, np.ndarray) and va.dtype != object:
                np.testing.assert_array_equal(va, vb)


def test_loader_early_exit_cancels_pending(kitti_root):
    root, _ = kitti_root
    cfg = cfg_for_data()
    ds = KittiRCNNDataset(root, cfg, npoints=1024, split="train", mode="TRAIN")
    loader = DataLoader(ds, batch_size=1, num_workers=2, prefetch=2)
    it = iter(loader)
    next(it)
    it.close()  # must not hang or raise


def test_device_rpn_labels_match_host_generator():
    """train/labels.py computes the same per-point cls/reg labels on device
    as the host generator, including the later-box-overwrites order for
    overlapping boxes and enlarged-ring ignores."""
    import jax.numpy as jnp
    from pointrcnn_tpu.data.rpn_dataset import KittiRCNNDataset
    from pointrcnn_tpu.train.labels import rpn_training_labels_batch

    rng = np.random.RandomState(7)
    N, G, Gpad = 2048, 6, 10
    pts = rng.uniform(-12, 12, (N, 3)).astype(np.float32)
    # concentrate most points around the box cluster so fg/ring labels are
    # well represented
    pts[: N // 2] = rng.uniform(-3, 3, (N // 2, 3)).astype(np.float32)
    pts[: N // 2, 1] = rng.uniform(-0.5, 2.0, N // 2)
    boxes = np.zeros((G, 7), np.float32)
    # overlapping cluster + isolated boxes
    boxes[:, 0] = [0.0, 0.5, 8.0, -7.0, 0.2, 3.0]
    boxes[:, 1] = 1.6
    boxes[:, 2] = [0.0, 0.4, -6.0, 5.0, 0.1, 3.2]
    boxes[:, 3:6] = [1.5, 1.7, 3.9]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, G)

    cls_h, reg_h = KittiRCNNDataset.generate_rpn_training_labels(pts, boxes)
    assert (cls_h == 1).sum() > 50, "fixture should produce foreground"
    assert (cls_h == -1).sum() > 0, "fixture should produce ignore rings"

    padded = np.zeros((Gpad, 7), np.float32)
    padded[:G] = boxes
    # poison the padding rows: valid masking must ignore them
    padded[G:, 3:6] = 100.0
    valid = np.zeros(Gpad, bool)
    valid[:G] = True
    cls_d, reg_d = rpn_training_labels_batch(
        jnp.asarray(pts)[None], jnp.asarray(padded)[None],
        jnp.asarray(valid)[None],
    )
    np.testing.assert_array_equal(np.asarray(cls_d[0]), cls_h)
    np.testing.assert_allclose(np.asarray(reg_d[0]), reg_h, atol=1e-5)
