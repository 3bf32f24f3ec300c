import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.utils import losses
from pointrcnn_tpu.utils.box_coder import decode_bbox_target, reg_channel_count

ANCHOR = np.array([1.52, 1.63, 3.88], dtype=np.float32)


def np_encode_reference(reg_label, loc_scope, loc_bin_size, num_head_bin,
                        get_xz_fine, get_ry_fine):
    """NumPy oracle of the target construction inside the reference reg loss
    (loss_utils.py:112-226), returning per-field bin labels / residuals."""
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    x_shift = np.clip(reg_label[:, 0] + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = np.clip(reg_label[:, 2] + loc_scope, 0, loc_scope * 2 - 1e-3)
    x_bin = np.floor(x_shift / loc_bin_size).astype(np.int64)
    z_bin = np.floor(z_shift / loc_bin_size).astype(np.int64)
    out = {"x_bin": x_bin, "z_bin": z_bin, "per_loc_bin_num": per_loc_bin_num}
    if get_ry_fine:
        angle_per_class = (np.pi / 2) / num_head_bin
        ry = reg_label[:, 6] % (2 * np.pi)
        opp = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
        ry = np.where(opp, (ry + np.pi) % (2 * np.pi), ry)
        shift = (ry + np.pi * 0.5) % (2 * np.pi)
        shift = np.clip(shift - np.pi * 0.25, 1e-3, np.pi * 0.5 - 1e-3)
        out["ry_bin"] = np.floor(shift / angle_per_class).astype(np.int64)
    else:
        angle_per_class = (2 * np.pi) / num_head_bin
        heading = reg_label[:, 6] % (2 * np.pi)
        shift = (heading + angle_per_class / 2) % (2 * np.pi)
        out["ry_bin"] = np.floor(shift / angle_per_class).astype(np.int64)
    return out


def make_perfect_reg(reg_label, loc_scope, loc_bin_size, num_head_bin,
                     get_xz_fine, get_ry_fine, anchor):
    """Build a regression vector that should decode back to reg_label exactly."""
    n = reg_label.shape[0]
    C = reg_channel_count(loc_scope, loc_bin_size, num_head_bin, get_xz_fine)
    pred = np.full((n, C), -10.0, dtype=np.float32)
    enc = np_encode_reference(reg_label, loc_scope, loc_bin_size, num_head_bin,
                              get_xz_fine, get_ry_fine)
    pb = enc["per_loc_bin_num"]
    pred[np.arange(n), enc["x_bin"]] = 10.0
    pred[np.arange(n), pb + enc["z_bin"]] = 10.0
    start = pb * 2
    x_shift = np.clip(reg_label[:, 0] + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = np.clip(reg_label[:, 2] + loc_scope, 0, loc_scope * 2 - 1e-3)
    if get_xz_fine:
        x_res = (x_shift - (enc["x_bin"] * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        z_res = (z_shift - (enc["z_bin"] * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        pred[np.arange(n), pb * 2 + enc["x_bin"]] = x_res
        pred[np.arange(n), pb * 3 + enc["z_bin"]] = z_res
        start = pb * 4
    pred[:, start] = reg_label[:, 1]  # y offset
    start += 1
    pred[np.arange(n), start + enc["ry_bin"]] = 10.0
    # heading residual
    if get_ry_fine:
        angle_per_class = (np.pi / 2) / num_head_bin
        ry = reg_label[:, 6] % (2 * np.pi)
        opp = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
        ry = np.where(opp, (ry + np.pi) % (2 * np.pi), ry)
        shift = np.clip((ry + np.pi * 0.5) % (2 * np.pi) - np.pi * 0.25, 1e-3, np.pi / 2 - 1e-3)
    else:
        angle_per_class = (2 * np.pi) / num_head_bin
        shift = (reg_label[:, 6] % (2 * np.pi) + angle_per_class / 2) % (2 * np.pi)
    res = shift - (enc["ry_bin"] * angle_per_class + angle_per_class / 2)
    pred[np.arange(n), start + num_head_bin + enc["ry_bin"]] = res / (angle_per_class / 2)
    start += num_head_bin * 2
    pred[:, start:start + 3] = (reg_label[:, 3:6] - anchor) / anchor
    return pred


def test_decode_roundtrip_rpn_mode():
    """Perfect logits decode back to the label box (RPN: coarse xz, full-2pi ry)."""
    rng = np.random.RandomState(0)
    n = 64
    label = np.zeros((n, 7), dtype=np.float32)
    label[:, 0] = rng.uniform(-2.9, 2.9, n)
    label[:, 1] = rng.uniform(-1, 1, n)
    label[:, 2] = rng.uniform(-2.9, 2.9, n)
    label[:, 3:6] = ANCHOR * rng.uniform(0.8, 1.2, (n, 3))
    label[:, 6] = rng.uniform(-np.pi, np.pi, n)

    pred = make_perfect_reg(label, 3.0, 0.5, 12, get_xz_fine=False, get_ry_fine=False, anchor=ANCHOR)
    roi = np.zeros((n, 3), dtype=np.float32)
    decoded = np.asarray(
        decode_bbox_target(
            jnp.asarray(roi), jnp.asarray(pred),
            loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
            anchor_size=jnp.asarray(ANCHOR), get_xz_fine=False, get_ry_fine=False,
        )
    )
    # x/z quantised to bin centers (no fine residual in this mode)
    assert np.all(np.abs(decoded[:, 0] - label[:, 0]) <= 0.25 + 1e-4)
    assert np.all(np.abs(decoded[:, 2] - label[:, 2]) <= 0.25 + 1e-4)
    np.testing.assert_allclose(decoded[:, 1], label[:, 1], atol=1e-4)
    np.testing.assert_allclose(decoded[:, 3:6], label[:, 3:6], atol=1e-4)
    dry = np.abs((decoded[:, 6] - label[:, 6] + np.pi) % (2 * np.pi) - np.pi)
    assert np.all(dry < 1e-3)


def test_decode_roundtrip_rcnn_mode_with_roi():
    """Fine xz + ry-fine mode, decoding relative to rotated roi boxes."""
    rng = np.random.RandomState(1)
    n = 32
    label = np.zeros((n, 7), dtype=np.float32)
    label[:, 0] = rng.uniform(-1.4, 1.4, n)
    label[:, 1] = rng.uniform(-0.5, 0.5, n)
    label[:, 2] = rng.uniform(-1.4, 1.4, n)
    label[:, 3:6] = ANCHOR * rng.uniform(0.9, 1.1, (n, 3))
    label[:, 6] = rng.uniform(-np.pi / 4 + 0.05, np.pi / 4 - 0.05, n)

    pred = make_perfect_reg(label, 1.5, 0.5, 9, get_xz_fine=True, get_ry_fine=True, anchor=ANCHOR)
    roi = np.zeros((n, 7), dtype=np.float32)
    roi[:, 0] = rng.uniform(-30, 30, n)
    roi[:, 1] = rng.uniform(-1, 2, n)
    roi[:, 2] = rng.uniform(0, 60, n)
    roi[:, 6] = rng.uniform(-np.pi, np.pi, n)

    decoded = np.asarray(
        decode_bbox_target(
            jnp.asarray(roi), jnp.asarray(pred),
            loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
            anchor_size=jnp.asarray(ANCHOR), get_xz_fine=True, get_ry_fine=True,
        )
    )
    # undo the roi frame: rotate decoded center back and compare to label
    cos, sin = np.cos(roi[:, 6]), np.sin(roi[:, 6])
    dx = decoded[:, 0] - roi[:, 0]
    dz = decoded[:, 2] - roi[:, 2]
    local_x = cos * dx - sin * dz
    local_z = sin * dx + cos * dz
    np.testing.assert_allclose(local_x, label[:, 0], atol=1e-3)
    np.testing.assert_allclose(local_z, label[:, 2], atol=1e-3)
    np.testing.assert_allclose(decoded[:, 1] - roi[:, 1], label[:, 1], atol=1e-4)
    local_ry = decoded[:, 6] - roi[:, 6]
    dry = np.abs((local_ry - label[:, 6] + np.pi) % (2 * np.pi) - np.pi)
    assert np.all(dry < 5e-3)


def test_reg_loss_zero_for_perfect_prediction():
    rng = np.random.RandomState(2)
    n = 16
    label = np.zeros((n, 7), dtype=np.float32)
    label[:, 0] = rng.uniform(-2.0, 2.0, n)
    label[:, 1] = rng.uniform(-1, 1, n)
    label[:, 2] = rng.uniform(-2.0, 2.0, n)
    label[:, 3:6] = ANCHOR
    label[:, 6] = rng.uniform(-np.pi, np.pi, n)
    pred = make_perfect_reg(label, 3.0, 0.5, 12, get_xz_fine=True, get_ry_fine=False, anchor=ANCHOR)
    fg = np.ones(n, dtype=np.float32)
    loc, ang, size, d = losses.get_reg_loss(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(fg),
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
        anchor_size=jnp.asarray(ANCHOR), get_xz_fine=True, get_ry_fine=False,
    )
    # residual/size losses ~0; bin CE small (logit margin 20)
    assert float(d["loss_x_res"]) < 1e-6
    assert float(d["loss_z_res"]) < 1e-6
    assert float(d["loss_y_offset"]) < 1e-6
    assert float(d["loss_ry_res"]) < 1e-5
    assert float(size) < 1e-6
    assert float(d["loss_x_bin"]) < 1e-3
    assert float(d["loss_ry_bin"]) < 1e-3


def test_reg_loss_masking_matches_subset():
    """Masked full-batch loss == loss computed on the fg subset only."""
    rng = np.random.RandomState(3)
    n = 32
    label = rng.randn(n, 7).astype(np.float32)
    label[:, 3:6] = np.abs(label[:, 3:6]) + 1.0
    C = reg_channel_count(3.0, 0.5, 12, True)
    pred = rng.randn(n, C).astype(np.float32)
    fg = (rng.rand(n) > 0.5).astype(np.float32)

    full = losses.get_reg_loss(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(fg),
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
        anchor_size=jnp.asarray(ANCHOR),
    )
    idx = np.nonzero(fg)[0]
    sub = losses.get_reg_loss(
        jnp.asarray(pred[idx]), jnp.asarray(label[idx]), jnp.ones(len(idx)),
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
        anchor_size=jnp.asarray(ANCHOR),
    )
    for a, b in zip(full[:3], sub[:3]):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-4)


def test_dice_loss():
    logits = jnp.asarray(np.array([10.0, -10.0, 10.0, -10.0], np.float32))
    target = jnp.asarray(np.array([1.0, 0.0, -1.0, -1.0], np.float32))
    # ignore -1 entries; perfect on the rest -> loss ~= 0
    val = float(losses.dice_loss(logits, target))
    assert val < 1e-3
    # all-wrong prediction -> loss ~= 1
    val2 = float(losses.dice_loss(-logits, target))
    assert val2 > 0.99


def test_focal_loss_reference_formula():
    rng = np.random.RandomState(4)
    logits = rng.randn(100).astype(np.float32)
    targets = (rng.rand(100) > 0.7).astype(np.float32)
    pos = targets
    neg = 1.0 - targets
    w = (pos + neg) / max(pos.sum(), 1.0)
    got = np.asarray(losses.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
    # numpy oracle
    p = 1 / (1 + np.exp(-logits))
    ce = np.clip(logits, 0, None) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
    pt = targets * p + (1 - targets) * (1 - p)
    want = ((1 - pt) ** 2) * (targets * 0.25 + (1 - targets) * 0.75) * ce * w
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bce_fg_weight():
    logits = jnp.asarray(np.array([0.5, -0.5, 0.3], np.float32))
    target = jnp.asarray(np.array([1.0, 0.0, -1.0], np.float32))
    valid = target >= 0
    got = float(losses.weighted_binary_cross_entropy(logits, target, 15.0, valid))
    p = 1 / (1 + np.exp(-np.array([0.5, -0.5])))
    ce = -np.array([np.log(p[0]), np.log(1 - p[1])])
    want = (15.0 * ce[0] + 1.0 * ce[1]) / 2
    np.testing.assert_allclose(got, want, rtol=2e-4)
