"""Synthetic mini-KITTI dataset on disk for data-pipeline tests."""

import os

import numpy as np

# identity-ish calibration: rect == lidar frame for simplicity of fixtures
CALIB_TXT = """P0: 700 0 600 0 0 700 200 0 0 0 1 0
P1: 700 0 600 0 0 700 200 0 0 0 1 0
P2: 700 0 600 0 0 700 200 0 0 0 1 0
P3: 700 0 600 0 0 700 200 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""

PLANE_TXT = """# Plane
Width 4
Height 1
0 -1 0 1.65
"""


def _label_line(cls, box3d, box2d=(300, 150, 400, 250), alpha=0.0):
    x, y, z, h, w, l, ry = box3d
    return (
        f"{cls} 0.00 0 {alpha:.2f} {box2d[0]:.2f} {box2d[1]:.2f} {box2d[2]:.2f} "
        f"{box2d[3]:.2f} {h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}"
    )


def make_mini_kitti(root, num_samples=4, n_points=4000, seed=0, split="train",
                    classes=("Car", "Car"), z_range=(10.0, 50.0)):
    """Create a tiny on-disk KITTI tree; returns (root, boxes per sample).

    ``classes``: the object class per box in each scene; Car boxes are
    car-sized, Pedestrian/Cyclist boxes person-sized.
    ``z_range``: depth band for object centers. The official KITTI protocol
    ignores detections whose projected 2D bbox is shorter than the
    difficulty's min height (reference eval.py clean_data), so convergence
    tests that assert AP should keep objects near enough that projected
    heights clear the threshold (f=700: a 1.5 m car needs z <~ 26 m for
    easy's 40 px, z <~ 42 m for moderate's 25 px)."""
    SIZES = {
        "Car": (1.5, 1.6, 3.9),
        "Pedestrian": (1.73, 0.6, 0.8),
        "Cyclist": (1.73, 0.6, 1.76),
    }
    rng = np.random.RandomState(seed)
    training = os.path.join(root, "KITTI", "object", "training")
    for sub in ("velodyne", "calib", "label_2", "planes", "image_2"):
        os.makedirs(os.path.join(training, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "KITTI", "ImageSets"), exist_ok=True)

    from PIL import Image

    img = Image.new("RGB", (1242, 375))

    all_boxes = {}
    ids = []
    for i in range(num_samples):
        sid = f"{i:06d}"
        ids.append(sid)

        # scene: ground plane points + objects with points inside
        n_obj = len(classes)
        n_bg = n_points - 300 * n_obj
        pts = np.zeros((n_points, 4), np.float32)
        pts[:n_bg, 0] = rng.uniform(-20, 20, n_bg)
        pts[:n_bg, 1] = 1.65 + rng.normal(0, 0.05, n_bg)
        pts[:n_bg, 2] = rng.uniform(5, 69, n_bg)
        pts[:n_bg, 3] = rng.rand(n_bg)

        boxes = []
        for j, cls in enumerate(classes):
            h, w, l = SIZES[cls]
            cx = rng.uniform(-8, 8)
            cz = rng.uniform(*z_range)
            ry = rng.uniform(-np.pi, np.pi)
            box = (cx, 1.65, cz, h, w, l, ry)
            boxes.append(box)
            s = n_bg + j * 300
            local = np.stack(
                [
                    rng.uniform(-l * 0.46, l * 0.46, 300),
                    rng.uniform(-h * 0.97, -h * 0.03, 300),
                    rng.uniform(-w * 0.44, w * 0.44, 300),
                ],
                axis=1,
            )
            c, sn = np.cos(ry), np.sin(ry)
            pts[s : s + 300, 0] = cx + local[:, 0] * c + local[:, 2] * sn
            pts[s : s + 300, 1] = 1.65 + local[:, 1]
            pts[s : s + 300, 2] = cz - local[:, 0] * sn + local[:, 2] * c
            pts[s : s + 300, 3] = rng.rand(300)
        all_boxes[i] = boxes

        pts.tofile(os.path.join(training, "velodyne", sid + ".bin"))
        with open(os.path.join(training, "calib", sid + ".txt"), "w") as f:
            f.write(CALIB_TXT)
        with open(os.path.join(training, "planes", sid + ".txt"), "w") as f:
            f.write(PLANE_TXT)
        with open(os.path.join(training, "label_2", sid + ".txt"), "w") as f:
            for cls, box in zip(classes, boxes):
                f.write(_label_line(cls, box) + "\n")
            f.write(_label_line("DontCare", (0, 0, 60, 1, 1, 1, 0)) + "\n")
        img.save(os.path.join(training, "image_2", sid + ".png"))

    for name in (split, "val", "train"):
        with open(os.path.join(root, "KITTI", "ImageSets", name + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return root, all_boxes
