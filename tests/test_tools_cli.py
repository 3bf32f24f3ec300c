"""Smoke tests for the CLI tools against the mini-KITTI fixture."""

import os
import sys

import numpy as np
import pytest

from kitti_fixture import make_mini_kitti

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_cli"))
    return make_mini_kitti(root, num_samples=3, n_points=2500)[0]


def run_tool(monkeypatch, module_name, argv):
    import importlib

    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name + ".py"] + argv)
    mod.main()


def test_evaluate_cli(kitti_root, tmp_path, monkeypatch, capsys):
    """Standalone AP evaluator CLI (reference kitti_object_eval_python/
    evaluate.py): official and --coco modes, --score_thresh filtering —
    self-eval of the labels as detections must score AP 100 / near-max."""
    label_dir = os.path.join(kitti_root, "KITTI", "object", "training", "label_2")
    split = os.path.join(kitti_root, "KITTI", "ImageSets", "val.txt")
    # fabricate a result dir: the gt labels themselves with a score column
    result_dir = str(tmp_path / "results")
    os.makedirs(result_dir)
    for name in os.listdir(label_dir):
        lines = []
        for line in open(os.path.join(label_dir, name)):
            p = line.split()
            if p[0] == "DontCare":
                continue
            lines.append(" ".join(p[:15]) + " 0.9")
        with open(os.path.join(result_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    # NOTE: with only 6 gt the official protocol fills just 6 of its 41
    # recall points (get_thresholds adds one per TP when recall advances
    # >= 1/40), so perfect self-detections quantize to 2/11 = 18.18 — the
    # same property the AP-gate fixture sizes around (tools/ap_gate.py)
    base = ["--label_path", label_dir, "--result_path", result_dir,
            "--label_split_file", split]
    run_tool(monkeypatch, "evaluate", base)
    out = capsys.readouterr().out
    assert "bbox AP:18.1818" in out and "3d   AP:18.1818" in out

    run_tool(monkeypatch, "evaluate", base + ["--coco"])
    out = capsys.readouterr().out
    assert "coco AP@0.50:0.05:0.95" in out and "3d   AP:18.18" in out

    # threshold above every score: all detections filtered, AP collapses
    run_tool(monkeypatch, "evaluate", base + ["--score_thresh", "0.95"])
    out = capsys.readouterr().out
    assert "3d   AP:0.0000" in out


def test_generate_gt_database(kitti_root, tmp_path, monkeypatch):
    save_dir = str(tmp_path / "gtdb")
    run_tool(
        monkeypatch, "generate_gt_database",
        ["--data_root", kitti_root, "--save_dir", save_dir, "--split", "train"],
    )
    import pickle

    path = os.path.join(save_dir, "train_gt_database_level_Car.pkl")
    with open(path, "rb") as f:
        db = pickle.load(f)
    assert len(db) == 6
    assert all("points" in d and "gt_box3d" in d for d in db)


def test_generate_aug_scene(kitti_root, tmp_path, monkeypatch):
    gtdb_dir = str(tmp_path / "gtdb2")
    run_tool(
        monkeypatch, "generate_gt_database",
        ["--data_root", kitti_root, "--save_dir", gtdb_dir, "--split", "train"],
    )
    save_dir = str(tmp_path / "aug_scene" / "training")
    run_tool(
        monkeypatch, "generate_aug_scene",
        [
            "--data_root", kitti_root, "--save_dir", save_dir,
            "--gt_database", os.path.join(gtdb_dir, "train_gt_database_level_Car.pkl"),
            "--aug_times", "1",
        ],
    )
    bins = os.listdir(os.path.join(save_dir, "rectified_data"))
    labels = os.listdir(os.path.join(save_dir, "aug_label"))
    assert len(bins) == 3 and len(labels) == 3
    # aug ids offset by 10000
    assert all(int(b.split(".")[0]) >= 10000 for b in bins)
    pts = np.fromfile(
        os.path.join(save_dir, "rectified_data", bins[0]), np.float32
    ).reshape(-1, 4)
    assert pts.shape[0] > 1000
    split = open(os.path.join(save_dir, "train_aug.txt")).read().split()
    assert len(split) == 6
