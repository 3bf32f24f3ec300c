"""End-to-end CLI smoke: tools/train.py (rpn, then rcnn with partial restore)
and tools/eval.py (joint eval incl. official AP) on the mini-KITTI fixture."""

import os
import sys

import pytest

from kitti_fixture import make_mini_kitti

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)
TINY_CFG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cfgs_tiny.yaml")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_cli2"))
    make_mini_kitti(root, num_samples=4, n_points=2500)
    out = str(tmp_path_factory.mktemp("out"))
    return root, out


def run_tool(monkeypatch, module_name, argv):
    import importlib

    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name + ".py"] + argv)
    mod.main()


def test_train_and_eval_cli(env, monkeypatch):
    root, out = env
    rpn_dir = os.path.join(out, "rpn")
    run_tool(
        monkeypatch, "train",
        ["--cfg_file", TINY_CFG, "--train_mode", "rpn", "--data_root", root,
         "--batch_size", "2", "--epochs", "1", "--ckpt_save_interval", "1",
         "--output_dir", rpn_dir, "--workers", "1"],
    )
    rpn_ckpt = os.path.join(rpn_dir, "ckpt", "checkpoint_epoch_1")
    assert os.path.isdir(rpn_ckpt)

    rcnn_dir = os.path.join(out, "rcnn")
    run_tool(
        monkeypatch, "train",
        ["--cfg_file", TINY_CFG, "--train_mode", "rcnn", "--data_root", root,
         "--batch_size", "2", "--epochs", "1", "--ckpt_save_interval", "1",
         "--output_dir", rcnn_dir, "--rpn_ckpt", rpn_ckpt, "--workers", "1"],
    )
    rcnn_ckpt = os.path.join(rcnn_dir, "ckpt", "checkpoint_epoch_1")
    assert os.path.isdir(rcnn_ckpt)

    eval_dir = os.path.join(out, "eval")
    run_tool(
        monkeypatch, "eval",
        ["--cfg_file", TINY_CFG, "--eval_mode", "rcnn", "--data_root", root,
         "--batch_size", "2", "--ckpt", rcnn_ckpt, "--output_dir", eval_dir,
         "--workers", "1"],
    )
    final = os.path.join(eval_dir, "final_result", "data")
    assert len(os.listdir(final)) == 4
    log = open(os.path.join(eval_dir, "log_eval.txt")).read()
    assert "3d   AP" in log  # official AP evaluator ran
