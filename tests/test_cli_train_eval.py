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

    # split-checkpoint joint eval (reference --rpn_ckpt/--rcnn_ckpt,
    # eval_rcnn.py:35-36 + load_ckpt_based_on_args 698-726): the RPN stays
    # frozen during rcnn training, so stitching rpn_ckpt + rcnn_ckpt must
    # reproduce the single merged checkpoint bit for bit
    split_dir = os.path.join(out, "eval_split")
    run_tool(
        monkeypatch, "eval",
        ["--cfg_file", TINY_CFG, "--eval_mode", "rcnn", "--data_root", root,
         "--batch_size", "2", "--rpn_ckpt", rpn_ckpt, "--rcnn_ckpt", rcnn_ckpt,
         "--output_dir", split_dir, "--workers", "1"],
    )
    split_final = os.path.join(split_dir, "final_result", "data")
    for name in sorted(os.listdir(final)):
        a = open(os.path.join(final, name)).read()
        b = open(os.path.join(split_final, name)).read()
        assert a == b, f"split-ckpt eval diverged on {name}"

    # --eval_all: every checkpoint in the dir gets evaluated and its scalars
    # land in a per-split tensorboard dir (reference eval_rcnn.py:833-836);
    # --start_epoch below the available epochs filters everything out
    # (eval_rcnn.py:49,795)
    all_dir = os.path.join(out, "eval_all")
    run_tool(
        monkeypatch, "eval",
        ["--cfg_file", TINY_CFG, "--eval_mode", "rpn", "--data_root", root,
         "--batch_size", "2", "--ckpt_dir", os.path.join(rpn_dir, "ckpt"),
         "--eval_all", "--output_dir", all_dir, "--workers", "1"],
    )
    log = open(os.path.join(all_dir, "log_eval.txt")).read()
    assert "epoch 1:" in log
    tb_dir = os.path.join(all_dir, "tensorboard_val")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir), "no eval tb scalars"

    # --extra_tag nests the output dir (reference eval_rcnn.py:738-739)
    tag_dir = os.path.join(out, "eval_tagged")
    run_tool(
        monkeypatch, "eval",
        ["--cfg_file", TINY_CFG, "--eval_mode", "rpn", "--data_root", root,
         "--batch_size", "2", "--ckpt", rpn_ckpt, "--extra_tag", "try2",
         "--output_dir", tag_dir, "--workers", "1"],
    )
    assert os.path.isfile(os.path.join(tag_dir, "try2", "log_eval.txt"))

    with pytest.raises(AssertionError, match="no checkpoints"):
        run_tool(
            monkeypatch, "eval",
            ["--cfg_file", TINY_CFG, "--eval_mode", "rpn", "--data_root", root,
             "--batch_size", "2", "--ckpt", os.path.join(rpn_dir, "ckpt"),
             "--eval_all", "--start_epoch", "2",
             "--output_dir", os.path.join(out, "eval_all_skip"),
             "--workers", "1"],
        )
