"""Standalone KITTI AP evaluator CLI (reference
tools/kitti_object_eval_python/evaluate.py — fire CLI there, argparse here;
same arguments and semantics: official 11-point or COCO-style AP over a
result dir + label dir + split file, optional low-score filtering).

Usage:
    python tools/evaluate.py --label_path .../label_2 \
        --result_path .../final_result/data \
        --label_split_file .../ImageSets/val.txt [--current_class 0]
        [--coco] [--score_thresh 0.3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Official KITTI AP evaluator")
    p.add_argument("--label_path", type=str, required=True)
    p.add_argument("--result_path", type=str, required=True)
    p.add_argument("--label_split_file", type=str, required=True)
    p.add_argument("--current_class", type=int, nargs="+", default=[0],
                   help="0=Car 1=Pedestrian 2=Cyclist 3=Van 4=Person_sitting")
    p.add_argument("--coco", action="store_true",
                   help="COCO-style AP@[lo:hi] sweep instead of the official "
                        "11-point protocol (reference eval.py:681-740)")
    p.add_argument("--score_thresh", type=float, default=-1.0,
                   help="drop detections below this score before evaluating "
                        "(reference kitti_common.filter_annos_low_score)")
    args = p.parse_args()

    from pointrcnn_tpu.eval.kitti_eval import (
        filter_annos_low_score,
        get_coco_eval_result,
        get_label_annos,
        get_official_eval_result,
    )

    with open(args.label_split_file) as f:
        image_ids = [int(x) for x in f.readlines() if x.strip()]
    dt_annos = get_label_annos(args.result_path, image_ids)
    if args.score_thresh > 0:
        dt_annos = filter_annos_low_score(dt_annos, args.score_thresh)
    gt_annos = get_label_annos(args.label_path, image_ids)
    fn = get_coco_eval_result if args.coco else get_official_eval_result
    result_str, _ = fn(gt_annos, dt_annos, list(args.current_class))
    print(result_str)


if __name__ == "__main__":
    main()
