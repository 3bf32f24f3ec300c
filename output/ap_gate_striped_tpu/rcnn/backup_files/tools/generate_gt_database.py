"""GT-database generation CLI (reference tools/generate_gt_database.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointrcnn_tpu.data.gt_database import GTDatabaseGenerator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--save_dir", type=str, default="data/gt_database")
    p.add_argument("--class_name", type=str, default="Car")
    p.add_argument("--split", type=str, default="train")
    args = p.parse_args()

    gen = GTDatabaseGenerator(args.data_root, split=args.split, classes=args.class_name)
    db = gen.generate_gt_database()
    path = os.path.join(
        args.save_dir, f"{args.split}_gt_database_level_{args.class_name}.pkl"
    )
    gen.save(path)
    print(f"saved {len(db)} objects to {path}")


if __name__ == "__main__":
    main()
