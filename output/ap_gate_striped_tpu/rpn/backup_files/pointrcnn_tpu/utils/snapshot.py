"""Per-run source snapshotting for reproducibility.

Mirrors the reference's ``backup_files`` convention (train_rcnn.py:184-188,
eval_rcnn.py:754-759): every train/eval run copies the framework's Python
sources into ``<run_dir>/backup_files/`` so results can be diffed against the
exact code that produced them.
"""

from __future__ import annotations

import os
import pathlib
import shutil

_PKG_ROOT = pathlib.Path(__file__).resolve().parents[1]
_REPO_ROOT = _PKG_ROOT.parent


def backup_source(run_dir: str | os.PathLike, logger=None) -> str:
    """Copy package + tools .py sources into ``run_dir/backup_files``."""
    dst_root = pathlib.Path(run_dir) / "backup_files"
    copied = 0
    for base in (_PKG_ROOT, _REPO_ROOT / "tools"):
        if not base.is_dir():
            continue
        for src in sorted(base.rglob("*.py")):
            rel = pathlib.Path(base.name) / src.relative_to(base)
            dst = dst_root / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
            copied += 1
    if logger is not None:
        logger.info("backed up %d source files to %s", copied, dst_root)
    return str(dst_root)
