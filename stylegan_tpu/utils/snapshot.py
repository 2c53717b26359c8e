"""Source-tree snapshot for run reproducibility.

Counterpart of the reference's copy of the whole working tree into
<output>/src at train start (utils/copy.py:7-51, train.py:63-66).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable, List, Tuple


def list_dir_recursively_with_ignore(dir_path: str,
                                     ignores: Iterable[str] = ()) -> List[Tuple[str, str]]:
    """(absolute_path, relative_path) pairs for all files under dir_path,
    skipping ignored directory names (reference utils/copy.py:7-31)."""
    ignores = set(ignores)
    out = []
    for dirpath, dirnames, filenames in os.walk(dir_path):
        dirnames[:] = [d for d in dirnames if d not in ignores]
        for f in filenames:
            if f in ignores:
                continue
            abs_path = os.path.join(dirpath, f)
            out.append((abs_path, os.path.relpath(abs_path, dir_path)))
    return out


def copy_files_and_create_dirs(files: Iterable[Tuple[str, str]]) -> None:
    """Copy (src, dst) pairs, creating destination dirs
    (reference utils/copy.py:34-51)."""
    for src, dst in files:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)


def snapshot_sources(src_root: str, out_dir: str,
                     ignores: Iterable[str] = ("configs", "diagrams", ".git",
                                               "__pycache__", "output")):
    ignores = set(ignores)
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = [d for d in dirnames if d not in ignores
                       and not d.startswith(".")]
        rel = os.path.relpath(dirpath, src_root)
        for f in filenames:
            if not f.endswith((".py", ".yaml", ".md", ".txt", ".cc", ".h")):
                continue
            dst_dir = os.path.join(out_dir, rel) if rel != "." else out_dir
            os.makedirs(dst_dir, exist_ok=True)
            shutil.copy2(os.path.join(dirpath, f), os.path.join(dst_dir, f))
