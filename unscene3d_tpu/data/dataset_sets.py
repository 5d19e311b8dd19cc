"""Fixed scene subsets (the role of pseudo_masks/constants/dataset_sets.py,
1518 LoC of hardcoded scene names = the official ScanNet v2 train/val splits).

The reference embeds the lists; here they are loaded from the standard split
files (`scannetv2_train.txt` / `scannetv2_val.txt`, shipped with every
ScanNet download, or the per-dataset `train.txt`/`val.txt`), searched in
`$SCANNET_SPLITS_DIR`, an explicit directory, or the dataset root. Consumers:
eval CLIs restricting to VAL_SCENES (reference
pseudo_masks/eval_cutler_images.py:13,79)."""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path

_CANDIDATES = {
    "train": ("scannetv2_train.txt", "train.txt"),
    "val": ("scannetv2_val.txt", "val.txt"),
    "test": ("scannetv2_test.txt", "test.txt"),
}


@lru_cache(maxsize=None)
def scene_set(split: str, splits_dir: str | None = None) -> tuple[str, ...]:
    """Scene names for `split` in {'train','val','test'}; empty tuple when no
    split file can be found (callers fall back to globbing the dataset)."""
    roots = []
    if splits_dir:
        roots.append(Path(splits_dir))
    env = os.environ.get("SCANNET_SPLITS_DIR")
    if env:
        roots.append(Path(env))
    for root in roots:
        for fname in _CANDIDATES.get(split, ()):
            p = root / fname
            if p.exists():
                return tuple(l.strip() for l in p.read_text().splitlines()
                             if l.strip())
    return ()


def train_scenes(splits_dir: str | None = None) -> tuple[str, ...]:
    return scene_set("train", splits_dir)


def val_scenes(splits_dir: str | None = None) -> tuple[str, ...]:
    return scene_set("val", splits_dir)
