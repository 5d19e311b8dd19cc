"""ARKitScenes preprocessing (reference
datasets/preprocessing/arkitscenes_preprocessing.py + the pseudo app's
ARKit_Dataset): laser-scan ply (or mesh) -> Mask3D npy layout. ARKitScenes
has no GT instances for the unsupervised track, so label/instance columns are
zeros/-1 and segments come from Felzenszwalb when faces exist (grid cells
otherwise).

  python preprocessing/arkitscenes_preprocessing.py --data_dir .../3dod \
      --save_dir data/processed/arkit
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unscene3d_tpu.data.ply import read_ply
from unscene3d_tpu.native import segment_mesh


def process_scene(ply_path: Path, out_dir: Path):
    mesh = read_ply(str(ply_path))
    verts = mesh["vertices"].astype(np.float32)
    colors = mesh.get("colors")
    colors = colors.astype(np.float32) if colors is not None else np.zeros((len(verts), 3), np.float32)
    n = len(verts)
    if "faces" in mesh and len(mesh["faces"]):
        segments, _ = segment_mesh(verts, mesh["faces"].astype(np.int32),
                                   colors / 255.0, 0.005, 50)
    else:
        cell = np.floor(verts / 0.5).astype(np.int64) + 4096
        _, segments = np.unique(
            cell[:, 0] * (1 << 26) + cell[:, 1] * (1 << 13) + cell[:, 2],
            return_inverse=True,
        )
    points = np.hstack([
        verts, colors, np.zeros((n, 3)),
        np.asarray(segments)[:, None],
        np.zeros((n, 1)), np.full((n, 1), -1),
    ]).astype(np.float32)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = ply_path.parent.name
    path = out_dir / f"{name}.npy"
    np.save(path, points)
    return {"filepath": str(path), "scene": name, "raw_filepath": str(ply_path)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--split", default="Training")
    args = ap.parse_args()

    save_dir = Path(args.save_dir)
    mode = "train" if args.split == "Training" else "validation"
    db = []
    for scene_dir in sorted((Path(args.data_dir) / args.split).iterdir()):
        plys = list(scene_dir.glob("*_3dod_mesh.ply")) or list(scene_dir.glob("*.ply"))
        if not plys:
            continue
        entry = process_scene(plys[0], save_dir / mode)
        db.append(entry)
        print(entry["scene"])
    with open(save_dir / f"{mode}_database.yaml", "w") as f:
        yaml.safe_dump(db, f)


if __name__ == "__main__":
    main()
