"""S3DIS raw annotations -> per-room npy files (XYZRGBL).

Reference: /root/reference/data/collect_indoor3d_data.py +
data/indoor3d_util.py:35-75 (collect_point_label). Walks
Area_X/room/Annotations/*.txt instance files, maps instance class names to the
13 S3DIS labels (unknown classes -> clutter, including the dataset's 'staris'
typo), shifts the room so the minimum corner sits at the origin, and saves
Area_X_room.npy consumable by data.datasets.S3DISDataset.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..data.classmaps import S3DIS_NAMES

CLASS2LABEL = {name: i for i, name in enumerate(S3DIS_NAMES)}


def collect_point_label(anno_path: str, out_filename: str,
                        file_format: str = "numpy") -> np.ndarray:
    """One room's Annotations/ dir -> [N, 7] XYZRGBL array (+ save)."""
    points_list = []
    for f in sorted(glob.glob(os.path.join(anno_path, "*.txt"))):
        cls = os.path.basename(f).split("_")[0]
        if cls not in CLASS2LABEL:  # e.g. 'staris' in some rooms
            cls = "clutter"
        pts = np.loadtxt(f)
        labels = np.full((pts.shape[0], 1), CLASS2LABEL[cls], dtype=pts.dtype)
        points_list.append(np.concatenate([pts, labels], axis=1))
    data_label = np.concatenate(points_list, axis=0)
    data_label[:, 0:3] -= np.amin(data_label, axis=0)[0:3]
    if file_format == "numpy":
        np.save(out_filename, data_label)
    elif file_format == "txt":
        np.savetxt(out_filename, data_label,
                   fmt="%f %f %f %d %d %d %d".split())
    else:
        raise ValueError(f"unknown file format {file_format}")
    return data_label


def collect_dataset(raw_root: str, output_folder: str) -> list[str]:
    """Walk Area_*/room/Annotations dirs producing Area_X_room.npy files."""
    os.makedirs(output_folder, exist_ok=True)
    outputs = []
    for anno_path in sorted(glob.glob(os.path.join(raw_root, "Area_*", "*",
                                                   "Annotations"))):
        parts = anno_path.rstrip("/").split(os.sep)
        out_name = f"{parts[-3]}_{parts[-2]}.npy"
        out_path = os.path.join(output_folder, out_name)
        try:
            collect_point_label(anno_path, out_path, "numpy")
            outputs.append(out_path)
        except Exception as e:  # mirror the reference's per-room tolerance
            print(anno_path, "ERROR!!", e)
    return outputs


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("raw_root", help="Stanford3dDataset_v1.2_Aligned_Version dir")
    ap.add_argument("-o", "--output", default="./data/stanford_indoor3d")
    args = ap.parse_args()
    outs = collect_dataset(args.raw_root, args.output)
    print(f"collected {len(outs)} rooms")
