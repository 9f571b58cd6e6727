"""Dataset builder: validated filelists with frame filters + train/val split.

Capability parity with `rvc_mlx/preprocess/dataset_builder.py` and
`rvc/train/extract/preparing_files.py`: rows of
``audio|features|f0|f0_coarse|sid|spec``, min/max frame filter (50..900,
the torch loader's bucket bounds), deterministic shuffled split.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import numpy as np

MIN_FRAMES = 50
MAX_FRAMES = 900


class DatasetBuilder:
    def __init__(self, exp_dir: str, min_frames: int = MIN_FRAMES,
                 max_frames: int = MAX_FRAMES):
        self.exp_dir = exp_dir
        self.min_frames = min_frames
        self.max_frames = max_frames

    def collect(self) -> List[dict]:
        gt = os.path.join(self.exp_dir, "sliced_audios")
        feats = os.path.join(self.exp_dir, "features")
        f0d = os.path.join(self.exp_dir, "f0_voiced")
        f0c = os.path.join(self.exp_dir, "f0")
        spec = os.path.join(self.exp_dir, "spec")
        rows = []
        for f in sorted(os.listdir(feats) if os.path.isdir(feats) else []):
            if not f.endswith(".npy"):
                continue
            name = os.path.splitext(f)[0]
            paths = {
                "audio": os.path.join(gt, name + ".wav"),
                "features": os.path.join(feats, f),
                "f0": os.path.join(f0d, f),
                "f0_coarse": os.path.join(f0c, f),
                "spec": os.path.join(spec, f),
            }
            if not all(os.path.exists(p) for p in paths.values()):
                continue
            try:
                n_frames = np.load(paths["spec"], mmap_mode="r").shape[0]
            except Exception:
                continue
            if not (self.min_frames <= n_frames <= self.max_frames):
                continue
            sid = int(name.split("_")[0]) if name.split("_")[0].isdigit() else 0
            rows.append({**paths, "sid": sid, "n_frames": int(n_frames)})
        return rows

    def build(self, val_fraction: float = 0.02, seed: int = 1234
              ) -> Tuple[List[dict], List[dict]]:
        rows = self.collect()
        rng = random.Random(seed)
        rng.shuffle(rows)
        n_val = max(1, int(len(rows) * val_fraction)) if len(rows) > 1 else 0
        return rows[n_val:], rows[:n_val]

    def write_filelist(self, path: str, rows: List[dict]) -> None:
        with open(path, "w") as f:
            for r in rows:
                f.write("|".join([r["audio"], r["features"], r["f0"],
                                  r["f0_coarse"], str(r["sid"]), r["spec"]]) + "\n")

    @staticmethod
    def read_filelist(path: str) -> List[dict]:
        rows = []
        with open(path) as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) < 5:
                    continue
                row = {"audio": parts[0], "features": parts[1], "f0": parts[2],
                       "f0_coarse": parts[3], "sid": int(parts[4])}
                if len(parts) > 5:
                    row["spec"] = parts[5]
                rows.append(row)
        return rows
