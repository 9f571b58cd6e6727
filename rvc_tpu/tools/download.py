"""Model/prerequisite downloader.

Capability parity with `rvc*/lib/tools/model_download.py` and
`prerequisites_download.py`: fetch voice models (zip/pth/index links) and
the standard pretrained asset set from HuggingFace. Degrades with a clear
error in air-gapped environments.
"""

from __future__ import annotations

import os
import sys
import urllib.request
import zipfile

HF_BASE = "https://huggingface.co/IAHispano/Applio/resolve/main"

PREREQUISITES = {
    "predictors": ["rmvpe.pt", "fcpe.pt"],
    "embedders": ["contentvec/pytorch_model.bin", "contentvec/config.json"],
    "pretrained_v2": [
        f"{kind}{sr}.pth"
        for sr in ("32k", "40k", "48k")
        for kind in ("f0G", "f0D")
    ],
}


def _fetch(url: str, dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    try:
        urllib.request.urlretrieve(url, dest)
    except Exception as e:
        raise RuntimeError(
            f"download failed ({e}); this environment may be air-gapped — "
            f"place the file manually at {dest}") from e
    return dest


def download_model(link: str, output_dir: str = "models") -> str:
    os.makedirs(output_dir, exist_ok=True)
    name = link.rstrip("/").split("/")[-1].split("?")[0] or "model.zip"
    dest = os.path.join(output_dir, name)
    _fetch(link, dest)
    if dest.endswith(".zip"):
        with zipfile.ZipFile(dest) as z:
            z.extractall(output_dir)
    return dest


def download_prerequisites(pretraineds: bool = False, models: bool = True,
                           base_dir: str = "models") -> None:
    jobs = []
    if models:
        jobs += [(f"{HF_BASE}/predictors/{f}", os.path.join(base_dir, "predictors", f))
                 for f in PREREQUISITES["predictors"]]
        jobs += [(f"{HF_BASE}/embedders/{f}", os.path.join(base_dir, "embedders", f))
                 for f in PREREQUISITES["embedders"]]
    if pretraineds:
        jobs += [(f"{HF_BASE}/pretrained_v2/{f}",
                  os.path.join(base_dir, "pretrained_v2", f))
                 for f in PREREQUISITES["pretrained_v2"]]
    for url, dest in jobs:
        if os.path.exists(dest):
            print(f"exists: {dest}")
            continue
        print(f"fetching {url}")
        _fetch(url, dest)
