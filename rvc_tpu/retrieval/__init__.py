"""Retrieval (the "R" in RVC): IVFFlat index build/search/blend.

Capability parity with the reference's FAISS usage
(`rvc/train/process/extract_index.py`, `rvc_mlx/infer/pipeline_mlx.py:183-204`)
without the C++ dependency: a TPU-native IVFFlat (k-means training, coarse
quantization, exact masked top-k search on the MXU) plus a binary
reader/writer for FAISS's on-disk IVFFlat format so existing .index files
interoperate both ways.
"""

from rvc_tpu.retrieval.ivf import IVFFlatIndex, build_index, index_blend
from rvc_tpu.retrieval.faiss_io import read_faiss_index, write_faiss_index

__all__ = [
    "IVFFlatIndex",
    "build_index",
    "index_blend",
    "read_faiss_index",
    "write_faiss_index",
]
