"""TPU-native IVFFlat index.

Reproduces the reference's retrieval semantics exactly
(`extract_index.py:43-70` build: ``IVF{n_ivf},Flat`` with
``n_ivf = min(16*sqrt(N), N/39)``, nprobe=1; `pipeline_mlx.py:183-204`
query: k=8 L2 search, 1/d^2 weights, weighted neighbor reconstruction),
redesigned for the MXU: instead of CPU inverted-list scans, search is one
dense (Q, N) distance matmul masked to the probed lists — exact IVF
results, no gathers, and it shards cleanly over a device mesh (each shard
scans its slice of vectors; a global top-k merges partials).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def _kmeans_fit(x: jax.Array, init: jax.Array, n_clusters: int, n_iters: int = 25):
    """Lloyd's k-means, jitted. x: (N, D); init: (K, D) -> centroids (K, D)."""
    x_sq = jnp.sum(x * x, axis=1)

    def step(centroids, _):
        d = x_sq[:, None] - 2.0 * (x @ centroids.T) + jnp.sum(centroids**2, axis=1)[None, :]
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)  # (N, K)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, init, None, length=n_iters)
    return centroids


@partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def _kmeans_fit_chunked(x: jax.Array, mask: jax.Array, init: jax.Array,
                        n_clusters: int, n_iters: int = 25):
    """Memory-bounded Lloyd's: x pre-chunked to (n_chunks, C, D) with a
    (n_chunks, C) validity mask. Each iteration scans the chunks and
    accumulates per-cluster sums/counts, so peak memory is O(C * K)
    instead of O(N * K) — the reference reaches for MiniBatchKMeans at
    this scale (`extract_index.py:37-42`); full Lloyd's over chunks is
    deterministic and just as cheap on the MXU."""

    def iteration(centroids, _):
        c_sq = jnp.sum(centroids * centroids, axis=1)

        def body(carry, xc_mc):
            sums, counts = carry
            xc, mc = xc_mc
            d = (jnp.sum(xc * xc, axis=1)[:, None] - 2.0 * (xc @ centroids.T)
                 + c_sq[None, :])
            assign = jnp.argmin(d, axis=1)
            one_hot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
            one_hot = one_hot * mc[:, None]
            return (sums + one_hot.T @ xc, counts + one_hot.sum(axis=0)), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros_like(centroids), jnp.zeros((n_clusters,), x.dtype)),
            (x, mask))
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(iteration, init, None, length=n_iters)
    return centroids


def kmeans_fit(x: np.ndarray, init: np.ndarray, n_clusters: int,
               n_iters: int = 25, chunk: int = 8192,
               max_dense_cells: int = 1 << 27) -> np.ndarray:
    """K-means entry point that bounds device memory: the dense one-shot
    kernel when N*K is small, otherwise the chunked scan (O(chunk*K))."""
    x = np.asarray(x, dtype=np.float32)
    n = len(x)
    if n * n_clusters <= max_dense_cells:
        return np.asarray(_kmeans_fit(jnp.asarray(x), jnp.asarray(init),
                                      n_clusters, n_iters))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = np.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
    mask = np.zeros((n_chunks, chunk), np.float32)
    mask.reshape(-1)[:n] = 1.0
    return np.asarray(_kmeans_fit_chunked(
        jnp.asarray(xp), jnp.asarray(mask), jnp.asarray(init),
        n_clusters, n_iters))


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search(
    queries: jax.Array,     # (Q, D)
    vectors: jax.Array,     # (N, D)
    vec_sq: jax.Array,      # (N,)
    list_ids: jax.Array,    # (N,) int32 list assignment per vector
    centroids: jax.Array,   # (K, D)
    k: int,
    nprobe: int,
):
    """Exact IVF search: probe the nprobe nearest lists per query, take the
    k nearest vectors among them (squared-L2, FAISS metric)."""
    q_sq = jnp.sum(queries * queries, axis=1)
    cd = (q_sq[:, None] - 2.0 * (queries @ centroids.T)
          + jnp.sum(centroids * centroids, axis=1)[None, :])
    _, probes = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)

    d = q_sq[:, None] - 2.0 * (queries @ vectors.T) + vec_sq[None, :]  # (Q, N)
    in_probe = (list_ids[None, :, None] == probes[:, None, :]).any(axis=-1)  # (Q, N)
    d = jnp.where(in_probe, d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


@partial(jax.jit, static_argnames=("k",))
def _flat_search(queries, vectors, vec_sq, k: int):
    q_sq = jnp.sum(queries * queries, axis=1)
    d = q_sq[:, None] - 2.0 * (queries @ vectors.T) + vec_sq[None, :]
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


@jax.jit
def index_blend(feats: jax.Array, neighbors: jax.Array, distances: jax.Array,
                index_rate: float) -> jax.Array:
    """RVC retrieval blend: weights = normalized 1/d^2, weighted neighbor
    sum, linear mix with the original features by index_rate
    (`pipeline_mlx.py:183-204`). feats (T, C); neighbors (T, k, C);
    distances (T, k)."""
    w = 1.0 / jnp.maximum(distances, 1e-12) ** 2
    w = w / jnp.sum(w, axis=1, keepdims=True)
    blended = jnp.sum(neighbors * w[:, :, None], axis=1)
    return index_rate * blended + (1.0 - index_rate) * feats


@dataclass
class IVFFlatIndex:
    """In-memory IVFFlat: centroids + vectors sorted by list + per-vector ids.

    ``vectors`` are stored in original insertion order; ``list_ids`` holds
    each vector's coarse assignment so search can mask instead of scan.
    """

    centroids: np.ndarray          # (nlist, d)
    vectors: np.ndarray            # (N, d) in id order
    list_ids: np.ndarray           # (N,) int32
    nprobe: int = 1
    metric: str = "l2"

    _device = None

    @property
    def d(self) -> int:
        return self.vectors.shape[1]

    @property
    def ntotal(self) -> int:
        return self.vectors.shape[0]

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def is_trained(self) -> bool:
        return True

    def _dev(self):
        if self._device is None:
            v = jnp.asarray(self.vectors)
            self._device = (
                v,
                jnp.sum(v * v, axis=1),
                jnp.asarray(self.list_ids.astype(np.int32)),
                jnp.asarray(self.centroids),
            )
        return self._device

    def search(self, queries: np.ndarray, k: int = 8,
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, d) -> (squared distances (Q, k), indices (Q, k)). Exact
        FAISS-IVF semantics at the configured nprobe."""
        v, v_sq, lids, cents = self._dev()
        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        d, i = _ivf_search(q, v, v_sq, lids, cents, k, int(nprobe or self.nprobe))
        return np.asarray(d), np.asarray(i)

    def search_device(self, queries: jax.Array, k: int = 8,
                      nprobe: Optional[int] = None):
        """Device-resident search for use inside larger jitted pipelines."""
        v, v_sq, lids, cents = self._dev()
        return _ivf_search(queries, v, v_sq, lids, cents, k, int(nprobe or self.nprobe))

    def reconstruct_n(self, start: int = 0, n: Optional[int] = None) -> np.ndarray:
        n = self.ntotal if n is None else n
        return self.vectors[start : start + n].copy()

    def add(self, vectors: np.ndarray, chunk: int = 65536) -> None:
        vectors = np.asarray(vectors, dtype=np.float32)
        cents = jnp.asarray(self.centroids)
        c_sq = jnp.sum(cents * cents, axis=1)
        parts = []
        # chunked assignment: O(chunk * nlist) device memory, not O(N * nlist)
        for j in range(0, len(vectors), chunk):
            v = jnp.asarray(vectors[j : j + chunk])
            d = (jnp.sum(v * v, axis=1)[:, None] - 2.0 * (v @ cents.T)
                 + c_sq[None, :])
            parts.append(np.asarray(jnp.argmin(d, axis=1), dtype=np.int32))
        assign = np.concatenate(parts) if parts else np.zeros((0,), np.int32)
        self.vectors = np.concatenate([self.vectors, vectors], axis=0) if self.ntotal else vectors
        self.list_ids = np.concatenate([self.list_ids, assign]) if self.list_ids.size else assign
        self._device = None


def default_nlist(n: int) -> int:
    """FAISS factory sizing used by the reference: n_ivf = min(16*sqrt(N), N/39)."""
    return max(1, min(int(16 * math.sqrt(n)), n // 39 if n >= 39 else 1))


def build_index(
    features: np.ndarray,
    nlist: Optional[int] = None,
    nprobe: int = 1,
    seed: int = 0,
    kmeans_iters: int = 25,
    max_train_points: int = 200_000,
) -> IVFFlatIndex:
    """Train + populate an IVFFlat from (N, d) features.

    Mirrors `extract_index.py:29-70`: shuffled features, optional
    subsampled k-means training (the reference uses MiniBatchKMeans 10k
    centroids above 2e5 vectors; we subsample the training set instead),
    then add all vectors.
    """
    features = np.asarray(features, dtype=np.float32)
    n, d = features.shape
    nlist = nlist or default_nlist(n)
    rng = np.random.default_rng(seed)

    train = features
    if n > max_train_points:
        train = features[rng.choice(n, max_train_points, replace=False)]
    init = train[rng.choice(len(train), nlist, replace=len(train) < nlist)]
    centroids = kmeans_fit(train, init, nlist, kmeans_iters)

    idx = IVFFlatIndex(
        centroids=centroids,
        vectors=np.zeros((0, d), dtype=np.float32),
        list_ids=np.zeros((0,), dtype=np.int32),
        nprobe=nprobe,
    )
    idx.add(features)
    return idx
