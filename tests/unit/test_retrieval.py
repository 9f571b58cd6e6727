"""IVFFlat retrieval: exactness vs brute force, blend semantics, FAISS
file-format round trip (the reference validates the same invariants via
`test_index_parity.py` / `tools/validate_index_parity.py`)."""

import numpy as np
import jax.numpy as jnp

from rvc_tpu.retrieval import (
    IVFFlatIndex,
    build_index,
    index_blend,
    read_faiss_index,
    write_faiss_index,
)


def _brute_force(queries, vectors, k):
    d = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_flat_equivalence_high_nprobe(rng):
    """With nprobe == nlist, IVF search must equal brute force."""
    vectors = rng.standard_normal((500, 32)).astype(np.float32)
    queries = rng.standard_normal((20, 32)).astype(np.float32)
    idx = build_index(vectors, nlist=8)
    d, i = idx.search(queries, k=5, nprobe=8)
    bd, bi = _brute_force(queries, vectors, 5)
    np.testing.assert_array_equal(i, bi)
    np.testing.assert_allclose(d, bd, rtol=1e-3, atol=1e-3)


def test_nprobe1_semantics(rng):
    """nprobe=1 must only return vectors from the query's nearest list."""
    vectors = rng.standard_normal((400, 16)).astype(np.float32)
    idx = build_index(vectors, nlist=10)
    queries = vectors[:15] + 0.01 * rng.standard_normal((15, 16)).astype(np.float32)
    d, i = idx.search(queries, k=4, nprobe=1)
    cents = idx.centroids
    for qi, q in enumerate(queries):
        probe = ((q[None] - cents) ** 2).sum(-1).argmin()
        for ki in range(4):
            if np.isfinite(d[qi, ki]):
                assert idx.list_ids[i[qi, ki]] == probe


def test_self_query_returns_self(rng):
    vectors = rng.standard_normal((300, 24)).astype(np.float32)
    idx = build_index(vectors, nlist=6)
    d, i = idx.search(vectors[:10], k=1, nprobe=6)
    np.testing.assert_array_equal(i[:, 0], np.arange(10))
    assert (d[:, 0] < 1e-3).all()


def test_index_blend_weights(rng):
    feats = rng.standard_normal((5, 8)).astype(np.float32)
    neighbors = rng.standard_normal((5, 3, 8)).astype(np.float32)
    dist = np.abs(rng.standard_normal((5, 3))).astype(np.float32) + 0.1
    out = np.asarray(index_blend(jnp.asarray(feats), jnp.asarray(neighbors),
                                 jnp.asarray(dist), 0.75))
    w = 1.0 / dist**2
    w /= w.sum(1, keepdims=True)
    expected = 0.75 * (neighbors * w[:, :, None]).sum(1) + 0.25 * feats
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_faiss_roundtrip(tmp_path, rng):
    vectors = rng.standard_normal((200, 12)).astype(np.float32)
    idx = build_index(vectors, nlist=5, nprobe=1)
    p = str(tmp_path / "test.index")
    write_faiss_index(idx, p)
    idx2 = read_faiss_index(p)
    assert idx2.ntotal == idx.ntotal and idx2.nlist == idx.nlist
    np.testing.assert_allclose(idx2.centroids, idx.centroids, atol=1e-6)
    np.testing.assert_allclose(idx2.vectors, idx.vectors, atol=1e-6)
    np.testing.assert_array_equal(idx2.list_ids, idx.list_ids)
    # identical search results after round trip
    q = rng.standard_normal((7, 12)).astype(np.float32)
    d1, i1 = idx.search(q, k=8)
    d2, i2 = idx2.search(q, k=8)
    np.testing.assert_array_equal(i1, i2)


def test_reconstruct_n(rng):
    vectors = rng.standard_normal((100, 8)).astype(np.float32)
    idx = build_index(vectors, nlist=4)
    np.testing.assert_allclose(idx.reconstruct_n(0, idx.ntotal), vectors, atol=1e-6)


def test_default_nlist_formula():
    from rvc_tpu.retrieval.ivf import default_nlist

    # n_ivf = min(16*sqrt(N), N/39) as in extract_index.py:43
    assert default_nlist(100_000) == min(int(16 * np.sqrt(100_000)), 100_000 // 39)
    assert default_nlist(10) == 1


def test_kmeans_chunked_matches_dense(rng):
    """The memory-bounded chunked Lloyd's must be bit-equal in structure
    to the dense kernel (same assignments, same update rule)."""
    from rvc_tpu.retrieval.ivf import _kmeans_fit, kmeans_fit

    x = rng.standard_normal((500, 16)).astype(np.float32)
    init = x[:8].copy()
    dense = np.asarray(_kmeans_fit(jnp.asarray(x), jnp.asarray(init), 8, 5))
    chunked = kmeans_fit(x, init, 8, n_iters=5, chunk=64, max_dense_cells=0)
    np.testing.assert_allclose(chunked, dense, rtol=1e-4, atol=1e-5)


def test_add_chunked_assignment(rng):
    """Chunked add must produce identical list assignments to one-shot."""
    vectors = rng.standard_normal((300, 8)).astype(np.float32)
    idx1 = build_index(vectors, nlist=6)
    idx2 = IVFFlatIndex(centroids=idx1.centroids.copy(),
                        vectors=np.zeros((0, 8), np.float32),
                        list_ids=np.zeros((0,), np.int32))
    idx2.add(vectors, chunk=37)
    np.testing.assert_array_equal(idx1.list_ids, idx2.list_ids)
