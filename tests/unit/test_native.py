"""Native C++ runtime kernels vs their Python references."""

import numpy as np
import pytest
from scipy import signal as sp_signal

from rvc_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library build unavailable")


def test_pcm_roundtrip(rng):
    x = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    i16 = native.f32_to_i16(x)
    back = native.i16_to_f32(i16)
    np.testing.assert_allclose(back, np.clip(x, -1, 1), atol=1.0 / 16000)


def test_sola_align_matches_scipy(rng):
    cross, search = 480, 160
    ref = rng.standard_normal(cross).astype(np.float32)
    x = np.concatenate([rng.standard_normal(37).astype(np.float32) * 0.1,
                        ref + 0.01 * rng.standard_normal(cross).astype(np.float32),
                        rng.standard_normal(200).astype(np.float32) * 0.1])
    x = x[: cross + search].astype(np.float32)
    off_native = native.sola_align(x, ref, search)
    cor_nom = sp_signal.correlate(x, ref, mode="valid")
    cor_den = np.sqrt(sp_signal.correlate(x ** 2, np.ones(cross), mode="valid") + 1e-8)
    off_py = int(np.argmax(cor_nom / cor_den))
    assert off_native == off_py == 37


def test_native_faiss_reader_matches_python(tmp_path, rng):
    from rvc_tpu.retrieval import build_index, write_faiss_index
    from rvc_tpu.retrieval.faiss_io import read_faiss_index

    vectors = rng.standard_normal((300, 16)).astype(np.float32)
    idx = build_index(vectors, nlist=6, nprobe=2)
    p = str(tmp_path / "n.index")
    write_faiss_index(idx, p)

    parsed = native.faiss_ivf_read(p)
    assert parsed is not None
    centroids, vecs, list_ids, nprobe, metric = parsed
    np.testing.assert_allclose(centroids, idx.centroids, atol=1e-6)
    np.testing.assert_allclose(vecs, idx.vectors, atol=1e-6)
    np.testing.assert_array_equal(list_ids, idx.list_ids)
    assert nprobe == 2 and metric == "l2"

    # and the public read path (which prefers native) round-trips
    idx2 = read_faiss_index(p)
    np.testing.assert_allclose(idx2.vectors, idx.vectors, atol=1e-6)
