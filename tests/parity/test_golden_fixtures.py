"""Real-weight golden-fixture parity tests.

The reference ships fixtures computed by the REAL pretrained models
(`/root/reference/ios_test_data/`): `rmvpe_hidden.npy` is the (1, 1351,
360) salience the real RMVPE produced for the 13.5 s benchmark clip and
`rmvpe_f0.npy` the f0 its decoder emitted; `hubert_features.npy` is the
(1, 675, 256) real content-feature output. These let us validate the
decode stage and the retrieval/upsample/protect chain against
real-model activations without any weights in the environment
(reference fixture producer: `/root/reference/tools/export_ios_test_data.py`,
consumers `Demos/iOS/.../MLXParityTests`).
"""

import os

import numpy as np
import pytest

FIXTURES = "/root/reference/ios_test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference golden fixtures not present")


@pytest.fixture(scope="module")
def rmvpe_hidden():
    return np.load(os.path.join(FIXTURES, "rmvpe_hidden.npy"))


@pytest.fixture(scope="module")
def rmvpe_f0():
    return np.load(os.path.join(FIXTURES, "rmvpe_f0.npy")).astype(np.float64)


@pytest.fixture(scope="module")
def hubert_features():
    return np.load(os.path.join(FIXTURES, "hubert_features.npy")).astype(np.float32)


class TestRMVPEDecodeGolden:
    """decode_salience vs the real RMVPE's own decode
    (`rvc_mlx/lib/mlx/rmvpe.py:357-406`, thred=0.03 as in
    `infer_from_audio:408`)."""

    def test_f0_matches_real_decode(self, rmvpe_hidden, rmvpe_f0):
        import jax.numpy as jnp

        from rvc_tpu.models.rmvpe import decode_salience

        f0 = np.asarray(decode_salience(jnp.asarray(rmvpe_hidden), 0.03))[0]
        assert f0.shape == rmvpe_f0.shape

        voiced_ref = rmvpe_f0 > 0
        voiced = f0 > 0
        # exact voiced/unvoiced agreement on every one of the 1351 frames
        assert (voiced == voiced_ref).all()

        both = voiced & voiced_ref
        assert both.sum() > 500  # the clip is mostly speech
        cents = np.abs(1200.0 * np.log2(f0[both] / rmvpe_f0[both]))
        # measured: max 0.0014 cents (float roundoff only)
        assert cents.max() < 0.05

    def test_unvoiced_iff_below_threshold(self, rmvpe_hidden, rmvpe_f0):
        """The real decoder zeroes exactly the frames whose max salience
        is <= thred; confirm the fixture obeys that and we reproduce it."""
        import jax.numpy as jnp

        from rvc_tpu.models.rmvpe import decode_salience

        maxx = rmvpe_hidden[0].max(axis=-1)
        f0 = np.asarray(decode_salience(jnp.asarray(rmvpe_hidden), 0.03))[0]
        assert ((f0 == 0) == (maxx <= 0.03)).all()
        assert ((rmvpe_f0 == 0) == (maxx <= 0.03)).all()

    def test_f0_range_is_physical(self, rmvpe_hidden):
        import jax.numpy as jnp

        from rvc_tpu.models.rmvpe import decode_salience

        f0 = np.asarray(decode_salience(jnp.asarray(rmvpe_hidden), 0.03))[0]
        v = f0[f0 > 0]
        # RMVPE's 360 cents bins span ~32.7 Hz .. ~2006 Hz
        assert v.min() > 30.0 and v.max() < 2100.0


class TestHubertChainGolden:
    """Drive the retrieval / 2x-upsample / protect / coarse-quant chain
    from REAL content features (`pipeline_mlx.py:183-244` semantics)."""

    def test_self_retrieval_reconstructs(self, hubert_features):
        """An index built from the features themselves must return each
        query as its own nearest neighbor, and the 1/d^2 blend at
        index_rate=1 must reproduce the feature (zero-distance handling,
        `pipeline_mlx.py:183-204`)."""
        from rvc_tpu.retrieval.ivf import build_index, index_blend
        import jax.numpy as jnp

        q = hubert_features[0]  # (675, 256)
        idx = build_index(q, nprobe=1)
        d, i = idx.search(q, k=8)
        assert (i[:, 0] == np.arange(len(q))).mean() > 0.99
        assert d[:, 0].max() < 1e-3

        blended = np.asarray(index_blend(
            jnp.asarray(q), jnp.asarray(idx.vectors[i]), jnp.asarray(d), 1.0))
        assert np.isfinite(blended).all()
        # self-match at d~0 dominates the 1/d^2 weights
        err = np.abs(blended - q).max()
        assert err < 1e-2

    def test_blend_partial_rate(self, hubert_features):
        from rvc_tpu.retrieval.ivf import build_index, index_blend
        import jax.numpy as jnp

        q = hubert_features[0]
        idx = build_index(q, nprobe=1)
        d, i = idx.search(q, k=8)
        b = np.asarray(index_blend(jnp.asarray(q), jnp.asarray(idx.vectors[i]),
                                   jnp.asarray(d), 0.75))
        assert np.isfinite(b).all()
        lo = np.minimum(q.min(axis=0), idx.vectors.min(axis=0)) - 1e-4
        hi = np.maximum(q.max(axis=0), idx.vectors.max(axis=0)) + 1e-4
        assert (b >= lo).all() and (b <= hi).all()

    def test_upsample_protect_with_real_f0(self, hubert_features, rmvpe_f0):
        """Upsample 675 feature frames 2x and protect-blend with the real
        f0 contour, exactly as the pipeline aligns them
        (`pipeline_mlx.py:210-244`)."""
        import jax.numpy as jnp

        from rvc_tpu.pipelines.offline import _upsample_protect

        feats = jnp.asarray(hubert_features)       # (1, 675, 256)
        T2 = feats.shape[1] * 2                     # 1350
        pitchf = jnp.asarray(rmvpe_f0[:T2], dtype=jnp.float32)[None]
        rng = np.random.default_rng(0)
        feats_alt = feats + jnp.asarray(
            rng.standard_normal(feats.shape).astype(np.float32) * 0.1)

        out = np.asarray(_upsample_protect(feats_alt, feats, pitchf, 0.25))
        assert out.shape == (1, T2, 256)

        f_up = np.repeat(hubert_features[0], 2, axis=0)
        fa_up = np.repeat(np.asarray(feats_alt)[0], 2, axis=0)
        unvoiced = np.asarray(rmvpe_f0[:T2]) == 0
        expect = np.where(unvoiced[:, None], 0.25 * fa_up + 0.75 * f_up, fa_up)
        np.testing.assert_allclose(out[0], expect, atol=1e-5)

        # protect >= 0.5 disables the blend entirely
        out_off = np.asarray(_upsample_protect(feats_alt, feats, pitchf, 0.5))
        np.testing.assert_allclose(out_off[0], fa_up, atol=1e-6)

    def test_coarse_quant_of_real_f0(self, rmvpe_f0):
        """Real f0 contour -> 1..255 coarse bins; voiced frames spread
        over many bins, unvoiced map to bin 1 (`pipeline_mlx.py:150-157`)."""
        from rvc_tpu.pipelines.offline import coarse_f0, coarse_f0_jnp
        import jax.numpy as jnp

        f0 = rmvpe_f0.astype(np.float32)
        c = coarse_f0(f0)
        assert c.min() >= 1 and c.max() <= 255
        assert c[f0 == 0].max() == 1
        assert len(np.unique(c[f0 > 0])) > 20
        cj = np.asarray(coarse_f0_jnp(jnp.asarray(f0)))
        np.testing.assert_array_equal(c, cj)
