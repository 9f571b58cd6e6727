"""HuBERT encoder parity vs transformers' torch HubertModel (the same
implementation family the reference loads ContentVec weights into,
`rvc/infer/infer.py:64`)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import jax

from rvc_tpu.models.hubert import HubertConfig, HubertModel
from rvc_tpu.utils.weights import convert_hubert_state_dict

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        hidden_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=192,
        conv_dim=[48] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )
    tmodel = HFModel(hf_cfg).eval()
    cfg = HubertConfig(hidden_size=96, num_hidden_layers=2, num_attention_heads=4,
                       intermediate_size=192, conv_dim=48)
    model = HubertModel(cfg)
    params = {"params": convert_hubert_state_dict(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})}
    return tmodel, model, params


def test_hubert_parity(hf_pair, rng):
    tmodel, model, params = hf_pair
    audio = (0.1 * rng.standard_normal((1, 8000))).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(audio)).last_hidden_state.numpy()
    out = np.asarray(model.apply(params, jnp.asarray(audio)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_hubert_frame_rate(hf_pair):
    _, model, params = hf_pair
    # 320 samples per frame after the 7-conv stack
    audio = jnp.zeros((1, 16000))
    out = model.apply(params, audio)
    assert out.shape[1] == 49  # (16000 - offsets) // 320


def test_hubert_jit(hf_pair, rng):
    _, model, params = hf_pair
    audio = jnp.asarray((0.1 * rng.standard_normal((1, 4000))).astype(np.float32))
    f = jax.jit(model.apply)
    o1 = f(params, audio)
    o2 = f(params, audio)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
