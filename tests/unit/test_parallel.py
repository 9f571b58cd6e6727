"""Multi-chip layer on the 8-virtual-device CPU mesh: mesh/sharding
rules, sharded train step, sharded batched inference, sharded retrieval."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rvc_tpu.parallel.mesh import make_mesh, param_shardings, _spec_for_array
from jax.sharding import PartitionSpec as P


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices, model=1
    assert mesh.shape["data"] == len(jax.devices())


def test_tp_rule():
    mesh = make_mesh(n_data=4, n_model=2)
    big = np.zeros((768, 3072), np.float32)
    small = np.zeros((16,), np.float32)
    assert _spec_for_array(big, 2) == P(None, "model")
    assert _spec_for_array(small, 2) == P()
    sh = param_shardings({"a": big, "b": small}, mesh)
    assert sh["a"].spec == P(None, "model")


@pytest.mark.slow
def test_sharded_batch_inference():
    from rvc_tpu.api import RVC
    from rvc_tpu.configs import get_config
    from rvc_tpu.parallel.infer import BatchConverter

    cfg = get_config(32000, model_spk_embed_dim=2, model_n_layers=1,
                     model_upsample_initial_channel=64)
    rvc = RVC(config=cfg, seed=0)
    mesh = make_mesh(n_data=8, n_model=1)
    bc = BatchConverter(rvc, mesh)
    B, T = 8, 4800  # 0.3 s per row
    rng = np.random.default_rng(0)
    t = np.arange(T) / 16000
    audio = np.stack([0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t) for i in range(B)])
    out = bc.convert_batch(audio.astype(np.float32))
    assert out.shape[0] == B
    assert np.isfinite(out).all()
    # per-row outputs differ (different pitches)
    assert np.abs(out[0] - out[1]).max() > 0


@pytest.mark.slow
def test_sharded_retrieval_matches_single(rng):
    """IVF search under a mesh: same results as unsharded."""
    from rvc_tpu.retrieval import build_index

    vectors = rng.standard_normal((512, 32)).astype(np.float32)
    idx = build_index(vectors, nlist=8)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    d_ref, i_ref = idx.search(q, k=8, nprobe=8)

    mesh = make_mesh(n_data=8, n_model=1)
    from jax.sharding import NamedSharding
    with jax.set_mesh(mesh):
        qs = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
        d2, i2 = idx.search_device(qs, k=8, nprobe=8)
    np.testing.assert_array_equal(np.asarray(i2), i_ref)
