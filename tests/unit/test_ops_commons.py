"""Masks, WaveNet gate, and segment slicing invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from rvc_tpu.ops.commons import (
    sequence_mask,
    fused_add_tanh_sigmoid_multiply,
    slice_segments,
    rand_slice_segments,
)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.array([1, 3, 5]), 5))
    assert m.shape == (3, 5)
    assert m[0].sum() == 1 and m[1].sum() == 3 and m[2].sum() == 5
    assert (m[1, :3] == 1).all() and (m[1, 3:] == 0).all()


def test_fused_gate(rng):
    a = rng.standard_normal((2, 7, 8)).astype(np.float32)
    b = rng.standard_normal((2, 7, 8)).astype(np.float32)
    out = np.asarray(fused_add_tanh_sigmoid_multiply(jnp.asarray(a), jnp.asarray(b), 4))
    s = a + b
    ref = np.tanh(s[..., :4]) * (1.0 / (1.0 + np.exp(-s[..., 4:])))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_slice_segments_3d(rng):
    x = rng.standard_normal((3, 20, 4)).astype(np.float32)
    ids = jnp.array([0, 5, 12])
    out = np.asarray(slice_segments(jnp.asarray(x), ids, 8))
    assert out.shape == (3, 8, 4)
    np.testing.assert_array_equal(out[1], x[1, 5:13])


def test_slice_segments_2d(rng):
    x = rng.standard_normal((3, 20)).astype(np.float32)
    ids = jnp.array([2, 0, 11])
    out = np.asarray(slice_segments(jnp.asarray(x), ids, 9))
    assert out.shape == (3, 9)
    np.testing.assert_array_equal(out[2], x[2, 11:20])


def test_rand_slice_segments_bounds(rng):
    x = rng.standard_normal((4, 50, 2)).astype(np.float32)
    lengths = jnp.array([50, 30, 12, 10])
    seg, ids = rand_slice_segments(jnp.asarray(x), lengths, 10, jax.random.PRNGKey(0))
    ids = np.asarray(ids)
    assert seg.shape == (4, 10, 2)
    assert (ids >= 0).all()
    assert (ids <= np.maximum(np.asarray(lengths) - 10, 0)).all()


def test_slice_segments_jittable(rng):
    x = jnp.asarray(rng.standard_normal((2, 30, 3)).astype(np.float32))
    f = jax.jit(lambda x, i: slice_segments(x, i, 7))
    out = f(x, jnp.array([1, 2]))
    assert out.shape == (2, 7, 3)
