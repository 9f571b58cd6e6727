"""Param packing round trip + jit-internal unpack."""

import numpy as np
import jax
import jax.numpy as jnp

from rvc_tpu.utils.packing import pack_tree, unpack_tree


def test_pack_roundtrip(rng):
    tree = {"a": {"w": rng.standard_normal((3, 4)).astype(np.float32),
                  "b": rng.standard_normal((4,)).astype(np.float32)},
            "c": rng.standard_normal((2, 2, 2)).astype(np.float32)}
    buf, spec = pack_tree(tree)
    assert buf.shape == (3 * 4 + 4 + 8,)
    out = unpack_tree(buf, spec)
    for path in (("a", "w"), ("a", "b"), ("c",)):
        a = tree
        b = out
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)


def test_unpack_inside_jit(rng):
    tree = {"w": rng.standard_normal((8, 8)).astype(np.float32),
            "b": rng.standard_normal((8,)).astype(np.float32)}
    buf, spec = pack_tree(tree)
    x = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))

    @jax.jit
    def f(buf, x):
        p = unpack_tree(buf, spec)
        return x @ p["w"] + p["b"]

    out = np.asarray(f(buf, x))
    ref = np.asarray(x) @ tree["w"] + tree["b"]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pack_preserves_dtype():
    tree = {"i": np.arange(4, dtype=np.int32), "f": np.ones(3, np.float32)}
    buf, spec = pack_tree(tree)
    out = unpack_tree(buf, spec)
    assert out["i"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out["i"]), np.arange(4))
