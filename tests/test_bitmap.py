"""Bit-packed map lookup tests (ops/bitmap.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from raycastworlds_tpu.ops import bitmap


def test_pack_and_lookup_roundtrip():
    rng = np.random.RandomState(0)
    for h, w in [(8, 16), (16, 16), (7, 5), (1, 32), (3, 3), (32, 32)]:
        m = rng.rand(h, w) < 0.3
        words = bitmap.pack_bits(jnp.asarray(m))
        assert words.shape == ((h * w + 31) // 32,)
        assert words.dtype == jnp.uint32
        idx = jnp.arange(h * w, dtype=jnp.int32)
        got = np.asarray(bitmap.lookup_bit(words, idx))
        np.testing.assert_array_equal(got, m.reshape(-1), err_msg=f"{h}x{w}")


def test_lookup_vmaps_over_envs():
    rng = np.random.RandomState(1)
    maps = rng.rand(4, 8, 16) < 0.5
    words = jax.vmap(bitmap.pack_bits)(jnp.asarray(maps))
    idx = jnp.arange(128, dtype=jnp.int32)
    got = np.asarray(jax.vmap(lambda w: bitmap.lookup_bit(w, idx))(words))
    np.testing.assert_array_equal(got, maps.reshape(4, -1))


def test_lookup_arbitrary_shape_indices():
    m = np.zeros((8, 16), bool)
    m[3, 7] = True
    words = bitmap.pack_bits(jnp.asarray(m))
    idx = jnp.array([[3 * 16 + 7, 0], [1, 3 * 16 + 7]], jnp.int32)
    got = np.asarray(bitmap.lookup_bit(words, idx))
    np.testing.assert_array_equal(got, [[True, False], [False, True]])


def test_take_rows_matches_indexing():
    from raycastworlds_tpu.ops import lut

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(128, 7, 2).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 128, size=(33,)), jnp.int32)
    a = np.asarray(jax.jit(lut.take_rows)(table, idx))
    b = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(a, b)  # bit-exact
    # scalar index under vmap
    f = jax.jit(jax.vmap(lambda i: lut.take_rows(table, i)))
    c = np.asarray(f(idx))
    np.testing.assert_array_equal(c, b)
