"""Unit conversion / navigation primitive tests (ops missing from the
reference's own suite; see SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

from raycastworlds_tpu.ops import units


def test_wu_to_tu():
    # 0-indexed: tile i spans [i, i+1)
    assert int(units.wu_to_tu(jnp.float32(0.0))) == 0
    assert int(units.wu_to_tu(jnp.float32(0.999))) == 0
    assert int(units.wu_to_tu(jnp.float32(1.0))) == 1
    assert int(units.wu_to_tu(jnp.float32(7.5))) == 7


def test_wu_to_pu():
    assert int(units.wu_to_pu(jnp.float32(0.5), 32)) == 16
    assert int(units.wu_to_pu(jnp.float32(1.0), 32)) == 32
    assert int(units.wu_to_pu(jnp.float32(0.0), 32)) == 0


def test_pu_to_tu():
    assert int(units.pu_to_tu(jnp.int32(0), 32)) == 0
    assert int(units.pu_to_tu(jnp.int32(31), 32)) == 0
    assert int(units.pu_to_tu(jnp.int32(32), 32)) == 1


def test_turns_are_modular():
    d = 128
    assert int(units.turn_left(jnp.int32(127), d)) == 0
    assert int(units.turn_right(jnp.int32(0), d)) == 127
    assert int(units.turn_left(jnp.int32(5), d)) == 6
    assert int(units.turn_right(jnp.int32(5), d)) == 4


def test_moves():
    pos = jnp.array([1.5, 2.5], jnp.float32)
    d = jnp.array([1.0, 0.0], jnp.float32)
    fwd = units.move_forward(pos, d, 0.125)
    bwd = units.move_backward(pos, d, 0.125)
    np.testing.assert_allclose(np.asarray(fwd), [1.625, 2.5])
    np.testing.assert_allclose(np.asarray(bwd), [1.375, 2.5])
