"""Unit tests for buffers/latency/activations (mirrors reference
test/test_utils.py: deterministic latency via pinned distributions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax import utils


def test_activation_fn_map():
    assert utils.activation_fn_map("relu") is jax.nn.relu
    assert utils.activation_fn_map("SIGMOID") is jax.nn.sigmoid
    assert utils.activation_fn_map("elu") is jax.nn.elu
    assert utils.activation_fn_map("tanh") is jnp.tanh
    assert utils.activation_fn_map("softmax") is jax.nn.softmax
    with pytest.raises(KeyError):
        utils.activation_fn_map("swish")


def test_circular_buffer_push_back():
    buf = jnp.asarray(np.arange(6).reshape(2, 3), jnp.float32)
    out = utils.circular_buffer_push_back(buf, jnp.array([10.0, 20.0]))
    np.testing.assert_array_equal(out, [[1, 2, 10], [4, 5, 20]])


def test_circular_buffer_push_front():
    buf = jnp.asarray(np.arange(6).reshape(2, 3), jnp.float32)
    out = utils.circular_buffer_push_front(buf, jnp.array([10.0, 20.0]))
    np.testing.assert_array_equal(out, [[10, 0, 1], [20, 3, 4]])


def test_sample_lagged_value_fixed_lag():
    """distribution [0,0,0,1] => always the 3-step-old column."""
    rng = jax.random.PRNGKey(0)
    buf = jnp.zeros((2, 4))
    dist = jnp.array([0.0, 0.0, 0.0, 1.0])
    vals = [jnp.array([float(i), float(10 + i)]) for i in range(6)]
    outs = []
    for v in vals:
        rng, key = jax.random.split(rng)
        out, buf = utils.sample_lagged_value(key, buf, v, dist)
        outs.append(out)
    # after pushing v0..v5, sampling the last column = value from 3 pushes ago
    np.testing.assert_allclose(outs[3], vals[0])
    np.testing.assert_allclose(outs[5], vals[2])


def test_sample_lagged_value_matches_jax_choice():
    """The one-hot column select must be bit-identical to the reference's
    ``jax.random.choice(rng, buf, axis=1, p=dist)`` for every key — the
    latency draw is part of the env's parity-pinned RNG stream
    (reference utils.py:65-69)."""
    dist = jnp.array([0.6, 0.25, 0.1, 0.05])
    for seed in range(50):
        rng = jax.random.PRNGKey(seed)
        buf = jax.random.normal(jax.random.fold_in(rng, 1), (12, 4))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (12,))
        out, new_buf = utils.sample_lagged_value(rng, buf, v, dist)
        pushed = utils.circular_buffer_push_front(buf, v)
        expected = jax.random.choice(rng, pushed, axis=1, p=dist)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))
        np.testing.assert_array_equal(np.asarray(new_buf), np.asarray(pushed))


def test_sample_lagged_value_no_lag():
    """buffer depth 1 with distribution [1] => identity."""
    rng = jax.random.PRNGKey(0)
    buf = jnp.zeros((3, 1))
    dist = jnp.array([1.0])
    v = jnp.array([1.0, 2.0, 3.0])
    out, buf = utils.sample_lagged_value(rng, buf, v, dist)
    np.testing.assert_allclose(out, v)


def test_fuzzy_search():
    class Obj:
        def observation_size(self):
            pass

    results = utils.fuzzy_search(Obj(), "observation_size")
    assert results and results[0][0] == "observation_size"
