"""ops.select correctness: must exactly reproduce gather/scatter semantics
(both backends), including duplicate accumulation in add_rows."""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

from puppax.ops import select


@pytest.fixture(params=["einsum", "vpu"])
def impl(request, monkeypatch):
    monkeypatch.setattr(select, "_IMPL", request.param)
    return request.param


def test_take_rows(impl):
    x = jnp.arange(24.0).reshape(6, 4)
    idx = (3, 0, 5)
    np.testing.assert_array_equal(select.take_rows(x, idx), x[jnp.asarray(idx)])
    # higher-rank trailing dims
    y = jnp.arange(54.0).reshape(6, 3, 3)
    np.testing.assert_array_equal(select.take_rows(y, idx), y[jnp.asarray(idx)])


def test_set_rows(impl):
    x = jnp.ones((5, 3))
    vals = jnp.arange(6.0).reshape(2, 3) + 10.0
    out = select.set_rows(x, (1, 4), vals)
    expected = x.at[jnp.asarray((1, 4))].set(vals)
    np.testing.assert_array_equal(out, expected)


def test_add_rows_accumulates_duplicates(impl):
    x = jnp.zeros(4)
    vals = jnp.asarray([1.0, 2.0, 5.0])
    out = select.add_rows(x, (2, 2, 0), vals)
    np.testing.assert_array_equal(out, jnp.asarray([5.0, 0.0, 3.0, 0.0]))


def test_exactness_on_awkward_floats(impl):
    """Values that bf16 cannot represent must pass through bit-exact —
    the reason the einsum path pins HIGHEST precision."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32) * 1e-3 + 1.0)
    idx = (6, 2, 2, 0)
    out = select.take_rows(x, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[list(idx)])
