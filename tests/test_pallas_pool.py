"""Pallas stem max-pool parity vs lax.reduce_window (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.ops import pallas_pool as P


def _ref(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 24, 5),
                                   (1, 8, 8, 3)])
def test_pool_parity(rng, shape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = P.max_pool_3x3_s2_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(x)))


def test_pool_parity_bf16(rng):
    """bf16 in, bf16 out, exact: a max returns one of its inputs."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    got = P.max_pool_3x3_s2_pallas(x, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(_ref(x.astype(jnp.float32))))


def test_pool_multi_tile_halo(rng):
    """Force oht < H/2 so tile-boundary rows exercise the halo block:
    (64, 64, 128) -> per-out-row ~1 MB of f32 intermediates, over the
    6 MB budget at full height."""
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 128)).astype(np.float32))
    assert P._pick_oht(32, 32, 128) < 32
    got = P.max_pool_3x3_s2_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(x)))


def test_auto_falls_back_when_training_or_odd(rng):
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 4)).astype(np.float32))
    # train=True must stay differentiable (reduce_window path)
    g = jax.grad(lambda x: jnp.sum(P.max_pool_3x3_s2_auto(x, train=True)))(x)
    assert np.isfinite(np.asarray(g)).all()
    # odd dims route to reduce_window too (identical values)
    x_odd = jnp.asarray(rng.normal(size=(1, 9, 9, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(P.max_pool_3x3_s2_auto(x_odd)), np.asarray(_ref(x_odd)))
