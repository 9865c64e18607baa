"""Spatial (H-axis) sharding: GSPMD conv halo exchange produces the same
forward results as unsharded execution — the context-parallel analog."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.models import CenterNet
from centernet_lightning_tpu.parallel import (
    create_mesh,
    replicated,
    spatial_sharding,
)

IMG = 64


def test_spatially_sharded_forward_matches_unsharded(rng):
    assert jax.device_count() == 8
    mesh = create_mesh(n_data=2, n_model=4)  # H split 4-ways

    task = CenterNet(num_classes=3, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 32},
                     head_config={"width": 16, "depth": 1})
    variables = task.init(jax.random.PRNGKey(0), image_size=(IMG, IMG))

    images = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))

    fwd = jax.jit(lambda v, x: task.model.apply(v, x, train=False))
    ref = jax.device_get(fwd(variables, images))

    v_sh = jax.device_put(variables, replicated(mesh))
    x_sh = jax.device_put(images, spatial_sharding(mesh))
    out = jax.device_get(fwd(v_sh, x_sh))

    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=1e-4, atol=1e-4)
