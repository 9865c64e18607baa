"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native analog of a fake backend (SURVEY.md §4): multi-device
sharding tests run without TPU hardware via
--xla_force_host_platform_device_count.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env may preset a TPU platform; force CPU
# FORCE 8 virtual devices, overriding any pre-existing count (a dev shell
# with =1 would otherwise fail every mesh test with a confusing message)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
