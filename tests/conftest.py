"""Test config: run JAX on a virtual 8-device CPU mesh.

The standard fake-backend trick for testing pmap/pjit/shard_map sharding
without real multi-chip hardware (SURVEY.md §4). Must be set before jax
is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the image's sitecustomize registers the axon TPU backend regardless of the
# env var; force the virtual 8-device CPU mesh explicitly.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from game_engine_tpu.gamespec.parser import load_builtin  # noqa: E402


@pytest.fixture(scope="session")
def werewolf_spec():
    return load_builtin("werewolf")


@pytest.fixture(scope="session")
def twotruths_spec():
    return load_builtin("two-truths-and-a-lie")
