"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are tested against a fake 8-device CPU mesh
(the standard way to test pjit/shard_map without real TPUs).  The
ambient environment may pin jax to a real accelerator via a
sitecustomize hook that imports jax before pytest starts, so the env
var alone is not enough — we also override via jax.config, which takes
effect because backends initialise lazily.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
