"""Test configuration: force an 8-device virtual CPU mesh before jax loads."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough: the ambient axon sitecustomize registers
# the TPU plugin at interpreter start, so the platform must also be forced
# through the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
