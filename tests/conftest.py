"""
Test configuration: force an 8-device virtual CPU platform so mesh-parallel
code paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.
Must run before jax initializes its backends.
"""
import os

# Hard override: the ambient environment may preset JAX_PLATFORMS=axon (the
# tunneled TPU); tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin's sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var -- override it back
# before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
