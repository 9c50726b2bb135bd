import os
import sys

# Hermetic tests: CPU backend with 8 virtual devices for sharding tests.
# NOTE: this image's sitecustomize preloads jax and pins JAX_PLATFORMS=axon
# (the real TPU tunnel), so plain env vars are not enough — override the
# live jax config.  XLA_FLAGS must be set before the CPU backend
# initializes (it is initialized lazily, so this is early enough).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
