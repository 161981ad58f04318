import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver separately dry-runs multi-chip compiles).
# Hard override: the driver environment pins JAX_PLATFORMS=axon (the real
# TPU via a tunnel, with remote compilation); tests must stay local.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the 'axon'/'tpu' PJRT plugins
# (tunneled real TPU). jax initializes every registered platform on first
# backend use even when JAX_PLATFORMS=cpu, and a wedged tunnel then blocks
# the whole test run - so drop the remote factories before first use.
import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

jax.config.update("jax_platforms", "cpu")
for _plat in ("axon", "tpu"):
    xla_bridge._backend_factories.pop(_plat, None)

import compose_tpu  # noqa: E402,F401  - enables x64 before any jax use
