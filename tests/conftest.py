"""Test configuration: force an 8-virtual-device CPU platform before JAX init.

Multi-device sharding tests run on a virtual CPU mesh (the single real TPU
chip cannot exercise collectives); numeric tests are platform-agnostic.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; pin via jax.config as well,
# otherwise "CPU" tests silently run on the real chip with 20-40s compiles.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
