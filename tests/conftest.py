"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh per the project testing strategy (SURVEY.md §4).
"""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU even when the
# environment preconfigures a TPU platform (e.g. JAX_PLATFORMS=axon): the
# test suite runs on a virtual 8-device CPU mesh; only bench.py targets the
# real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
