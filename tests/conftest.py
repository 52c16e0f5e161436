"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh per the project testing strategy (SURVEY.md §4).
"""

import os
import sys

# The test suite runs on a virtual 8-device CPU mesh; only bench.py targets
# the real chip. NOTE: this environment's sitecustomize registers a TPU PJRT
# plugin at interpreter start and pins jax_platforms, so the JAX_PLATFORMS
# env var alone is IGNORED — jax.config.update after import is what works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hotproofs_tpu.utils.config import setup_jax  # noqa: E402

setup_jax(platform="cpu")  # also enables the persistent XLA compile cache
