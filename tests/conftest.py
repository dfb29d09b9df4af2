"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference app's only transferable test idea is the sokol dummy-backend
pattern (SURVEY.md §4) — run the full pipeline headlessly. Here that is native:
every stage is a pure array function, so we force the CPU backend with 8
virtual devices and test sharding/jit without TPU hardware.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

# The axon site package pins JAX_PLATFORMS=axon via the environment; the config
# update is the only override that sticks.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
