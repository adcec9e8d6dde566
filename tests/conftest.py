"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip sharding correctness is device-count-, not hardware-, dependent
(SURVEY.md §4), so shard_map tests run on a virtual CPU mesh.  The axon TPU
plugin force-registers itself via sitecustomize; jax.config wins over it.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

