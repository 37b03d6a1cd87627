"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices (for mesh/sharding
tests) and float64 enabled (for oracle-parity tests).  This must happen
before JAX initialises its backends.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
