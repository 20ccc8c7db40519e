"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-native stand-in for the
reference's local Distributed.jl worker tests,
/root/reference/test/inversion_test.jl:13-18) with float64 enabled so
gradient-parity tolerances match the Julia reference's Float64 gates
(/root/reference/test/runtests.jl:116-235).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# jax may already be imported (and pinned to another platform) by a
# site-customization hook; override both the env var and the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
