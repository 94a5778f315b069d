"""Test configuration: CPU backend with 8 virtual devices + float64.

Parity tests against the reference run in float64 on CPU (the reference is
double-heavy); mesh/sharding tests use the 8 virtual CPU devices
(SURVEY.md §4: JAX CPU multi-device simulation, since the reference offers
no multi-device pattern to mirror).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
