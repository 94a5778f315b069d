"""Test configuration: CPU backend with 8 virtual devices + float64.

Parity tests against the reference run in float64 on CPU (the reference is
double-heavy); mesh/sharding tests use the 8 virtual CPU devices
(SURVEY.md §4: JAX CPU multi-device simulation, since the reference offers
no multi-device pattern to mirror).

Note: the env var JAX_PLATFORMS is NOT sufficient here — the axon TPU
plugin takes precedence over it — so we force the platform through
jax.config, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
