"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior is tested without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md SS4 lesson: the
reference could only test multi-node *on* the cluster; we fix that).

This environment preloads jax at interpreter startup (TPU tunnel), so env
vars set here are too late for `JAX_PLATFORMS`; `jax.config.update` before
the first backend use is the reliable switch.  Set GEOSONGPU_TEST_TPU=1 to
run the suite on the real chip instead.
"""
import os

import jax

if not os.environ.get("GEOSONGPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
