"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's chain-test strategy of exercising "distributed"
paths on a single host (reference: tests/chain/*.sh use --nprocs on one
machine); here we use XLA's host-platform device partitioning instead of
process spawning.

Note: this machine's axon TPU plugin (sitecustomize.py) programmatically
forces jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var — so
we must also override via jax.config *before* any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
