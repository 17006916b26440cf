"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's chain-test strategy of exercising "distributed"
paths on a single host (reference: tests/chain/*.sh use --nprocs on one
machine); here we use XLA's host-platform device partitioning instead of
process spawning.
"""
import os

# Must be set before jax is imported anywhere.  Force CPU even when the
# session has a TPU attached (JAX_PLATFORMS=axon): unit tests exercise
# logic + sharding on an 8-device virtual CPU mesh, not real hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
