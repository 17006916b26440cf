"""Device selection for CLIs (reference: parakeet/training/cli.py:17
exposes --device on every entry point)."""
from __future__ import annotations

import os

__all__ = ["set_device", "add_device_arg", "maybe_initialize_multihost"]


def maybe_initialize_multihost() -> bool:
    """Join a multihost (multi-slice / pod) JAX runtime when requested.

    The reference spawns one process per GPU (dist.spawn + NCCL,
    examples/fastspeech2/train.py:208); the TPU-native equivalent is one
    process per HOST with SPMD over the global mesh.  Opt in by setting
    PARAKEET_MULTIHOST=1 (TPU pods: autodetected coordinator) or by
    providing the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID triple.  Call before any JAX
    backend use; returns True if the distributed runtime was started.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (os.environ.get("PARAKEET_MULTIHOST") or addr):
        return False
    import jax
    kwargs = {}
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)
    return True


def set_device(device: str) -> None:
    """Select cpu|tpu before any JAX backend initializes.

    The env var JAX_PLATFORMS is not reliable here (TPU harness plugins
    may force a platform programmatically), so use jax.config directly.
    Must be called before the first jax array/device call.
    """
    if device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def add_device_arg(parser) -> None:
    parser.add_argument("--device", default="tpu", choices=("cpu", "tpu"),
                        help="compute device (default: tpu)")
