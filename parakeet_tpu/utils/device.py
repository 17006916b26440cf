"""Device selection for CLIs (reference: parakeet/training/cli.py:17
exposes --device on every entry point)."""
from __future__ import annotations

__all__ = ["set_device", "add_device_arg"]


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
