"""Pallas TPU kernels for the hot ops."""
from .pwg_stack import fused_residual_stack, fused_stack_supported

__all__ = ["fused_residual_stack", "fused_stack_supported"]
