"""Pallas TPU kernels for the hot quantized ops."""


class UnsupportedShape(Exception):
    """Raised by a Pallas kernel wrapper when the shapes/dtypes don't meet the
    kernel's tiling constraints; callers fall back to the XLA path."""
