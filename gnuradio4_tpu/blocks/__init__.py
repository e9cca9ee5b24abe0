"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import basic, filter, fourier, math, testing  # noqa: F401
