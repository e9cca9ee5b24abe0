"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import basic, channelizer, filter, fourier, math, sdr, testing  # noqa: F401
