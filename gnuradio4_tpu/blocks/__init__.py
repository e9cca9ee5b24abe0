"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import (acquisition, basic, channelizer, filter, fourier, math, sdr,  # noqa: F401
               testing)
from ..core import datasink as _datasink  # noqa: F401  (registers DataSink)
