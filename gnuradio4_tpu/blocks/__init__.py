"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import (acquisition, basic, channelizer, fileio, filter, fourier,  # noqa: F401
               math, sdr, testing)
from ..core import datasink as _datasink  # noqa: F401  (registers DataSink)
