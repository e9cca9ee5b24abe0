"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import (acquisition, basic, channelizer, electrical, fileio, filter,  # noqa: F401
               fourier, math, misc, sdr, testing)
from ..core import datasink as _datasink  # noqa: F401  (registers DataSink)
