"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import (acquisition, audio, basic, channelizer, digital,  # noqa: F401
               dsp_extras, electrical, equalizer, fec, fileio, filter, fourier, http,
               math,
               misc, monitor, network, python_block, rtl2832, sdr, testing,
               timing, usb, util_blocks)
from ..core import datasink as _datasink  # noqa: F401  (registers DataSink)
