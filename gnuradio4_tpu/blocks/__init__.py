"""Block library (≈ reference blocks/): importing this package registers all built-in
blocks with the global registry."""

from . import (acquisition, adsb, ais, alsa, apt, audio, ax25, basic,  # noqa: F401
               ble, ccsds, channelizer, channels,
               cw, dcf77, digital, dsp_extras, electrical, equalizer, fec, fileio,
               filter, fourier, gnss, http, ieee802154, ldpc, lora, math,
               misc, monitor, network, pocsag, polar, reed_solomon, python_block, rds, rtl2832, rtty, same, sdr, sigmf, squelch, sstv,
               uncertain, vocoder, wifi,
               soapy,
               testing, timing, usb, util_blocks, wefax, zeromq)
from . import ref_aliases  # noqa: F401  (after all targets are registered)
from ..core import datasink as _datasink  # noqa: F401  (registers DataSink)
