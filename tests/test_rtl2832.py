"""RTL2832U + R820T user-space driver over the USB abstraction (≈ reference
RTL2832Device.hpp + USBDevice.hpp), exercised hardware-free through the
behavioral FakeRtlUsb — which decodes the driver's actual register writes and
inverts the PLL/resampler math, so the tests close the loop:
requested frequency → registers → reconstructed frequency → received tone."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.rtl2832 import (DEMOD_CTL, IF_FREQ, R820T_CHIP_ID,
                                          FakeRtlUsb, Rtl2832Device)
from gnuradio4_tpu.blocks.usb import FakeUsbDevice, enumerate_usb_devices


class TestUsbAbstraction:
    def test_enumeration_runs(self):
        # returns [] on machines without sysfs USB; must never raise
        devs = enumerate_usb_devices()
        assert isinstance(devs, list)

    def test_fake_logs_transfers(self):
        f = FakeUsbDevice()
        f.open()
        f.control_out(0x40, 0, 0x2000, 0x0110, b"\x09")
        assert f.control_log[-1] == ("out", 0, 0x2000, 0x0110, b"\x09")
        assert f.control_in(0xC0, 0, 1, 2, 4) == b"\x00" * 4


class TestRtl2832Driver:
    def _open(self, **kw):
        fake = FakeRtlUsb(**kw)
        drv = Rtl2832Device(usb=fake)
        drv.open()
        return drv, fake

    def test_power_on_sequence(self):
        drv, fake = self._open()
        # demod power-on: PLL+ADC enable, reset released (datasheet 0xE8)
        assert fake.regs[(0x0200, DEMOD_CTL)] == 0xE8
        # EPA max packet 512, FIFO flushed
        assert fake.regs[(0x0100, 0x2158)] == 0x0002
        # tuner shadow registers initialized (0x05..0x1F written)
        assert set(range(0x05, 0x20)) <= set(fake.tuner)

    def test_tuner_detection_and_rejection(self):
        drv, fake = self._open()
        assert fake._ctrl_in(0x34, 0x0600, 1)[0] == R820T_CHIP_ID

        class NoTuner(FakeRtlUsb):
            def _ctrl_in(self, value, index, length):
                if index == 0x0600 and value == 0x34:
                    return b"\xff" * length
                return super()._ctrl_in(value, index, length)

        with pytest.raises(gr.GrError, match="tuner"):
            Rtl2832Device(usb=NoTuner()).open()

    def test_sample_rate_register_roundtrip(self):
        drv, fake = self._open()
        actual = drv.set_sample_rate(2.048e6)
        # the fake reconstructs the rate from the programmed ratio registers
        assert fake.sample_rate == pytest.approx(actual, rel=1e-9)
        assert actual == pytest.approx(2.048e6, rel=1e-4)
        with pytest.raises(gr.GrError):
            drv.set_sample_rate(10e6)

    def test_pll_frequency_roundtrip(self):
        """Requested center frequency → divider/sigma-delta registers →
        reconstructed frequency: within the 16-bit SDM quantization."""
        drv, fake = self._open()
        for freq in (100e6, 433.92e6, 868e6, 1.09e9, 24.1e6):
            actual = drv.set_center_frequency(freq)
            # quantization: 2·xtal/65536/div — sub-kHz everywhere
            assert abs(actual - freq) < 2e3, freq
            assert fake.center_frequency == pytest.approx(actual, abs=1.0)

    def test_gain_steps_and_agc(self):
        drv, fake = self._open()
        got = drv.set_tuner_gain(28.5)
        assert got == pytest.approx(28.0, abs=1.0)
        assert (fake.tuner[0x05] & 0x0F) == 8   # LNA index for ~28 dB
        drv.set_agc_mode(True)
        assert fake.demod[(0, 0x19)] == 0x25

    def test_eeprom_parse(self):
        drv, fake = self._open()
        info = drv.eeprom_info()
        assert info["vid"] == 0x0BDA and info["pid"] == 0x2838

    def test_stream_tone_at_expected_offset(self):
        """Full chain: tune to 100 MHz, a fake station at 100.05 MHz appears
        at +50 kHz baseband after u8 IQ conversion."""
        drv, fake = self._open(rf_tones=[100.05e6], tone_amps=[0.9])
        fs = drv.set_sample_rate(1.024e6)
        drv.set_center_frequency(100e6)
        x = drv.read_samples(65536)
        assert x.dtype == np.complex64 and x.shape == (65536,)
        spec = np.abs(np.fft.fft(x))
        peak_bin = int(np.argmax(spec))
        freq = np.fft.fftfreq(len(x), 1 / fs)[peak_bin]
        expected = 100.05e6 - drv.center_frequency
        assert abs(freq - expected) < 2 * fs / len(x), (freq, expected)


class TestRtlSdrSourceBlock:
    def test_graph_receives_station(self):
        """SdrSource(driver='rtlsdr') with an injected fake backend streams a
        tone through a real scheduler run."""
        from gnuradio4_tpu.blocks.rtl2832 import _make_rtlsdr_device
        fake = FakeRtlUsb(rf_tones=[100.1e6], tone_amps=[0.8])
        dev = _make_rtlsdr_device()(usb=fake)
        g = gr.Graph()
        src = g.emplace("SdrSource", driver="rtlsdr", sample_rate=1.024e6,
                        center_frequency=100e6, gain=20.0)
        src._dev = dev
        head = g.emplace("HeadBlock", n_samples=1 << 16)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, head, snk)
        gr.Scheduler(g, block_len=1 << 14, sample_rate=1.024e6,
                     pipeline_depth=1).run_and_wait()
        x = snk.data()
        assert x.shape == (1 << 16,)
        spec = np.abs(np.fft.fft(x))
        fs = dev.sample_rate
        freq = np.fft.fftfreq(len(x), 1 / fs)[int(np.argmax(spec))]
        expected = 100.1e6 - dev.center_frequency
        assert abs(freq - expected) < 2 * fs / len(x)


class TestRtlFmAcceptance:
    def test_fm_station_through_protocol_driver(self):
        """Full acceptance through the REAL protocol driver path: an FM
        station modulated onto the fake dongle's 8-bit IQ stream → rtlsdr
        driver → WBFM receiver → recovered audio tone (quantization included)."""
        from gnuradio4_tpu.blocks.rtl2832 import _make_rtlsdr_device
        from gnuradio4_tpu.blocks.sdr import make_wbfm_receiver

        fs = 1.024e6
        fc = 100.0e6
        station = 100.1e6
        f_tone = 2000.0
        max_dev = 75e3
        n = 1 << 18
        t = np.arange(n) / fs
        message = np.sin(2 * np.pi * f_tone * t)
        phase = 2 * np.pi * np.cumsum(max_dev * message) / fs
        tx = 0.8 * np.exp(1j * phase)

        fake = FakeRtlUsb(waveform=tx, waveform_freq=station)
        dev = _make_rtlsdr_device()(usb=fake)
        g = gr.Graph()
        src = g.emplace("SdrSource", driver="rtlsdr", sample_rate=fs,
                        center_frequency=fc)
        src._dev = dev
        head = g.emplace("HeadBlock", n_samples=n)
        rx = make_wbfm_receiver(quad_rate=fs, audio_decim=16,
                                center_freq=station - fc, max_dev=max_dev)
        snk = gr.global_registry.create("VectorSink")
        g.add(rx)
        g.connect(src, head)
        g.connect(head, rx["in"])
        g.connect(rx["out"], snk)
        gr.Scheduler(g, block_len=1 << 16, sample_rate=fs,
                     pipeline_depth=1).run_and_wait()
        audio = snk.data()
        assert audio.shape[0] >= n // 16 - 64
        settled = audio[len(audio) // 4:]
        fs_a = fs / 16
        spec = np.abs(np.fft.rfft(settled * np.hanning(len(settled))))
        freq = np.argmax(spec[1:]) + 1
        freq_hz = freq * fs_a / len(settled)
        assert abs(freq_hz - f_tone) < 60.0, freq_hz
        # tone dominates despite 8-bit IQ quantization
        tone_power = spec[freq - 2: freq + 3].sum()
        assert tone_power > 0.25 * spec[1:].sum(), "audio tone not dominant"
