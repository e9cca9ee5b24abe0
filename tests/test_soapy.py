"""SoapySDR C-ABI binding (≈ reference SoapyRaiiWrapper.hpp + qa_SoapyLoopback):
exercised against a compiled fake libSoapySDR implementing the same symbols —
enumerate/make/configure/stream end-to-end without radios."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.soapy import SoapyBinding, SoapyDevice

HERE = Path(__file__).parent


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = tmp_path_factory.mktemp("soapy") / "libFakeSoapySDR.so"
    r = subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++20",
         str(HERE / "fake_soapy.cpp"), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    return str(out)


class TestSoapyBinding:
    def test_enumerate_and_configure(self, fake_lib):
        b = SoapyBinding(fake_lib)
        assert b.enumerate() == 1
        dev = SoapyDevice(lib_path=fake_lib)
        dev.configure(sample_rate=1.024e6, center_frequency=100e6, gain=6.0)
        assert dev.sample_rate == pytest.approx(1.024e6)
        dev.activate()
        x, info = dev.read_stream(4096)
        dev.deactivate()
        assert info == {} and x.shape == (4096,) and x.dtype == np.complex64

    def test_stream_tone_at_offset(self, fake_lib):
        """The fake station at 100.05 MHz appears at +50 kHz baseband."""
        dev = SoapyDevice(lib_path=fake_lib)
        dev.configure(sample_rate=1.024e6, center_frequency=100e6)
        dev.activate()
        x, _ = dev.read_stream(65536)
        dev.deactivate()
        spec = np.abs(np.fft.fft(x))
        freq = np.fft.fftfreq(len(x), 1 / dev.sample_rate)[int(np.argmax(spec))]
        assert abs(freq - 50e3) < 2 * dev.sample_rate / len(x)

    def test_sdr_source_graph(self, fake_lib):
        """SdrSource(driver='soapy') through a real scheduler run."""
        from gnuradio4_tpu.blocks import soapy
        soapy.register(lib_path=fake_lib)
        g = gr.Graph()
        src = g.emplace("SdrSource", driver="soapy", sample_rate=1.024e6,
                        center_frequency=100e6)
        head = g.emplace("HeadBlock", n_samples=1 << 15)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, head, snk)
        gr.Scheduler(g, block_len=1 << 13, sample_rate=1.024e6,
                     pipeline_depth=1).run_and_wait()
        x = snk.data()
        assert x.shape == (1 << 15,)
        spec = np.abs(np.fft.fft(x))
        freq = np.fft.fftfreq(len(x), 1 / 1.024e6)[int(np.argmax(spec))]
        assert abs(freq - 50e3) < 2 * 1.024e6 / len(x)

    def test_missing_library_clear_error(self):
        with pytest.raises(gr.GrError, match="libSoapySDR"):
            SoapyBinding("/nonexistent/libSoapySDR.so")
