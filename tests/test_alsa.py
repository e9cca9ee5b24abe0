"""ALSA backend over the libasound C ABI, exercised against a compiled fake
libasound (≈ the reference exercising its audio backends headless,
qa_Audio.cpp strategy)."""

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.alsa import AlsaBackend

HERE = Path(__file__).parent


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = tmp_path_factory.mktemp("alsa") / "libFakeAsound.so"
    r = subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++20",
         str(HERE / "fake_alsa.cpp"), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    return str(out)


class TestAlsaBackend:
    def test_capture_tone(self, fake_lib):
        b = AlsaBackend(lib_path=fake_lib)
        b.open_capture(48000.0, 1)
        x = b.read(48000)
        b.close()
        assert x.shape == (48000,)
        spec = np.abs(np.fft.rfft(x))
        freq = np.argmax(spec) * 48000.0 / len(x)
        assert abs(freq - 440.0) < 2.0

    def test_playback_roundtrip(self, fake_lib):
        b = AlsaBackend(lib_path=fake_lib)
        b.open_playback(48000.0, 1)
        sig = np.sin(2 * np.pi * 1000 / 48000 * np.arange(4096)
                     ).astype(np.float32)
        b.write(sig)
        played = np.empty(4096, np.float32)
        n = b.lib.fake_alsa_played(
            played.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 4096)
        b.close()
        np.testing.assert_array_equal(played[:n], sig[:n])
        assert n == 4096

    def test_audio_source_block_graph(self, fake_lib):
        """AudioSource(backend='alsa') streams the fake mic through a graph."""
        from gnuradio4_tpu.blocks import alsa
        alsa.register(lib_path=fake_lib)
        g = gr.Graph()
        src = g.emplace("AudioSource", backend="alsa", sample_rate=48000.0)
        head = g.emplace("HeadBlock", n_samples=16384)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, head, snk)
        gr.Scheduler(g, block_len=4096, sample_rate=48000.0,
                     pipeline_depth=1).run_and_wait()
        x = snk.data()
        assert x.shape == (16384,)
        spec = np.abs(np.fft.rfft(x))
        freq = np.argmax(spec) * 48000.0 / len(x)
        assert abs(freq - 440.0) < 4.0

    def test_missing_library_clear_error(self):
        with pytest.raises(gr.GrError, match="libasound|asound"):
            AlsaBackend(lib_path="/nonexistent/libasound.so")
