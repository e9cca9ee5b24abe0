"""WEFAX / HF radiofax family (IOC 576, 120 lpm): waveform framing (start
tone, phasing pulses, stop tone), start-tone detection, image loopback
fidelity, Scheduler graph chain, noise tolerance, stop-tone truncation."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.sstv import instantaneous_frequency
from gnuradio4_tpu.blocks.wefax import (F_BLACK, F_WHITE, LPM,
                                        PHASE_PULSE_FRAC, START_TONE_HZ,
                                        WefaxDecoder, detect_start_tone,
                                        phasing_line_freqs, wefax_modulate)

FS = 11025.0


def _chart(n_lines=6, width=800):
    img = np.zeros((n_lines, width), np.uint8)
    img[:] = np.linspace(0, 255, width)[None, :]
    if n_lines > 2:
        img[2] = 30
    if n_lines > 4:
        img[4] = 220
    return img


class TestWaveform:
    def test_phasing_line_shape(self):
        line = phasing_line_freqs(FS)
        assert len(line) == int(round(60.0 / LPM * FS))
        pulse_n = int(round(PHASE_PULSE_FRAC * len(line)))
        assert np.all(line[:pulse_n] == F_BLACK)
        assert np.all(line[pulse_n:] == F_WHITE)

    def test_total_duration(self):
        audio = wefax_modulate(_chart(4), fs=FS, start_s=2.0,
                               n_phasing=10, stop_s=1.0)
        line_s = 60.0 / LPM
        expect = (2.0 + 10 * line_s + 4 * line_s + 1.0) * FS
        # each line rounds 5512.5 → 5512 samples at 11025 Hz
        assert abs(len(audio) - expect) < 1 + 14 * 0.5

    def test_rgb_input_converted_by_luma(self):
        rgb = np.repeat(_chart(2)[..., None], 3, axis=-1)
        a1 = wefax_modulate(rgb, fs=FS)
        a2 = wefax_modulate(_chart(2), fs=FS)
        np.testing.assert_allclose(a1, a2)

    def test_start_tone_detected(self):
        audio = wefax_modulate(_chart(2), fs=FS, start_s=2.0)
        f = instantaneous_frequency(audio, FS)
        pos = detect_start_tone(f, FS)
        assert pos is not None
        assert abs(pos - 2.0 * FS) < FS / START_TONE_HZ

    def test_no_start_tone_in_plain_audio(self):
        t = np.arange(int(3 * FS))
        tone = np.sin(2 * np.pi * 1900.0 / FS * t)
        assert detect_start_tone(
            instantaneous_frequency(tone, FS), FS) is None


class TestLoopback:
    def test_clean_roundtrip(self):
        img = _chart(6)
        d = WefaxDecoder()
        audio = wefax_modulate(img, fs=FS)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.started
        assert d.image.shape == img.shape
        assert np.abs(d.image.astype(float) - img.astype(float)).mean() < 0.5

    @pytest.mark.parametrize("noise,tol", [(0.05, 8.0), (0.10, 15.0)])
    def test_noise(self, noise, tol):
        rng = np.random.default_rng(2)
        img = _chart(6)
        audio = wefax_modulate(img, fs=FS)
        x = (audio + noise * rng.standard_normal(len(audio))
             ).astype(np.float32)
        d = WefaxDecoder()
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.image.shape == img.shape
        assert np.abs(d.image.astype(float) - img.astype(float)).mean() < tol

    def test_stop_tone_truncates_exactly(self):
        # without the stop-tone gate the 1 s stop tail would decode as two
        # bogus mid-grey lines
        img = _chart(5)
        d = WefaxDecoder()
        audio = wefax_modulate(img, fs=FS, stop_s=1.0)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.image.shape[0] == 5

    def test_custom_width(self):
        img = _chart(3, width=400)
        d = WefaxDecoder(width=400)
        audio = wefax_modulate(img, fs=FS)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.image.shape == (3, 400)
        assert np.abs(d.image.astype(float) - img.astype(float)).mean() < 0.5


class TestGraph:
    @pytest.mark.parametrize("block_len", [2048, 8192])
    def test_source_to_decoder_chain(self, block_len):
        img = _chart(4)
        g = gr.Graph()
        src = g.emplace("WefaxSource", image=img)
        dec = g.emplace("WefaxDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=block_len,
                     sample_rate=FS).run_and_wait()
        assert dec.image.shape == img.shape
        assert np.abs(dec.image.astype(float)
                      - img.astype(float)).mean() < 0.5

    def test_incremental_live_image(self):
        img = _chart(8)
        audio = wefax_modulate(img, fs=FS)
        d = WefaxDecoder()
        seen = []
        step = int(FS)
        for i in range(0, len(audio), step):
            chunk = audio[i:i + step]
            d.consume({"in": chunk}, {}, len(chunk), i)
            seen.append(d.image.shape[0])
        d.stop()
        assert d.image.shape[0] == 8
        assert sorted(seen) == seen and seen[0] < 8
