"""SSTV (Martin M1) family: waveform synthesis timing, VIS header
encode/decode, image loopback fidelity, Scheduler graph chain at several
block lengths, channel-noise tolerance, and headerless streams."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.sstv import (
    F_BLACK, F_SYNC, F_WHITE, PORCH_S, SCAN_S, SYNC_S, VIS_MARTIN_M1, WIDTH,
    SstvDecoder, decode_vis, instantaneous_frequency, line_freqs,
    sstv_modulate, vis_header_freqs,
)

FS = 48000.0


def _test_image(n_lines=4, seed=0):
    img = np.zeros((n_lines, WIDTH, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, WIDTH)[None, :]
    img[..., 1] = np.linspace(255, 0, n_lines)[:, None]
    img[..., 2] = 128
    return img


def _mean_err(out, img):
    assert out.shape == img.shape, (out.shape, img.shape)
    return float(np.abs(out.astype(float) - img.astype(float)).mean())


class TestWaveform:
    def test_line_timing(self):
        line = line_freqs(np.full((WIDTH, 3), 128, np.uint8), FS)
        expect = (int(round(SYNC_S * FS)) + int(round(PORCH_S * FS))
                  + 3 * (int(round(SCAN_S * FS)) + int(round(PORCH_S * FS))))
        assert len(line) == expect
        sync_n = int(round(SYNC_S * FS))
        assert np.all(line[:sync_n] == F_SYNC)
        assert np.all(line[sync_n:sync_n + int(round(PORCH_S * FS))] == 1500.0)

    def test_pixel_frequency_endpoints(self):
        black = line_freqs(np.zeros((WIDTH, 3), np.uint8), FS)
        white = line_freqs(np.full((WIDTH, 3), 255, np.uint8), FS)
        base = int(round(SYNC_S * FS)) + int(round(PORCH_S * FS))
        assert black[base + 10] == F_BLACK
        assert white[base + 10] == F_WHITE

    def test_header_vis_bits(self):
        hdr = vis_header_freqs(FS, VIS_MARTIN_M1)
        # leader/break/leader prefix then start bit at 1200 Hz
        n_lead = int(round(0.300 * FS))
        n_break = int(round(0.010 * FS))
        assert np.all(hdr[:n_lead] == 1900.0)
        assert np.all(hdr[n_lead:n_lead + n_break] == F_SYNC)
        start = 2 * n_lead + n_break
        bit_n = int(round(0.030 * FS))
        assert np.all(hdr[start:start + bit_n] == F_SYNC)
        # VIS 44 = 0b0101100 LSB-first: 0,0,1,1,0,1,0 (1=1100, 0=1300)
        want = [1300.0, 1300.0, 1100.0, 1100.0, 1300.0, 1100.0, 1300.0]
        for k, f in enumerate(want):
            seg = hdr[start + (1 + k) * bit_n: start + (2 + k) * bit_n]
            assert np.all(seg == f), k

    def test_modulate_amplitude_and_continuity(self):
        audio = sstv_modulate(_test_image(2), fs=FS, amplitude=0.5)
        assert audio.dtype == np.float32
        assert np.abs(audio).max() <= 0.5 + 1e-6
        # phase-continuous FM: no step discontinuities
        assert np.abs(np.diff(audio.astype(np.float64))).max() < 0.16

    def test_grayscale_input(self):
        gray = np.linspace(0, 255, WIDTH).astype(np.uint8)
        img = np.tile(gray, (2, 1))
        audio = sstv_modulate(img, fs=FS)
        d = SstvDecoder()
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        out = d.image
        assert out.shape == (2, WIDTH, 3)
        # grayscale → all three channels carry the ramp
        assert _mean_err(out, np.repeat(img[..., None], 3, axis=-1)) < 2.0


class TestVis:
    def test_decode_vis_from_header(self):
        freq = np.concatenate([vis_header_freqs(FS),
                               np.full(2000, 1700.0)])
        vis, pos = decode_vis(freq, FS)
        assert vis == VIS_MARTIN_M1 == 44
        # pos is the first sample after the stop bit
        n_lead = int(round(0.300 * FS))
        n_break = int(round(0.010 * FS))
        bit_n = int(round(0.030 * FS))
        assert pos == 2 * n_lead + n_break + 10 * bit_n

    def test_parity_violation_rejected(self):
        hdr = vis_header_freqs(FS)
        bit_n = int(round(0.030 * FS))
        start = 2 * int(round(0.300 * FS)) + int(round(0.010 * FS))
        bad = hdr.copy()
        # flip bit 0 (1300 → 1100) without touching parity → odd ones
        lo = start + bit_n
        bad[lo:lo + bit_n] = 1100.0
        vis, _ = decode_vis(bad, FS)
        assert vis is None

    def test_no_header(self):
        vis, pos = decode_vis(np.full(48000, 1900.0), FS)
        assert vis is None and pos == 0


class TestLoopback:
    def test_clean_roundtrip(self):
        img = _test_image(4)
        d = SstvDecoder()
        audio = sstv_modulate(img, fs=FS)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.vis == 44
        assert _mean_err(d.image, img) < 1.5

    def test_headerless_roundtrip(self):
        img = _test_image(4)
        d = SstvDecoder()
        audio = sstv_modulate(img, fs=FS, vis=False)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.vis is None
        assert _mean_err(d.image, img) < 1.5

    @pytest.mark.parametrize("noise,tol", [(0.02, 5.0), (0.05, 10.0),
                                           (0.10, 20.0)])
    def test_noise_tolerance(self, noise, tol):
        rng = np.random.default_rng(7)
        img = _test_image(4)
        audio = sstv_modulate(img, fs=FS)
        noisy = (audio + noise * rng.standard_normal(len(audio))
                 ).astype(np.float32)
        d = SstvDecoder()
        d.consume({"in": noisy}, {}, len(noisy), 0)
        d.stop()
        assert d.vis == 44
        assert _mean_err(d.image, img) < tol

    def test_flat_colour_exact(self):
        img = np.zeros((2, WIDTH, 3), np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = 200, 60, 128
        d = SstvDecoder()
        audio = sstv_modulate(img, fs=FS)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert _mean_err(d.image, img) < 1.0


class TestGraph:
    @pytest.mark.parametrize("block_len", [2048, 4096, 16384])
    def test_source_to_decoder_chain(self, block_len):
        img = _test_image(3)
        g = gr.Graph()
        src = g.emplace("SstvSource", image=img)
        dec = g.emplace("SstvDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=block_len,
                     sample_rate=FS).run_and_wait()
        assert dec.vis == 44
        assert _mean_err(dec.image, img) < 1.5

    def test_fm_chain_through_quadrature_demod(self):
        # RF-style path: FM-modulate the audio onto IQ, demodulate in-graph
        # with QuadratureDemod, decode the recovered audio
        img = _test_image(2)
        audio = sstv_modulate(img, fs=FS).astype(np.float64)
        dev = 5000.0
        phase = 2 * np.pi * dev / FS * np.cumsum(audio)
        iq = np.exp(1j * phase).astype(np.complex64)
        g = gr.Graph()
        src = g.emplace("VectorSource", data=iq)
        dem = g.emplace("QuadratureDemod", gain=FS / (2 * np.pi * dev))
        dec = g.emplace("SstvDecoder")
        g.connect_chain(src, dem, dec)
        gr.Scheduler(g, block_len=8192, sample_rate=FS).run_and_wait()
        assert dec.vis == 44
        assert _mean_err(dec.image, img) < 3.0

    def test_incremental_live_image(self):
        # image property fills in as lines arrive (re-decode every ~second)
        img = _test_image(6)
        audio = sstv_modulate(img, fs=FS)
        d = SstvDecoder()
        seen = []
        step = 48000
        for i in range(0, len(audio), step):
            d.consume({"in": audio[i:i + step]}, {},
                      len(audio[i:i + step]), i)
            seen.append(d.image.shape[0])
        d.stop()
        assert d.image.shape[0] == 6
        assert seen[0] < 6 and sorted(seen) == seen  # grows monotonically

    def test_max_lines_cap(self):
        img = _test_image(5)
        d = SstvDecoder(max_lines=3)
        audio = sstv_modulate(img, fs=FS)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.image.shape[0] == 3


class TestDiscriminator:
    def test_instantaneous_frequency_of_tone(self):
        t = np.arange(4800)
        x = np.sin(2 * np.pi * 1900.0 / FS * t)
        f = instantaneous_frequency(x, FS)
        np.testing.assert_allclose(f[100:-100], 1900.0, atol=1.0)
