"""NOAA APT imagery decoder (blocks/apt.py — beyond-reference model family)."""

import numpy as np

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks import apt


def _test_image(rows, rng=None):
    """Structured test image: gradient + bars + a bit of texture."""
    rng = rng or np.random.default_rng(0)
    x = np.linspace(0.0, 1.0, 909, dtype=np.float32)
    img = np.empty((rows, 909), np.float32)
    for r in range(rows):
        img[r] = 0.5 * x + 0.3 * ((x * (4 + r % 3)) % 1.0 > 0.5)
    img += rng.uniform(0.0, 0.2, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def _row_corr(dec, ref):
    assert dec.shape[0] >= ref.shape[0] - 1  # sync search may drop a tail row
    return min(np.corrcoef(dec[r], ref[r])[0, 1] for r in range(dec.shape[0]))


class TestAptCoding:
    def test_line_layout(self):
        row = np.linspace(0.0, 1.0, 909, dtype=np.float32)
        line = apt._line_template(row)
        assert line.shape == (apt.LINE_WORDS,)
        np.testing.assert_array_equal(line[:39], apt.SYNC_A)
        np.testing.assert_array_equal(line[apt.IMAGE_A], row)
        # channel B mirrors the row at half brightness (IR stand-in)
        np.testing.assert_allclose(line[1040 + 86:1040 + 86 + 909], 0.5 * row)

    def test_modulate_envelope_roundtrip(self):
        img = _test_image(10)
        words = apt.apt_envelope(apt.apt_modulate(img))
        dec = apt.decode_image(words)
        assert dec.shape == (10, 909)
        assert _row_corr(dec, img) > 0.97

    def test_decode_under_noise(self):
        rng = np.random.default_rng(1)
        img = _test_image(8, rng)
        audio = apt.apt_modulate(img)
        audio = audio + 0.05 * rng.standard_normal(len(audio)).astype(np.float32)
        dec = apt.decode_image(apt.apt_envelope(audio))
        assert dec.shape[0] == 8
        assert _row_corr(dec, img) > 0.95

    def test_sync_locks_despite_leading_junk(self):
        """Stream starting mid-pass (partial line + noise prefix) still locks."""
        rng = np.random.default_rng(2)
        img = _test_image(6, rng)
        audio = apt.apt_modulate(img)
        junk = (0.1 * rng.standard_normal(3333)).astype(np.float32)
        dec = apt.decode_image(apt.apt_envelope(np.concatenate([junk, audio])))
        assert dec.shape[0] >= 5
        # first locked row aligns with some row of the image
        corr = max(np.corrcoef(dec[0], img[r])[0, 1] for r in range(3))
        assert corr > 0.95

    def test_empty_and_short_streams(self):
        assert apt.decode_image(np.zeros(0, np.float32)).shape == (0, 909)
        assert apt.decode_image(np.zeros(100, np.float32)).shape == (0, 909)
        assert apt.find_sync_offsets(np.zeros(50, np.float32)) == []


class TestAptGraphChain:
    def test_decoder_sink_matches_oneshot(self):
        """VectorSource → AptDecoder under scheduler chunking equals the
        one-shot host decode (wholesale-view semantics)."""
        img = _test_image(6)
        audio = apt.apt_modulate(img)

        g = gr.Graph()
        src = g.emplace("VectorSource", data=audio)
        dec = g.emplace("AptDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=7001, sample_rate=20800.0).run_and_wait()

        ref = apt.decode_image(apt.apt_envelope(audio.astype(np.float64)))
        assert dec.image.shape == ref.shape
        np.testing.assert_allclose(dec.image, ref, atol=1e-4)
        assert _row_corr(dec.image, img) > 0.97

    def test_fm_downlink_chain(self):
        """Full satellite chain: APT audio FM-modulated onto the downlink,
        recovered by QuadratureDemod → AptDecoder in one flowgraph."""
        rng = np.random.default_rng(3)
        img = _test_image(5, rng)
        audio = apt.apt_modulate(img)
        fs, f_dev = 20800.0, 4000.0
        phase = 2 * np.pi * f_dev / fs * np.cumsum(audio.astype(np.float64))
        iq = np.exp(1j * (phase + 0.7)).astype(np.complex64)
        iq += (0.01 * (rng.standard_normal(len(iq))
                       + 1j * rng.standard_normal(len(iq)))).astype(np.complex64)

        g = gr.Graph()
        src = g.emplace("VectorSource", data=iq)
        dem = g.emplace("QuadratureDemod", gain=fs / (2 * np.pi * f_dev))
        dec = g.emplace("AptDecoder")
        g.connect_chain(src, dem, dec)
        gr.Scheduler(g, block_len=9973, sample_rate=fs).run_and_wait()

        assert dec.image.shape[0] >= 4
        assert _row_corr(dec.image, img) > 0.93

    def test_history_bound(self):
        """max_lines caps the buffered audio; the decode still locks on the
        retained tail."""
        img = _test_image(8)
        audio = apt.apt_modulate(img)
        g = gr.Graph()
        src = g.emplace("VectorSource", data=audio)
        dec = g.emplace("AptDecoder", max_lines=4)
        g.connect(src, dec)
        gr.Scheduler(g, block_len=8192, sample_rate=20800.0).run_and_wait()
        assert len(dec._audio) <= 4 * 0.5 * 20800
        assert 3 <= dec.image.shape[0] <= 4
