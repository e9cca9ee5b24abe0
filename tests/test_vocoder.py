"""CVSD vocoder: 1 bit/sample binary stream, encoder/decoder recursion
mirror, reconstruction SNR scaling with oversampling ratio, syllabic step
adaptation, chunking invariance via carried scan state."""

import jax.numpy as jnp
import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.blocks.vocoder import (_init, cvsd_decode_scan,
                                          cvsd_encode_scan)

FS = 8000.0


def _speech(band_hz, n=64000, seed=0):
    from scipy import signal as sig
    rng = np.random.default_rng(seed)
    b, a = sig.butter(4, band_hz / (FS / 2))
    x = sig.lfilter(b, a, rng.standard_normal(n))
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def _roundtrip(speech, block_len=8000):
    g = gr.Graph()
    s = g.add(VectorSource(speech))
    enc = g.emplace("CvsdEncoder")
    dec = g.emplace("CvsdDecoder")
    v = g.add(VectorSink())
    vb = g.add(VectorSink())
    g.connect_chain(s, enc, dec, v)
    g.connect(enc, vb)
    gr.Scheduler(g, block_len=block_len, sample_rate=FS).run_and_wait()
    return np.asarray(v.data()), np.asarray(vb.data())


def _snr(ref, out, skip=2000):
    e = ref[skip:] - out[skip:len(ref)]
    return 10 * np.log10(np.mean(ref[skip:] ** 2) / np.mean(e ** 2))


class TestCvsd:
    def test_bits_binary_and_snr(self):
        speech = _speech(300.0)
        out, bits = _roundtrip(speech)
        assert set(np.unique(bits)) <= {0.0, 1.0}
        assert _snr(speech, out) > 10.0

    def test_snr_scales_with_oversampling(self):
        # delta modulation trades bandwidth for SNR: more oversampling
        # (narrower content at the same bit rate) must reconstruct better
        wide, _ = _roundtrip(_speech(800.0))
        narrow, _ = _roundtrip(_speech(300.0))
        assert _snr(_speech(300.0), narrow) > _snr(_speech(800.0), wide) + 3

    def test_decoder_mirrors_encoder_estimate(self):
        # identical recursions: decoding the encoder's bits reproduces the
        # encoder's internal estimate track exactly
        class S(dict):
            def get(self, k):
                return self[k]
        st = S(min_step=0.01, max_step=0.1, step_decay=0.98,
               accum_decay=0.97, runlength=3)
        kw = dict(min_step=0.01, max_step=0.1, step_decay=0.98,
                  accum_decay=0.97, runlength=3)
        x = jnp.asarray(_speech(300.0, n=4000))
        bits, enc_state = cvsd_encode_scan(x, _init(st), **kw)
        audio, dec_state = cvsd_decode_scan(bits, _init(st), **kw)
        np.testing.assert_allclose(np.asarray(enc_state[0]),
                                   np.asarray(audio)[-1], atol=1e-6)

    def test_chunking_invariance(self):
        speech = _speech(300.0, n=24000)
        a, _ = _roundtrip(speech, block_len=8000)
        b, _ = _roundtrip(speech, block_len=1000)
        np.testing.assert_array_equal(a, b)

    def test_step_adapts_on_slope(self):
        # a step input forces a run of equal bits → the syllabic step grows
        # and the estimate converges much faster than min_step alone allows
        x = np.concatenate([np.zeros(100), 0.8 * np.ones(400)]) \
            .astype(np.float32)
        out, bits = _roundtrip(x, block_len=500)
        # within 60 samples the estimate must cover ≥ 0.6 of the step —
        # impossible at min_step (0.01 × 60 = 0.6 only with max growth)
        assert out[160] > 0.5
        assert np.all(bits[100:110] == 1.0)   # slope-overload run
