"""Full-system acceptance test (≈ reference qa_SoapyLoopback: complete RF chain
over a fake radio): an FM station 'on the air' via LoopbackDevice → SdrSource →
WbfmReceiver → WAV file + DataSink poller, tags flowing end-to-end."""

import wave

import numpy as np

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.fileio import WavSink
from gnuradio4_tpu.blocks.sdr import LoopbackDevice, SdrSource, make_wbfm_receiver
from gnuradio4_tpu.core.datasink import DataSink, global_data_sink_registry
from gnuradio4_tpu.core.tags import Keys


def test_fm_station_to_audio_file(tmp_path):
    fs = 250e3
    fc = 100.0e6           # tuner frequency
    station = 100.02e6     # station 20 kHz above → freq-xlating picks it
    f_tone = 2000.0
    max_dev = 75e3
    n = 250000             # 1 second on air

    # build the station's baseband FM waveform
    t = np.arange(n) / fs
    message = np.sin(2 * np.pi * f_tone * t)
    phase = 2 * np.pi * np.cumsum(max_dev * message) / fs
    tx = np.exp(1j * phase)

    dev = LoopbackDevice(waveform=tx, waveform_freq=station,
                         noise_std=0.001, total_samples=n)

    g = gr.Graph()
    src = SdrSource(device=dev, sample_rate=fs, center_frequency=fc)
    rx = make_wbfm_receiver(quad_rate=fs, audio_decim=5,
                            center_freq=station - fc, max_dev=max_dev)
    wav_path = tmp_path / "air.wav"
    wav = WavSink(path=str(wav_path), sample_rate=fs / 5)
    ds = DataSink(name="acceptance_audio")
    g.add(rx)
    g.connect(src, rx["in"])
    g.connect(rx["out"], wav)
    g.connect(rx["out"], ds)
    poller = global_data_sink_registry.get_streaming_poller("acceptance_audio")

    gr.Scheduler(g, block_len=25000, sample_rate=fs).run_and_wait()
    wav.stop()

    # 1. WAV exists with the right length/rate and carries the message tone
    with wave.open(str(wav_path), "rb") as w:
        assert w.getframerate() == int(fs / 5)
        frames = w.getnframes()
        assert frames == n // 5
        pcm = np.frombuffer(w.readframes(frames), "<i2").astype(np.float32)
    audio = pcm / 32768.0
    seg = audio[5000:45000]
    spec = np.abs(np.fft.rfft((seg - seg.mean()) * np.hanning(len(seg))))
    f_peak = np.argmax(spec) * (fs / 5) / len(seg)
    assert abs(f_peak - f_tone) < 5.0

    # 2. poller saw the same stream
    chunks = poller.read_all()
    streamed = np.concatenate([c.data for c in chunks], axis=-1)
    assert streamed.shape == (n // 5,)
    np.testing.assert_allclose(streamed, audio, atol=2.0 / 32768)

    # 3. radio metadata tags reached the sinks — the sample_rate value was
    # rescaled through the decimating chain to the audio rate
    all_tags = [t for c in chunks for t in c.tags]
    assert any(t.map.get(Keys.SAMPLE_RATE) == fs / 5 for t in all_tags)
    assert any(t.map.get(Keys.FREQUENCY) == fc for t in all_tags)
