"""URI-based IO factory (≈ reference URI-addressed fileio)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.uri import sink_for_uri, source_for_uri
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


def test_file_uri_roundtrip(tmp_path):
    data = np.arange(4096, dtype=np.float32)
    p_in = tmp_path / "in.f32"
    p_in.write_bytes(data.tobytes())
    p_out = tmp_path / "out.f32"
    g = gr.Graph()
    src = source_for_uri(f"file://{p_in}?dtype=float32")
    snk = sink_for_uri(f"file://{p_out}")
    g.connect(src, snk)
    gr.Scheduler(g, block_len=1024).run_and_wait()
    np.testing.assert_array_equal(
        np.frombuffer(p_out.read_bytes(), np.float32), data)


def test_wire_format_uri(tmp_path):
    iq = np.arange(2000, dtype=np.int16)
    p = tmp_path / "cap.dat"
    p.write_bytes(iq.tobytes())
    src = source_for_uri(f"file://{p}?wire_format=i16iq")
    g = gr.Graph()
    snk = VectorSink()
    g.connect(src, snk)
    gr.Scheduler(g, block_len=250).run_and_wait()
    assert snk.data().dtype == np.complex64
    assert snk.data().shape == (1000,)


def test_wav_uri(tmp_path):
    p = tmp_path / "t.wav"
    tone = (0.25 * np.sin(np.linspace(0, 100, 4000))).astype(np.float32)
    g = gr.Graph()
    g.connect(VectorSource(tone), sink_for_uri(f"file://{p}", sample_rate=8000.0))
    sched = gr.Scheduler(g, block_len=1000)
    sched.run_and_wait()
    for b in sched.compiled.order:
        b.stop()
    g2 = gr.Graph()
    snk = VectorSink()
    g2.connect(source_for_uri(f"file://{p}"), snk)
    gr.Scheduler(g2, block_len=1000).run_and_wait()
    np.testing.assert_allclose(snk.data(), tone, atol=1e-4)


def test_sdr_uri():
    src = source_for_uri("sdr://loopback?sample_rate=1e6&center_frequency=99.5e6")
    assert type(src).__name__ == "SdrSource"
    assert src.settings.get("sample_rate") == 1e6
    assert src.settings.get("center_frequency") == 99.5e6


def test_unknown_scheme():
    with pytest.raises(gr.GrError):
        source_for_uri("ftp://nope/file")
