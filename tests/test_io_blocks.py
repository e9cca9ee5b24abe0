"""Hardware-facing block families with fake backends (≈ reference strategy:
LoopbackDevice for SDR, local cpp-httplib server for HTTP, headless audio):
HTTP source/sink against a local stdlib server, audio loopback, SDR loopback
RF chain, NMEA parsing + GPS/PPS timing tags, ImChart rendering."""

import http.server
import json
import threading
import time

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.audio import AudioSink, AudioSource, LoopbackAudioBackend
from gnuradio4_tpu.blocks.http import HttpSink, HttpSource
from gnuradio4_tpu.blocks.monitor import ImChartMonitor
from gnuradio4_tpu.blocks.sdr import LoopbackDevice, SdrSink, SdrSource
from gnuradio4_tpu.blocks.timing import (GpsSource, PpsSource, ReplayNmeaDevice,
                                         nmea_checksum_ok, parse_nmea)
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.core.tags import Keys
from gnuradio4_tpu.utils.imchart import ImChart, quick_plot


# ---------------------------------------------------------------- HTTP fixtures

class _Handler(http.server.BaseHTTPRequestHandler):
    posted: list[bytes] = []
    serve_data = np.arange(64, dtype=np.float32).tobytes()

    def do_GET(self):
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.end_headers()
        self.wfile.write(self.serve_data)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        type(self).posted.append(self.rfile.read(n))
        self.send_response(204)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.posted.clear()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttp:
    def test_source_streams_payload(self, http_server):
        g = gr.Graph()
        src = HttpSource(url=http_server, parse="bytes", dtype="float32",
                         max_requests=4, period_s=0.0)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=64).run_and_wait()
        out = snk.data()
        assert out.shape == (256,)  # 4 requests × 64
        np.testing.assert_array_equal(out[:64], np.arange(64, dtype=np.float32))

    def test_sink_posts_blocks(self, http_server):
        g = gr.Graph()
        src = VectorSource(np.arange(128, dtype=np.float32))
        snk = HttpSink(url=http_server, parse="json")
        g.connect(src, snk)
        gr.Scheduler(g, block_len=64).run_and_wait()
        assert snk.n_posted == 128 and len(_Handler.posted) == 2
        doc = json.loads(_Handler.posted[0])
        assert doc["data"][:3] == [0.0, 1.0, 2.0]


class TestAudio:
    def test_loopback_roundtrip(self):
        key = f"t{np.random.randint(1e9)}"
        tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4096) / 48000.0)
                ).astype(np.float32)
        # play into the loopback ring
        g1 = gr.Graph()
        src = VectorSource(tone)
        out = AudioSink(backend="loopback", device=key)
        g1.connect(src, out)
        gr.Scheduler(g1, block_len=1024).run_and_wait()
        out.stop()  # EOS on the ring
        # capture from the ring
        g2 = gr.Graph()
        mic = AudioSource(backend="loopback", device=key, n_samples=4096)
        cap = VectorSink()
        g2.connect(mic, cap)
        gr.Scheduler(g2, block_len=1024).run_and_wait()
        np.testing.assert_allclose(cap.data(), tone, atol=1e-6)

    def test_null_backend_runs(self):
        g = gr.Graph()
        src = AudioSource(backend="null", sample_rate=48000.0, n_samples=2048)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1024).run_and_wait()
        assert snk.data().shape == (2048,)


class TestSdr:
    def test_loopback_rf_chain(self):
        """Tone at 100.1 MHz captured at fc=100 MHz appears at +100 kHz baseband."""
        fs = 1e6
        dev = LoopbackDevice(tone_freqs=[100.1e6], total_samples=65536)
        g = gr.Graph()
        src = SdrSource(device=dev, sample_rate=fs, center_frequency=100e6)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=16384, sample_rate=fs).run_and_wait()
        iq = snk.data()
        assert iq.shape == (65536,)
        spec = np.abs(np.fft.fft(iq[:16384]))
        f_peak = np.fft.fftfreq(16384, 1 / fs)[np.argmax(spec)]
        assert abs(f_peak - 100e3) < fs / 16384 * 2
        # sample_rate/frequency tags emitted at stream start
        assert any(t.map.get(Keys.SAMPLE_RATE) == fs for t in snk.tags)
        assert any(t.map.get(Keys.FREQUENCY) == 100e6 for t in snk.tags)

    def test_sdr_sink_records_tx(self):
        dev = LoopbackDevice()
        g = gr.Graph()
        data = np.exp(2j * np.pi * 0.01 * np.arange(4096)).astype(np.complex64)
        src = VectorSource(data)
        snk = SdrSink(device=dev, sample_rate=1e6, center_frequency=100e6)
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1024).run_and_wait()
        tx = np.concatenate(dev.tx_record)
        np.testing.assert_array_equal(tx, data)


NMEA_OK = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
NMEA_GGA = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"


class TestNmea:
    def test_checksum(self):
        assert nmea_checksum_ok(NMEA_OK)
        assert not nmea_checksum_ok(NMEA_OK.replace("A,4807", "A,4808"))

    def test_parse_rmc(self):
        fix = parse_nmea(NMEA_OK)
        assert fix["valid"] and fix["type"] == "RMC"
        np.testing.assert_allclose(fix["lat"], 48 + 7.038 / 60, rtol=1e-6)
        np.testing.assert_allclose(fix["lon"], 11 + 31.0 / 60, rtol=1e-6)
        assert "utc" in fix  # 1994-03-23T12:35:19Z
        assert abs(fix["utc"] - 764426119.0) < 1.0

    def test_parse_gga(self):
        fix = parse_nmea(NMEA_GGA)
        assert fix["fix_quality"] == 1 and fix["n_satellites"] == 8
        np.testing.assert_allclose(fix["altitude_m"], 545.4)

    def test_gps_source_emits_fix_tags(self):
        dev = ReplayNmeaDevice([NMEA_OK, NMEA_GGA, NMEA_OK])
        g = gr.Graph()
        src = GpsSource(device=dev, sample_rate=100.0, n_samples=400)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=100).run_and_wait()
        pps = [t for t in snk.tags if t.map.get(Keys.TRIGGER_NAME) == "gps_pps"]
        assert len(pps) >= 2
        assert any("lat" in t.map for t in pps)

    def test_pps_source_cadence(self):
        g = gr.Graph()
        src = PpsSource(sample_rate=100.0, n_samples=1000)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=250).run_and_wait()
        pps = sorted(t.index for t in snk.tags
                     if t.map.get(Keys.TRIGGER_NAME) == "pps")
        assert pps == [0, 100, 200, 300, 400, 500, 600, 700, 800, 900]


class TestImChart:
    def test_renders_sine(self):
        y = np.sin(np.linspace(0, 4 * np.pi, 400))
        out = quick_plot(y, width=60, height=10)
        lines = out.split("\n")
        assert len(lines) >= 12
        assert "1" in lines[0]  # y-max label
        assert any("⠀" <= ch <= "⣿" for ch in "".join(lines))  # braille content

    def test_monitor_block_renders(self):
        g = gr.Graph()
        src = VectorSource(np.sin(np.linspace(0, 20, 4096)).astype(np.float32))
        mon = ImChartMonitor(window=1024, refresh_every=2, stream="none")
        g.connect(src, mon)
        gr.Scheduler(g, block_len=512).run_and_wait()
        assert mon._renders >= 2
        assert len(mon.last_render.split("\n")) > 5


class TestSdrMultiChannel:
    def test_two_channel_rx(self):
        fs = 1e6
        dev = LoopbackDevice(tone_freqs=[100.05e6], total_samples=16384)
        g = gr.Graph()
        src = SdrSource(device=dev, sample_rate=fs, center_frequency=100e6,
                        channels=2)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=8192, sample_rate=fs).run_and_wait()
        iq = snk.data()
        assert iq.shape == (2, 16384)
        # both channels carry the tone; channel 1 has the 0.1-rad phase offset
        ratio = iq[1, 100:200] / iq[0, 100:200]
        np.testing.assert_allclose(np.angle(ratio), 2 * np.pi * 0.1, atol=1e-3)


class TestStreamSource:
    """Generic host-push source (blocks/python_block.py StreamSource)."""

    def test_threaded_push_exact_roundtrip(self):
        data = np.arange(100_003, dtype=np.float32)
        g = gr.Graph()
        src = g.emplace("StreamSource")
        snk = g.emplace("VectorSink")
        g.connect(src, snk)

        def producer():
            pos = 0
            while pos < len(data):
                n = min(7919, len(data) - pos)   # chunks misaligned to blocks
                src.push(data[pos:pos + n])
                pos += n
            src.close()

        threading.Thread(target=producer, daemon=True).start()
        gr.Scheduler(g, block_len=4096, sample_rate=1e6).run_and_wait()
        y = np.asarray(snk.data())
        assert len(y) >= len(data)
        np.testing.assert_array_equal(y[: len(data)], data)

    def test_complex_dtype_and_push_after_close(self):
        g = gr.Graph()
        src = g.emplace("StreamSource", dtype="complex64")
        snk = g.emplace("VectorSink")
        g.connect(src, snk)
        c = (np.linspace(0, 1, 8192) + 1j * np.linspace(1, 0, 8192)
             ).astype(np.complex64)
        src.push(c)
        src.close()
        gr.Scheduler(g, block_len=2048, sample_rate=1e6).run_and_wait()
        y = np.asarray(snk.data())[: len(c)]
        assert y.dtype == np.complex64
        np.testing.assert_array_equal(y, c)
        with pytest.raises(Exception, match="after close"):
            src.push(np.zeros(4, np.complex64))


class TestWaterfallMonitor:
    def test_chirp_renders_moving_peak(self):
        fs = 48000.0
        n = 14 * 256
        t = np.arange(n) / fs
        f0, f1 = 0.05 * fs, 0.45 * fs
        chirp = np.exp(2j * np.pi * (f0 * t + (f1 - f0) / (2 * t[-1]) * t ** 2)
                       ).astype(np.complex64)
        g = gr.Graph()
        src = g.emplace("StreamSource", dtype="complex64")
        wf = g.emplace("WaterfallMonitor", fft_size=256, rows=14, width=64,
                       color=False)
        g.connect(src, wf)
        src.push(chirp)
        src.close()
        gr.Scheduler(g, block_len=512, sample_rate=fs).run_and_wait()
        out = wf.draw()
        lines = out.splitlines()[:-1]
        assert len(lines) == 14
        # peak column must move monotonically right (rising chirp)
        cols = [max(range(len(l)), key=lambda i: "  .:-=+*#%@".find(l[i]))
                for l in lines]
        assert cols[-1] > cols[0] + 20
        assert all(b >= a - 2 for a, b in zip(cols, cols[1:]))

    def test_empty_draw_and_real_input(self):
        g = gr.Graph()
        src = g.emplace("StreamSource", dtype="float32")
        wf = g.emplace("WaterfallMonitor", fft_size=128, rows=4, width=32,
                       color=False)
        g.connect(src, wf)
        assert wf.draw() is None          # dashboard first frame: no crash
        src.push(np.sin(2 * np.pi * 5000 / 48000 * np.arange(4096)
                        ).astype(np.float32))
        src.close()
        gr.Scheduler(g, block_len=1024, sample_rate=48000.0).run_and_wait()
        assert len(wf.draw().splitlines()) == 5


class TestTcpBlocks:
    """TcpSource/TcpSink raw-stream transport (blocks/network.py)."""

    def test_two_graph_link_exact(self):
        rt = gr.Runtime()
        tx = gr.Graph()
        t_src = tx.emplace("CountingSource", n_samples=100_000)
        t_snk = tx.emplace("TcpSink", port=52321, listen=True)
        tx.connect(t_src, t_snk)
        rx = gr.Graph()
        r_src = rx.emplace("TcpSource", port=52321, listen=False,
                           dtype="float32", n_samples=100_000)
        r_snk = rx.emplace("VectorSink")
        rx.connect(r_src, r_snk)
        rt.add(tx, block_len=8192, sample_rate=1e6)
        rt.add(rx, block_len=4096, sample_rate=1e6)
        rt.run_all(timeout=120)
        np.testing.assert_array_equal(
            np.asarray(r_snk.data())[:100_000],
            np.arange(100_000, dtype=np.float32))

    def test_reversed_roles_complex(self):
        rt = gr.Runtime()
        tx = gr.Graph()
        t_src = tx.emplace("ComplexToneSource", frequency=1000.0,
                           n_samples=50_000)
        t_snk = tx.emplace("TcpSink", port=52322, listen=False)
        tx.connect(t_src, t_snk)
        rx = gr.Graph()
        r_src = rx.emplace("TcpSource", port=52322, listen=True,
                           dtype="complex64", n_samples=50_000)
        r_snk = rx.emplace("VectorSink")
        rx.connect(r_src, r_snk)
        rt.add(tx, block_len=4096, sample_rate=48000.0)
        rt.add(rx, block_len=4096, sample_rate=48000.0)
        rt.run_all(timeout=120)
        y = np.asarray(r_snk.data())[:50_000]
        assert y.dtype == np.complex64
        np.testing.assert_allclose(np.mean(np.abs(y) ** 2), 1.0, atol=1e-3)

    def test_dead_peer_raises(self):
        g = gr.Graph()
        s = g.emplace("TcpSource", port=59998, listen=False,
                      connect_timeout=1.5)
        k = g.emplace("NullSink")
        g.connect(s, k)
        with pytest.raises(Exception, match="refused|Connection"):
            gr.Scheduler(g, block_len=1024, sample_rate=1e6).run_and_wait()


class TestUdpBlocks:
    def test_loopback_link(self):
        rt = gr.Runtime()
        rx = gr.Graph()
        r_src = rx.emplace("UdpSource", port=52341, dtype="float32",
                           n_samples=80_000, idle_timeout=20.0)
        r_snk = rx.emplace("VectorSink")
        rx.connect(r_src, r_snk)
        tx = gr.Graph()
        t_src = tx.emplace("CountingSource", n_samples=80_000)
        t_snk = tx.emplace("UdpSink", port=52341, payload_items=1000)
        tx.connect(t_src, t_snk)
        rt.add(rx, block_len=4096, sample_rate=1e6)
        rt.add(tx, block_len=8192, sample_rate=1e6)
        rt.run_all(timeout=120)
        y = np.asarray(r_snk.data())
        # loopback UDP can still drop under heavy host load (shared CI box);
        # demand most datagrams and strict order, not perfection
        assert len(y) >= 60_000
        ref = np.arange(80_000, dtype=np.float32)
        assert np.all(np.diff(y) > 0)           # in-order
        assert np.isin(y, ref).all()

    def test_idle_timeout_ends_stream(self):
        g = gr.Graph()
        src = g.emplace("UdpSource", port=52342, idle_timeout=1.0)
        snk = g.emplace("NullSink")
        g.connect(src, snk)
        import time
        t0 = time.monotonic()
        gr.Scheduler(g, block_len=1024, sample_rate=1e6).run_and_wait()
        assert time.monotonic() - t0 < 35      # ends via idle timeout, no hang
