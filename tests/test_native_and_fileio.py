"""Native ring buffer (C++ double-mmap) + threaded feeder + file IO blocks
(≈ reference qa_buffer concurrency tests + blocks/fileio qa)."""

import threading
import time
import wave
from pathlib import Path

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.native.ring import HostRing, build_native, native_available
from gnuradio4_tpu.core.feeder import ThreadedFeeder, read_exact
from gnuradio4_tpu.blocks.fileio import FileSink, FileSource, WavSink, WavSource
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


class TestNativeRing:
    def test_native_builds(self):
        assert build_native(), "g++ build of ringbuf.cpp failed"
        assert native_available()

    @pytest.mark.parametrize("force_python", [False, True])
    def test_spsc_roundtrip(self, force_python):
        ring = HostRing(1024, np.float32, force_python=force_python)
        assert ring.is_native == (not force_python)
        r = ring.add_reader()
        data = np.arange(500, dtype=np.float32)
        assert ring.write(data) == 500
        got = ring.read(r, 500)
        np.testing.assert_array_equal(np.array(got), data)
        ring.release(r, 500)
        assert ring.readable(r) == 0

    def test_wraparound_contiguity(self):
        """The double-mmap must give contiguous views across the wrap point."""
        ring = HostRing(1024, np.float32)
        if not ring.is_native:
            pytest.skip("native ring unavailable")
        r = ring.add_reader()
        cap = ring.capacity
        # advance near the end, then write a span crossing the boundary
        pre = np.zeros(cap - 7, np.float32)
        ring.write(pre)
        ring.release(r, len(ring.read(r)))
        data = np.arange(20, dtype=np.float32)
        span = ring.reserve(20)
        assert len(span) == 20          # contiguous despite crossing the wrap
        span[:] = data
        ring.publish(20)
        got = ring.read(r, 20)
        assert len(got) == 20
        np.testing.assert_array_equal(np.array(got), data)

    def test_backpressure_blocks_producer(self):
        ring = HostRing(256, np.float32)   # capacity is page-granular (≥1024 items)
        r = ring.add_reader()
        n = ring.capacity * 2
        big = np.arange(n, dtype=np.float32)
        wrote = ring.write(big, block=False)
        assert wrote == ring.capacity  # full stop at capacity
        got = ring.read(r)
        ring.release(r, len(got))
        wrote2 = ring.write(big[wrote:], block=False)
        assert wrote2 == n - ring.capacity

    def test_threaded_producer_consumer_integrity(self):
        ring = HostRing(1 << 12, np.int32)
        r = ring.add_reader()
        total = 200_000
        def produce():
            ring.write(np.arange(total, dtype=np.int32), block=True, timeout=30)
            ring.set_eos()
        t = threading.Thread(target=produce, daemon=True)
        t.start()
        got = []
        while True:
            chunk = read_exact(ring, r, 4096, timeout=30)
            if chunk is None:
                break
            got.append(chunk)
        out = np.concatenate(got)
        assert out.shape == (total,)
        np.testing.assert_array_equal(out, np.arange(total, dtype=np.int32))

    def test_two_readers_independent(self):
        ring = HostRing(1024, np.float32)
        r1, r2 = ring.add_reader(), ring.add_reader()
        ring.write(np.arange(100, dtype=np.float32))
        a = ring.read(r1, 100); ring.release(r1, 100)
        b = ring.read(r2, 50); ring.release(r2, 50)
        np.testing.assert_array_equal(np.array(a)[:50], np.array(b))
        assert ring.readable(r1) == 0 and ring.readable(r2) == 50


class TestFeeder:
    def test_feeder_streams_iterator(self):
        chunks = [np.full(100, i, np.float32) for i in range(20)]
        f = ThreadedFeeder(iter(chunks), np.float32).start()
        r = f.reader
        out = []
        while True:
            c = read_exact(f.ring, r, 250, timeout=10)
            if c is None:
                break
            out.append(c)
        data = np.concatenate(out)
        assert data.shape == (2000,)
        ref = np.concatenate(chunks)
        np.testing.assert_array_equal(data, ref)


class TestFileIo:
    def test_file_roundtrip(self, tmp_path):
        path_in = tmp_path / "in.f32"
        path_out = tmp_path / "out.f32"
        data = np.sin(np.arange(10_000, dtype=np.float32))
        path_in.write_bytes(data.tobytes())

        g = gr.Graph()
        src = FileSource(path=str(path_in), dtype="float32")
        snk = FileSink(path=str(path_out))
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1024).run_and_wait()
        out = np.frombuffer(path_out.read_bytes(), dtype=np.float32)
        np.testing.assert_array_equal(out, data)

    def test_file_source_offset_and_limit(self, tmp_path):
        p = tmp_path / "x.i16"
        data = np.arange(1000, dtype=np.int16)
        p.write_bytes(data.tobytes())
        g = gr.Graph()
        src = FileSource(path=str(p), dtype="int16", offset_items=100,
                         n_items=300)
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=128).run_and_wait()
        np.testing.assert_array_equal(snk.data(), data[100:400])

    def test_missing_file_errors(self):
        g = gr.Graph()
        src = FileSource(path="/nonexistent/file.f32")
        snk = VectorSink()
        g.connect(src, snk)
        with pytest.raises(Exception):
            gr.Scheduler(g, block_len=64).run_and_wait()

    def test_wav_roundtrip_mono(self, tmp_path):
        wav_out = tmp_path / "t.wav"
        fs = 8000.0
        tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / fs)
                ).astype(np.float32)
        g = gr.Graph()
        src = VectorSource(tone)
        snk = WavSink(path=str(wav_out), sample_rate=fs)
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1000).run_and_wait()

        g2 = gr.Graph()
        src2 = WavSource(path=str(wav_out))
        snk2 = VectorSink()
        g2.connect(src2, snk2)
        gr.Scheduler(g2, block_len=1000).run_and_wait()
        out = snk2.data()
        assert out.shape == (4000,)
        np.testing.assert_allclose(out, tone, atol=0.6 / 32768)
        # sample_rate tag forwarded from WAV header
        assert any(t.map.get("sample_rate") == fs for t in snk2.tags)

    def test_wav_stereo(self, tmp_path):
        p = tmp_path / "st.wav"
        fs = 8000
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(fs)
            lr = np.zeros(2000, dtype="<i2")
            lr[0::2] = 1000   # L
            lr[1::2] = -2000  # R
            w.writeframes(lr.tobytes())
        g = gr.Graph()
        src = WavSource(path=str(p))
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=500).run_and_wait()
        out = snk.data()
        assert out.shape == (2, 1000)
        np.testing.assert_allclose(out[0], 1000 / 32768, atol=1e-4)
        np.testing.assert_allclose(out[1], -2000 / 32768, atol=1e-4)


class TestNativeConvert:
    def test_native_builds_and_available(self):
        from gnuradio4_tpu.native import convert as cv
        assert cv.build_native()
        assert cv.native_available()

    def test_i16_roundtrip(self, rng):
        from gnuradio4_tpu.native import convert as cv
        x = np.clip(rng.standard_normal(4096) * 0.3, -0.99, 0.99
                    ).astype(np.float32)
        i = cv.f32_to_i16(x)
        back = cv.i16_to_f32(i, scale=1.0 / 32767.0)
        np.testing.assert_allclose(back, x, atol=1.0 / 32767)

    def test_u8iq(self):
        from gnuradio4_tpu.native import convert as cv
        raw = np.array([127, 127, 255, 0, 0, 255], np.uint8)  # ~0, +1-1j, -1+1j
        c = cv.u8iq_to_c64(raw)
        np.testing.assert_allclose(c[1], 1.0 - 1.0j, atol=0.01)
        np.testing.assert_allclose(c[2], -1.0 + 1.0j, atol=0.01)

    def test_matches_numpy_reference(self, rng):
        from gnuradio4_tpu.native import convert as cv
        raw = rng.integers(-32768, 32767, 999, dtype=np.int16)
        np.testing.assert_allclose(cv.i16_to_f32(raw),
                                   raw.astype(np.float32) / 32768.0,
                                   rtol=1e-6)

    def test_file_source_wire_format(self, tmp_path, rng):
        """i16 IQ file → complex64 stream via the native converter."""
        iq = (rng.standard_normal(2000) * 8000).astype(np.int16)
        p = tmp_path / "capture.i16iq"
        p.write_bytes(iq.tobytes())
        g = gr.Graph()
        src = FileSource(path=str(p), wire_format="i16iq")
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=256).run_and_wait()
        out = snk.data()
        assert out.dtype == np.complex64
        assert out.shape == (1000,)
        ref = iq.astype(np.float32) / 32768.0
        np.testing.assert_allclose(out.real, ref[0::2], atol=1e-6)
        np.testing.assert_allclose(out.imag, ref[1::2], atol=1e-6)


class TestMultiProducerRing:
    """CAS-claim multi-producer write path (≈ MultiProducerStrategy,
    ClaimStrategy.hpp:116): concurrent writers, ticket-ordered publish."""

    @pytest.mark.parametrize("force_py", [False, True],
                             ids=["native", "python"])
    def test_concurrent_writers_no_interleave_corruption(self, force_py):
        import threading, time
        ring = HostRing(1 << 14, np.int64, force_python=force_py,
                        producers="multi")
        rid = ring.add_reader()
        NP, PER = 4, 30_000
        def producer(pid):
            seq = (np.int64(pid) << 48) | np.arange(PER, dtype=np.int64)
            pos = 0
            rng = np.random.default_rng(pid)
            while pos < PER:
                n = int(min(rng.integers(1, 2049), PER - pos))
                assert ring.write(seq[pos:pos + n], timeout=60) == n
                pos += n
        out = []
        def consumer():
            got = 0
            while got < NP * PER:
                span = ring.read(rid, 0)
                if len(span) == 0:
                    time.sleep(1e-5)
                    continue
                out.append(span.copy())
                ring.release(rid, len(span))
                got += len(span)
        threads = [threading.Thread(target=producer, args=(p,), daemon=True)
                   for p in range(NP)]
        ct = threading.Thread(target=consumer, daemon=True)
        ct.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        ct.join(120)
        y = np.concatenate(out)
        assert len(y) == NP * PER
        for p in range(NP):   # each producer's substream complete and in order
            sub = y[(y >> 48) == p] & ((1 << 48) - 1)
            np.testing.assert_array_equal(sub, np.arange(PER))

    def test_invalid_producers_arg(self):
        with pytest.raises(ValueError, match="single.*multi|multi.*single"):
            HostRing(1024, producers="many")

    def test_zero_copy_reserve_rejected_on_multi(self):
        ring = HostRing(1024, producers="multi")
        with pytest.raises(RuntimeError, match="single-producer-only"):
            ring.reserve(8)


class TestRingTsanDiscipline:
    """Race-detection discipline for the native ring (≈ reference
    -DTHREAD_SANITIZER CI builds + qa_buffer concurrency stress): the C++
    stress harness (SPSC + MP ticket publish + racing reader registration +
    futex waits) must run clean under ThreadSanitizer."""

    def test_ring_stress_under_tsan(self, tmp_path):
        import shutil
        import subprocess
        from pathlib import Path
        import gnuradio4_tpu as gr
        native = Path(gr.__file__).parent / "native"
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        exe = tmp_path / "ring_stress_tsan"
        build = subprocess.run(
            ["g++", "-O1", "-g", "-fsanitize=thread", "-std=c++20",
             str(native / "ring_stress.cpp"), str(native / "ringbuf.cpp"),
             "-o", str(exe)], capture_output=True, text=True, timeout=120)
        if build.returncode != 0:
            pytest.skip(f"TSAN build unavailable: {build.stderr[:200]}")
        run = subprocess.run([str(exe)], capture_output=True, text=True,
                             timeout=180)
        assert run.returncode == 0, run.stderr[-3000:]
        assert "ring_stress OK" in run.stdout
        assert "WARNING: ThreadSanitizer" not in run.stderr
