"""SigMF recording format: datatype mapping, write/read helpers, recorded
tags -> annotations -> replayed tags, record/playback exactness through the
Scheduler, ci16 quantized storage, error paths."""

import json
import os

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.sigmf import (SIGMF_VERSION, SigmfSource,
                                        read_sigmf, write_sigmf)
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.core.errors import GrError
from gnuradio4_tpu.core.tags import Tag


class TestHelpers:
    @pytest.mark.parametrize("dtype,name", [
        (np.complex64, "cf32_le"), (np.float32, "rf32_le"),
        (np.int16, "ri16_le"), (np.uint8, "ru8"),
    ])
    def test_datatype_roundtrip(self, tmp_path, dtype, name):
        base = str(tmp_path / "rec")
        x = (np.arange(100) % 17).astype(dtype)
        write_sigmf(base, x, sample_rate=1e6)
        y, meta = read_sigmf(base)
        assert meta["global"]["core:datatype"] == name
        assert meta["global"]["core:version"] == SIGMF_VERSION
        np.testing.assert_array_equal(y, x)

    def test_ci16_quantized(self, tmp_path):
        base = str(tmp_path / "rec")
        iq = (0.5 * np.exp(2j * np.pi * 0.01 * np.arange(500))
              ).astype(np.complex64)
        write_sigmf(base, iq, sample_rate=2e6, frequency=433e6,
                    datatype="ci16_le")
        y, meta = read_sigmf(base)
        assert meta["captures"][0]["core:frequency"] == 433e6
        assert np.abs(y - iq).max() < 1e-4         # sub-LSB of int16

    def test_meta_is_valid_json_file_pair(self, tmp_path):
        base = str(tmp_path / "rec")
        write_sigmf(base, np.zeros(8, np.float32), sample_rate=1.0)
        assert os.path.exists(base + ".sigmf-data")
        meta = json.loads(open(base + ".sigmf-meta").read())
        assert set(meta) == {"global", "captures", "annotations"}

    def test_unsupported_datatype_raises(self, tmp_path):
        base = str(tmp_path / "rec")
        write_sigmf(base, np.zeros(8, np.float32), sample_rate=1.0)
        meta = json.loads(open(base + ".sigmf-meta").read())
        meta["global"]["core:datatype"] = "cq128_le"
        open(base + ".sigmf-meta", "w").write(json.dumps(meta))
        with pytest.raises(GrError):
            read_sigmf(base)


class TestRecordPlayback:
    def test_scheduler_roundtrip_exact(self, tmp_path):
        base = str(tmp_path / "tone")
        g = gr.Graph()
        src = g.emplace("ComplexToneSource", frequency=1000.0,
                        n_samples=8192)
        snk = g.emplace("SigmfSink", path=base, description="tone rec")
        g.connect(src, snk)
        gr.Scheduler(g, block_len=2048, sample_rate=48000.0).run_and_wait()
        x, meta = read_sigmf(base)
        assert meta["global"]["core:sample_rate"] == 48000.0
        assert meta["global"]["core:datatype"] == "cf32_le"
        assert len(x) == 8192

        g2 = gr.Graph()
        s2 = g2.emplace("SigmfSource", path=base)
        v2 = g2.add(VectorSink())
        g2.connect(s2, v2)
        gr.Scheduler(g2, block_len=2048, sample_rate=48000.0).run_and_wait()
        np.testing.assert_array_equal(np.asarray(v2.data()), x)
        # capture metadata re-enters as a stream tag
        rate = [t for t in v2.tags if t.map.get("sample_rate") == 48000.0]
        assert rate and rate[0].index == 0

    def test_string_tags_become_annotations_and_replay(self, tmp_path):
        from gnuradio4_tpu.blocks.testing import TagSource
        base = str(tmp_path / "tagged")
        g = gr.Graph()
        src = g.add(TagSource(n_samples=4096, tags=[
            Tag(100, {"burst_id": "alpha"}),
            Tag(3000, {"burst_id": "beta"})]))
        snk = g.emplace("SigmfSink", path=base)
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1024, sample_rate=1e6).run_and_wait()
        meta = json.loads(open(base + ".sigmf-meta").read())
        labels = {a["core:sample_start"]: a["core:label"]
                  for a in meta["annotations"]}
        assert labels == {100: "burst_id=alpha", 3000: "burst_id=beta"}

        g2 = gr.Graph()
        s2 = g2.emplace("SigmfSource", path=base)
        v2 = g2.add(VectorSink())
        g2.connect(s2, v2)
        gr.Scheduler(g2, block_len=1024, sample_rate=1e6).run_and_wait()
        anns = {int(t.index): t.map["annotation"] for t in v2.tags
                if "annotation" in t.map}
        assert anns == {100: "burst_id=alpha", 3000: "burst_id=beta"}

    def test_repeat_playback(self, tmp_path):
        base = str(tmp_path / "loop")
        write_sigmf(base, np.arange(100, dtype=np.float32), sample_rate=1e3)
        src = SigmfSource(path=base, repeat=True)
        src.start()
        got, _ = src.host_feed(250, 0)
        np.testing.assert_array_equal(got["out"][:100], np.arange(100))
        np.testing.assert_array_equal(got["out"][100:200], np.arange(100))

    def test_missing_recording_raises(self):
        src = SigmfSource(path="/nonexistent/rec")
        with pytest.raises(GrError):
            src.start()

    def test_decode_a_recorded_transmission(self, tmp_path):
        # end-to-end ecosystem check: record an RTTY transmission to SigMF,
        # play it back into the decoder — text survives the disk trip
        from gnuradio4_tpu.blocks.rtty import rtty_modulate
        base = str(tmp_path / "rtty")
        audio = rtty_modulate("VIA SIGMF 73", fs=48000.0)
        write_sigmf(base, audio, sample_rate=48000.0)
        g = gr.Graph()
        src = g.emplace("SigmfSource", path=base)
        dec = g.emplace("RttyDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=8192, sample_rate=48000.0).run_and_wait()
        assert dec.text == "VIA SIGMF 73"
