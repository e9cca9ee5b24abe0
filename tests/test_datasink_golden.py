"""Golden mirror of the reference's qa_DataSink.cpp
(blocks/basic/test/qa_DataSink.cpp:209-823): continuous callbacks (three
arities, chunk-size cap, metadata tag), blocking/non-blocking polling with
drop accounting, trigger windows around duplicate/overlapping triggers,
snapshot capture at trigger+delay, the stateful YEAR/MONTH/DAY multiplexed
matcher matrix, and DataSet polling/callbacks off a StreamToDataSet chain."""

import dataclasses

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.acquisition import StreamToDataSet
from gnuradio4_tpu.blocks.testing import VectorSource
from gnuradio4_tpu.core.datasink import (DataSink, DataSinkQuery,
                                         OverflowPolicy,
                                         global_data_sink_registry as reg)
from gnuradio4_tpu.core.tags import Keys, Tag
from gnuradio4_tpu.core.trigger import MatchResult


def make_tag(index, year, month, day):
    return Tag(index, {"YEAR": year, "MONTH": month, "DAY": day})


def make_test_tags(first_index, interval, n_tags_per_index=1):
    # ≈ qa_DataSink.cpp:96 makeTestTags
    tags = []
    for y in (1, 2, 3):
        for m in (1, 2):
            for d in (1, 2, 3):
                for i in range(n_tags_per_index):
                    tags.append(make_tag(first_index, y + i, m + i, d + i))
                first_index += interval
    return tags


def is_trigger(tag: Tag) -> MatchResult:
    # ≈ qa_DataSink.cpp:152 isTrigger
    return (MatchResult.MATCHED
            if tag.map.get(Keys.TRIGGER_NAME) == "TRIGGER"
            else MatchResult.IGNORE)


@dataclasses.dataclass
class YmdMatcher:
    """≈ qa_DataSink.cpp:44 stateful Matcher: per-field None=ignore,
    -1=restart-on-change, value=window-while-equal."""

    year: int | None = None
    month: int | None = None
    day: int | None = None
    last_seen: tuple | None = None
    last_matched: bool = False

    def __call__(self, tag: Tag) -> MatchResult:
        if not all(k in tag.map for k in ("YEAR", "MONTH", "DAY")):
            return MatchResult.IGNORE
        y, m, d = (int(tag.map[k]) for k in ("YEAR", "MONTH", "DAY"))
        ly, lm, ld = self.last_seen if self.last_seen else (None,) * 3

        def same(x, other):
            return other is not None and x == other

        restart = ((self.year == -1 and not same(y, ly))
                   or (self.month == -1 and not same(m, lm))
                   or (self.day == -1 and not same(d, ld)))
        matches = ((self.year is None or self.year == -1 or same(y, self.year))
                   and (self.month is None or self.month == -1
                        or same(m, self.month))
                   and (self.day is None or self.day == -1
                        or same(d, self.day)))
        r = MatchResult.IGNORE
        if not matches:
            r = MatchResult.NOT_MATCHED
        elif not self.last_matched or restart:
            r = MatchResult.MATCHED
        self.last_seen = (y, m, d)
        self.last_matched = matches
        return r


def to_ascii_art(states):
    # ≈ qa_DataSink.cpp:111 toAsciiArt
    started, r = False, ""
    for s in states:
        if s is MatchResult.MATCHED:
            r += "||#" if started else "|#"
            started = True
        elif s is MatchResult.NOT_MATCHED:
            r += "|_" if started else "_"
            started = False
        else:
            r += "#" if started else "_"
    return r


def run_matcher_test(tags, matcher):
    return to_ascii_art([matcher(t) for t in tags])


SRC_META = {Keys.SIGNAL_NAME: "TestName", Keys.SIGNAL_UNIT: "TestUnit",
            Keys.SIGNAL_QUANTITY: "TestQuantity",
            Keys.SIGNAL_MIN: -42.0, Keys.SIGNAL_MAX: 42.0}


def _build_graph(n, src_tags, **sink_settings):
    g = gr.Graph()
    src = VectorSource(np.arange(n, dtype=np.float32), tags=src_tags)
    sink = DataSink(name="test_sink", signal_name="TestName", **sink_settings)
    g.connect(src, sink)
    return g, sink


class TestContinuousCallback:
    """≈ "continuous mode - callback" (qa_DataSink.cpp:217-319)."""

    def test_three_callback_arities_chunking_and_tags(self):
        n, max_chunk = 30005, 1000
        src_tags = [Tag(0, dict(SRC_META))] + make_test_tags(0, 1234, 1)
        g, sink = _build_graph(n, src_tags)

        seen1 = {"samples": 0, "chunks": 0}

        def cb1(data):
            np.testing.assert_array_equal(
                data, np.arange(seen1["samples"],
                                seen1["samples"] + data.shape[-1],
                                dtype=np.float32))
            assert data.shape[-1] <= max_chunk
            seen1["samples"] += data.shape[-1]
            seen1["chunks"] += 1

        seen2 = {"samples": 0}
        received_tags = []

        def cb2(data, tags):
            for t in tags:
                assert 0 <= t.index < data.shape[-1]
                received_tags.append(t.shifted(seen2["samples"]))
            seen2["samples"] += data.shape[-1]

        def cb3(data, tags, passed_sink):
            assert passed_sink.name == "test_sink"
            assert passed_sink is sink

        assert reg.register_streaming_callback(
            DataSinkQuery.sink("test_sink"), max_chunk, cb1)
        assert reg.register_streaming_callback(
            DataSinkQuery.signal("TestName"), max_chunk, cb2)
        assert reg.register_streaming_callback(
            DataSinkQuery.sink("test_sink"), max_chunk, cb3)
        gr.Scheduler(g, block_len=4096).run_and_wait()

        assert seen1["samples"] == n
        assert seen2["samples"] == n
        assert seen1["chunks"] >= (n + max_chunk - 1) // max_chunk
        # expected: DataSink metadata tag first, then the source tags
        # (qa_DataSink.cpp:308-318 srcAndMetaTags)
        assert received_tags[0].index == 0
        assert received_tags[0].map[Keys.SAMPLE_RATE] == 1.0
        for k, v in SRC_META.items():
            assert received_tags[0].map[k] == v
        rest = received_tags[1:]
        assert len(rest) == len(src_tags)
        for got, exp in zip(rest, src_tags):
            assert got.index == exp.index and got.map == exp.map


class TestContinuousPolling:
    """≈ "continuous mode - blocking/non-blocking polling" (cpp:321-430)."""

    def test_invalid_type_poller_is_none(self):
        g, sink = _build_graph(100, [])
        assert reg.get_streaming_poller(DataSinkQuery.sink("no_such_sink")) \
            is None
        gr.Scheduler(g, block_len=100).run_and_wait()

    def test_declared_dtype_mismatch_is_none(self):
        g, sink = _build_graph(100, [], dtype="float32")
        assert reg.get_streaming_poller(DataSinkQuery.sink("test_sink"),
                                        dtype="float64") is None
        assert reg.get_streaming_poller(DataSinkQuery.sink("test_sink"),
                                        dtype="float32") is not None
        gr.Scheduler(g, block_len=100).run_and_wait()

    def test_blocking_gets_everything_no_drops(self):
        n = 30005
        src_tags = [Tag(0, dict(SRC_META))] + make_test_tags(0, 1234, 2)
        g, sink = _build_graph(n, src_tags)
        p = reg.get_streaming_poller(DataSinkQuery.signal("TestName"),
                                     policy=OverflowPolicy.BACKPRESSURE,
                                     max_chunks=256)
        gr.Scheduler(g, block_len=1024).run_and_wait()
        received, received_tags = [], []
        for c in p.read_all():
            for t in c.tags:
                if Keys.END_OF_STREAM in t.map:
                    continue
                received_tags.append(t.shifted(sum(len(r) for r in received)))
            received.append(np.asarray(c.data))
        data = np.concatenate(received, axis=-1)
        np.testing.assert_array_equal(data, np.arange(n, dtype=np.float32))
        assert p.dropped_sample_count == 0
        assert p.dropped_tag_count == 0
        assert p.finished
        # meta tag + source tags all present
        assert len(received_tags) == 1 + len(src_tags)

    def test_nonblocking_drops_are_accounted(self):
        n = 30005
        g, sink = _build_graph(n, [])
        p = reg.get_streaming_poller(DataSinkQuery.sink("test_sink"),
                                     policy=OverflowPolicy.DROP, max_chunks=2)
        gr.Scheduler(g, block_len=1024).run_and_wait()
        received = sum(c.data.shape[-1] for c in p.read_all())
        assert p.dropped_sample_count > 0
        assert received + p.dropped_sample_count == n

    def test_poller_after_stop_is_none(self):
        # ≈ cpp:390 pollerAfterStop == nullptr: the sink unregisters on stop
        g, sink = _build_graph(100, [])
        gr.Scheduler(g, block_len=100).run_and_wait()
        assert reg.get_streaming_poller(DataSinkQuery.sink("test_sink")) is None


TRIGGER_INDICES = [1001, 1001, 1002, 1003, 1003, 1005, 1007, 10000, 10000,
                   20000]


def _trigger_src_tags():
    tags = [Tag(0, dict(SRC_META, **{Keys.SIGNAL_MIN: -2.0,
                                     Keys.SIGNAL_MAX: 2.0}))]
    for t, i in enumerate(TRIGGER_INDICES):
        tags.append(Tag(i, {Keys.TRIGGER_NAME: "TRIGGER",
                            Keys.TRIGGER_TIME: t}))
    tags.append(Tag(21000, {Keys.TRIGGER_NAME: "NO_TRIGGER1"}))
    tags.append(Tag(21000, {Keys.TRIGGER_NAME: "NO_TRIGGER2"}))
    tags.append(Tag(22000, {Keys.TRIGGER_NAME: "NO_TRIGGER3"}))
    return tags


class TestTriggerMode:
    """≈ "trigger mode - polling/callback overlapping/non-overlapping"
    (cpp:432-522): duplicate same-index triggers each get their own window."""

    def _expected(self, pre, post):
        out = []
        for i in TRIGGER_INDICES:
            out += list(range(i - pre, i + post))
        return np.asarray(out, np.float32)

    def _check(self, datasets, pre, post):
        received, n_tags = [], 0
        for ds in datasets:
            assert ds.values.shape[-1] == pre + post
            assert ds.signals[0].name == "TestName"
            assert ds.signals[0].unit == "TestUnit"
            assert ds.signals[0].quantity == "TestQuantity"
            assert ds.signals[0].range_min == -2.0
            assert ds.signals[0].range_max == 2.0
            evts = ds.timing_events[0]
            assert len(evts) == 1
            assert evts[0].index == pre
            assert evts[0].map[Keys.TRIGGER_NAME] == "TRIGGER"
            assert evts[0].map[Keys.TRIGGER_TIME] < len(TRIGGER_INDICES)
            received.append(ds.values[0])
            n_tags += len(evts)
        got = np.concatenate(received) if received else np.zeros(0)
        np.testing.assert_array_equal(got, self._expected(pre, post))
        assert n_tags == len(TRIGGER_INDICES)

    def test_polling_and_callback(self):
        pre, post = 5, 7
        n = 30000
        g, sink = _build_graph(n, _trigger_src_tags())
        p = reg.get_trigger_poller(DataSinkQuery.sink("test_sink"),
                                   is_trigger, pre=pre, post=post,
                                   max_windows=64)
        cb_datasets = []
        assert reg.register_trigger_callback(
            DataSinkQuery.sink("test_sink"), is_trigger, pre, post,
            cb_datasets.append)
        gr.Scheduler(g, block_len=2048).run_and_wait()
        polled = []
        while True:
            ds = p.read(timeout=0.0)
            if ds is None:
                break
            polled.append(ds)
        self._check(polled, pre, post)
        self._check(cb_datasets, pre, post)


class TestSnapshotMode:
    """≈ "snapshot mode - polling/callback" (cpp:524-612): value at
    trigger+delay, delay given in seconds against the tag-updated rate."""

    def test_polling_and_callback(self):
        n = 30000
        fs = 10000.0
        delay_s = 0.5             # → 5000 samples at 10 kHz
        n_delay = 5000
        tags = [Tag(0, dict(SRC_META, **{Keys.SAMPLE_RATE: fs,
                                         Keys.SIGNAL_MIN: 0.0,
                                         Keys.SIGNAL_MAX: float(n - 1)}))]
        for t, i in enumerate(TRIGGER_INDICES):
            tags.append(Tag(i, {Keys.TRIGGER_NAME: "TRIGGER",
                                Keys.TRIGGER_TIME: t}))
        g, sink = _build_graph(n, tags)
        p = reg.get_snapshot_poller(DataSinkQuery.sink("test_sink"),
                                    is_trigger, delay_s=delay_s,
                                    emit="dataset")
        cb_datasets = []
        assert reg.register_snapshot_callback(
            DataSinkQuery.sink("test_sink"), is_trigger, cb_datasets.append,
            delay_s=delay_s)
        gr.Scheduler(g, block_len=2048).run_and_wait()

        expected = [float(i + n_delay) for i in TRIGGER_INDICES]
        for datasets in ([p.read(timeout=0.0)
                          for _ in TRIGGER_INDICES], cb_datasets):
            values = [ds.values[0, 0] for ds in datasets]
            assert values == expected
            for ds in datasets:
                assert ds.values.shape[-1] == 1
                evts = ds.timing_events[0]
                assert len(evts) == 1
                assert evts[0].index == -n_delay   # trigger sits delay back
                assert evts[0].map[Keys.TRIGGER_NAME] == "TRIGGER"
        assert p.read(timeout=0.0) is None


class TestMultiplexedMode:
    """≈ "multiplexed mode - blocking polling" (cpp:614-710): the stateful
    YEAR/MONTH/DAY matcher matrix, ascii-art probes, window front/back pairs,
    100k window cap, EOS flush."""

    def test_matcher_ascii_art(self):
        tags = make_test_tags(0, 10000)
        assert run_matcher_test(tags, YmdMatcher(None, -1, None)) == \
            "|###||###||###||###||###||###"
        assert run_matcher_test(tags, YmdMatcher(-1, None, None)) == \
            "|######||######||######"
        assert run_matcher_test(tags, YmdMatcher(1, None, None)) == \
            "|######|____________"
        assert run_matcher_test(tags, YmdMatcher(1, None, 2)) == \
            "_|#|__|#|_____________"
        assert run_matcher_test(tags, YmdMatcher(None, None, 1)) == \
            "|#|__|#|__|#|__|#|__|#|__|#|__"

    def test_window_matrix_polling_and_callbacks(self):
        tags = make_test_tags(0, 10000)
        n = len(tags) * 10000 + 100000
        g = gr.Graph()
        src = VectorSource(np.arange(n, dtype=np.int32), tags=tags)
        sink = DataSink(name="test_sink", signal_name="test signal")
        g.connect(src, sink)

        matchers = [(None, -1, None), (-1, None, None), (1, None, None),
                    (1, None, 2), (None, None, 1)]
        expected = [
            [0, 29999, 30000, 59999, 60000, 89999, 90000, 119999,
             120000, 149999, 150000, 249999],
            [0, 59999, 60000, 119999, 120000, 219999],
            [0, 59999],
            [10000, 19999, 40000, 49999],
            [0, 9999, 30000, 39999, 60000, 69999, 90000, 99999,
             120000, 129999, 150000, 159999],
        ]
        pollers = [reg.get_multiplexed_poller(
            DataSinkQuery.sink("test_sink"), YmdMatcher(*m),
            max_samples=100000, max_windows=64) for m in matchers]
        cb_results = [[] for _ in matchers]
        for i, m in enumerate(matchers):
            assert reg.register_multiplexed_callback(
                DataSinkQuery.sink("test_sink"), YmdMatcher(*m), 100000,
                (lambda r: lambda ds: r.extend(
                    [int(ds.values[0, 0]), int(ds.values[0, -1])]))(
                        cb_results[i]))
        gr.Scheduler(g, block_len=8192).run_and_wait()

        for i, p in enumerate(pollers):
            got = []
            while True:
                ds = p.read(timeout=0.0)
                if ds is None:
                    break
                assert ds.signals[0].name == "test signal"
                assert ds.signals[0].unit == "a.u."
                got += [int(ds.values[0, 0]), int(ds.values[0, -1])]
            assert got == expected[i], (i, got)
            assert cb_results[i] == expected[i], i


class TestDataSetPolling:
    """≈ "DataSet - polling" / "DataSet - callback" (cpp:712-820): the
    StreamToDataSet chain feeding registry DataSet pollers/callbacks."""

    def _build(self):
        g = gr.Graph()
        src = VectorSource(
            np.arange(1024, dtype=np.float32),
            tags=[Tag(400, {Keys.TRIGGER_NAME: "CMD_DIAG_TRIGGER1",
                            Keys.TRIGGER_TIME: 0,
                            Keys.CONTEXT: ""}),
                  Tag(800, {Keys.TRIGGER_NAME: "CMD_DIAG_TRIGGER1",
                            Keys.TRIGGER_TIME: 0,
                            Keys.CONTEXT: ""})])
        s2d = StreamToDataSet(name="test_sink", filter="CMD_DIAG_TRIGGER1",
                              n_pre=100, n_post=200,
                              signal_name="test signal",
                              signal_unit="test unit")
        g.connect(src, s2d)
        return g, s2d

    def _check(self, datasets):
        assert len(datasets) == 2
        np.testing.assert_array_equal(datasets[0].values[0],
                                      np.arange(300, 600, dtype=np.float32))
        np.testing.assert_array_equal(datasets[1].values[0],
                                      np.arange(700, 1000, dtype=np.float32))
        for ds in datasets:
            assert ds.signals[0].name == "test signal"
            assert ds.signals[0].unit == "test unit"
            assert len(ds.timing_events[0]) == 1
            assert ds.timing_events[0][0].index == 100

    def test_polling(self):
        g, s2d = self._build()
        p = reg.get_dataset_poller(DataSinkQuery.sink("test_sink"))
        assert p is not None
        gr.Scheduler(g, block_len=256).run_and_wait()
        assert p.finished
        self._check(p.read_all())
        assert p.drop_count == 0

    def test_callback(self):
        g, s2d = self._build()
        received = []
        assert reg.register_dataset_callback(
            DataSinkQuery.signal("test signal"), received.append)
        gr.Scheduler(g, block_len=256).run_and_wait()
        self._check(received)

    def test_unknown_query_returns_none(self):
        assert reg.get_dataset_poller(DataSinkQuery.sink("nope")) is None
        assert not reg.register_dataset_callback(DataSinkQuery.sink("nope"),
                                                 lambda ds: None)


class TestReviewRegressions:
    def test_meta_tag_survives_empty_first_chunk(self):
        # review finding: an n_valid==0 first delivery must not swallow the
        # one-shot DataSink metadata tag
        sink = DataSink(name="meta_sink")
        p = sink.attach(__import__("gnuradio4_tpu.core.datasink",
                                   fromlist=["StreamingPoller"]
                                   ).StreamingPoller())
        sink.consume({"in": np.zeros((4,), np.float32)}, {}, 0, 0)
        sink.consume({"in": np.arange(4, dtype=np.float32)}, {}, 4, 4)
        chunk = p.read(timeout=0.1)
        assert chunk is not None
        assert any(Keys.SAMPLE_RATE in t.map for t in chunk.tags)
        sink.stop()

    def test_streaming_callback_var_positional(self):
        # review finding: fn(*args) must receive all three arguments
        sink = DataSink(name="vp_sink")
        got = []
        reg.register_streaming_callback(DataSinkQuery.sink("vp_sink"), 64,
                                        lambda *a: got.append(len(a)))
        sink.consume({"in": np.arange(8, dtype=np.float32)}, {}, 8, 0)
        assert got == [3]
        sink.stop()

    def test_streaming_callback_keyword_only(self):
        sink = DataSink(name="ko_sink")
        seen = []
        reg.register_streaming_callback(
            DataSinkQuery.sink("ko_sink"), 64,
            lambda data, *, note=None: seen.append(data.shape[-1]))
        sink.consume({"in": np.arange(8, dtype=np.float32)}, {}, 8, 0)
        assert seen == [8]
        sink.stop()
