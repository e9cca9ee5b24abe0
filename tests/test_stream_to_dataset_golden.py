"""Golden mirror of the reference's qa_StreamToDataSet.cpp
(blocks/basic/test/qa_StreamToDataSet.cpp:172-512): the StreamFilter
(stream-out) and StreamToDataSet (DataSet-out) trigger-capture matrix —
excluding/including (``^``) start→stop matchers, single triggers, pre/post
samples, n_max caps, overlapping FIFO-paired windows, tag re-indexing, and
merged auto-forward tags — driven end-to-end through the Scheduler with the
exact stimulus tag script of the qa file."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.acquisition import StreamFilterSink, StreamToDataSet
from gnuradio4_tpu.blocks.testing import VectorSource
from gnuradio4_tpu.core.stream_capture import DEFAULT_AUTO_FORWARD
from gnuradio4_tpu.core.tags import Tag

P1 = "FAIR.SELECTOR.C=1:S=1:P=1"
P2 = "FAIR.SELECTOR.C=1:S=1:P=2"
EXCLUDING = f"[CMD_BP_START/{P1}, CMD_BP_START/{P2}]"
INCLUDING = f"[CMD_BP_START/{P1}, CMD_BP_START/^{P2}]"
SINGLE = "CMD_DIAG_TRIGGER1"

_time = [0]


def _reset_time():
    _time[0] = 0


def _gen(index, name, ctx=""):
    # ≈ qa_StreamToDataSet.cpp:137 genTrigger with the global time counter
    t = _time[0]
    _time[0] += 1
    return Tag(index, {"trigger_name": name, "trigger_time": t,
                       "trigger_offset": 0.0, "context": ctx,
                       "trigger_meta_info": {}})


def gen_start(i):
    return _gen(i, "CMD_BP_START", P1)


def gen_stop(i):
    return _gen(i, "CMD_BP_START", P2)


def gen_single(i):
    return _gen(i, "CMD_DIAG_TRIGGER1")


def gen_no(i):
    return _gen(i, "NO_TRIGGER")


def merged(index, tags):
    # ≈ qa_StreamToDataSet.cpp:155 mergedAutoForwardTag
    m = {}
    for t in tags:
        m.update(t.map)
    return Tag(index, m)


def sample_rate_tag(i):
    return Tag(i, {"sample_rate": 1000.0})


def _stream_src_tags():
    # qa_StreamToDataSet.cpp:187
    _reset_time()
    return [gen_no(2), gen_single(4), gen_start(5), gen_single(8),
            gen_stop(10), gen_single(12), gen_start(15), gen_stop(20),
            gen_single(22)]


def _dataset_src_tags():
    # qa_StreamToDataSet.cpp:321
    _reset_time()
    return [gen_no(2), gen_single(4), gen_no(5), gen_start(5), gen_single(8),
            gen_stop(10), gen_single(12), gen_start(15), gen_start(20),
            gen_stop(25), gen_single(27), gen_stop(30), gen_single(32)]


def _run_stream(filt, n_pre, n_post, block_len=50):
    g = gr.Graph()
    src = VectorSource(np.arange(50, dtype=np.float32),
                       tags=[sample_rate_tag(0)] + _stream_src_tags())
    snk = StreamFilterSink(filter=filt, n_pre=n_pre, n_post=n_post)
    g.connect(src, snk)
    gr.Scheduler(g, block_len=block_len).run_and_wait()
    return snk


def _run_dataset(filt, n_pre, n_post, n_max=100000, block_len=50):
    g = gr.Graph()
    src = VectorSource(np.arange(50, dtype=np.float32),
                       tags=[sample_rate_tag(0)] + _dataset_src_tags())
    snk = StreamToDataSet(filter=filt, n_pre=n_pre, n_post=n_post, n_max=n_max)
    g.connect(src, snk)
    gr.Scheduler(g, block_len=block_len).run_and_wait()
    return snk.read_all(), snk.out_tags


def assert_tags(actual, expected, *, ignore=()):
    assert len(actual) == len(expected), \
        (len(actual), len(expected),
         [(t.index, t.map.get("trigger_name")) for t in actual])
    for a, e in zip(actual, expected):
        assert a.index == e.index, (a, e)
        am = {k: v for k, v in a.map.items() if k not in ignore}
        em = {k: v for k, v in e.map.items() if k not in ignore}
        assert am == em, (a.index, am, em)


class TestStreamToStreamGolden:
    """≈ qa suite "StreamToStream test" (qa_StreamToDataSet.cpp:217-304)."""

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_excluding(self, block_len):
        snk = _run_stream(EXCLUDING, 0, 0, block_len)
        np.testing.assert_array_equal(
            snk.data(), np.asarray([5, 6, 7, 8, 9, 15, 16, 17, 18, 19],
                                   np.float32))
        _reset_time()
        expected = [
            merged(0, [sample_rate_tag(0), gen_no(0), gen_single(0)]),
            gen_start(0),
            gen_single(3),
            merged(5, [gen_stop(5), gen_single(5)]),
            gen_start(5),
        ]
        assert_tags(snk.tags, expected)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_excluding_pre_post(self, block_len):
        snk = _run_stream(EXCLUDING, 2, 2, block_len)
        np.testing.assert_array_equal(
            snk.data(),
            np.asarray([3, 4, 5, 6, 7, 8, 9, 10, 11,
                        13, 14, 15, 16, 17, 18, 19, 20, 21], np.float32))
        _reset_time()
        expected = [
            merged(0, [sample_rate_tag(0), gen_no(0)]),
            gen_single(1),
            gen_start(2),
            gen_single(5),
            gen_stop(7),
            gen_single(9),
            gen_start(11),
            gen_stop(16),
        ]
        assert_tags(snk.tags, expected)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_including(self, block_len):
        snk = _run_stream(INCLUDING, 0, 0, block_len)
        np.testing.assert_array_equal(
            snk.data(),
            np.asarray([5, 6, 7, 8, 9, 10, 11, 15, 16, 17, 18, 19, 20, 21],
                       np.float32))
        _reset_time()
        expected = [
            merged(0, [sample_rate_tag(0), gen_no(0), gen_single(0)]),
            gen_start(0),
            gen_single(3),
            gen_stop(5),
            gen_single(7),
            gen_start(7),
            gen_stop(12),
        ]
        assert_tags(snk.tags, expected)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_including_pre_post(self, block_len):
        snk = _run_stream(INCLUDING, 2, 2, block_len)
        np.testing.assert_array_equal(
            snk.data(),
            np.asarray([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                        13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23],
                       np.float32))
        _reset_time()
        expected = [
            merged(0, [sample_rate_tag(0), gen_no(0)]),
            gen_single(1),
            gen_start(2),
            gen_single(5),
            gen_stop(7),
            gen_single(9),
            gen_start(13),
            gen_stop(18),
            gen_single(20),
        ]
        assert_tags(snk.tags, expected)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_single_trigger_pre_post(self, block_len):
        snk = _run_stream(SINGLE, 2, 2, block_len)
        np.testing.assert_array_equal(
            snk.data(),
            np.asarray([2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                        20, 21, 22, 23], np.float32))
        _reset_time()
        expected = [
            merged(0, [sample_rate_tag(0)]),
            gen_no(0),
            gen_single(2),
            gen_start(3),
            gen_single(6),
            gen_stop(8),
            gen_single(10),
            merged(12, [gen_start(12)]),
            gen_stop(12),
            gen_single(14),
        ]
        assert_tags(snk.tags, expected)


# DataSet expectations: trigger_time regenerates per expected-list construction
# exactly as in the C++ (equal_tag_lists ignores TRIGGER_TIME there too,
# qa_StreamToDataSet.cpp:353)
_IGNORE_DS = ("trigger_time",)


def _check_datasets(datasets, ds_tags, expected_values, expected_tags):
    assert len(datasets) == len(expected_values), \
        [ds.values[0].tolist() for ds in datasets]
    for ds, ev, et in zip(datasets, expected_values, expected_tags):
        ds.check_consistency("TestDataSet")   # ≈ cpp:344 checkConsistency
        np.testing.assert_array_equal(ds.values[0],
                                      np.asarray(ev, np.float32))
        assert_tags(ds.timing_events[0], et, ignore=_IGNORE_DS)
        # axis: time axis at 1 kHz, pre samples at negative time
        assert len(ds.axes[0].values) == len(ev)
    # merged auto-forward tags on the DataSet stream
    # (qa_StreamToDataSet.cpp:356-371)
    assert len(ds_tags) <= len(datasets)
    assert ds_tags, "expected at least one auto-forward tag"
    for t in ds_tags:
        assert t.index <= len(datasets) - 1
        assert set(t.map) <= DEFAULT_AUTO_FORWARD
    assert t.map is not None
    assert "sample_rate" in ds_tags[0].map
    assert ds_tags[0].map["sample_rate"] == 1000.0


class TestStreamToDataSetGolden:
    """≈ qa suite "StreamToDataSet test" (qa_StreamToDataSet.cpp:374-512)."""

    @pytest.mark.parametrize("n_max", [100000, 0])
    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_excluding(self, n_max, block_len):
        datasets, ds_tags = _run_dataset(EXCLUDING, 0, 0, n_max, block_len)
        values = [[5, 6, 7, 8, 9],
                  [15, 16, 17, 18, 19, 20, 21, 22, 23, 24],
                  [20, 21, 22, 23, 24, 25, 26, 27, 28, 29]]
        _reset_time()
        tags = [
            [gen_no(0), gen_start(0), gen_single(3)],
            [gen_start(0), gen_start(5)],
            [gen_start(0), gen_stop(5), gen_single(7)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_excluding_pre_post(self, block_len):
        datasets, ds_tags = _run_dataset(EXCLUDING, 7, 7, 100000, block_len)
        values = [list(range(0, 17)), list(range(8, 32)), list(range(13, 37))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10),
             gen_single(12), gen_start(15)],
            [gen_single(0), gen_stop(2), gen_single(4), gen_start(7),
             gen_start(12), gen_stop(17), gen_single(19), gen_stop(22)],
            [gen_start(2), gen_start(7), gen_stop(12), gen_single(14),
             gen_stop(17), gen_single(19)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("n_max", [100000, 0])
    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_including(self, n_max, block_len):
        datasets, ds_tags = _run_dataset(INCLUDING, 0, 0, n_max, block_len)
        values = [[5, 6, 7, 8, 9, 10, 11],
                  list(range(15, 27)),
                  list(range(20, 32))]
        _reset_time()
        tags = [
            [gen_no(0), gen_start(0), gen_single(3), gen_stop(5)],
            [gen_start(0), gen_start(5), gen_stop(10)],
            [gen_start(0), gen_stop(5), gen_single(7), gen_stop(10)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_start_stop_including_pre_post(self, block_len):
        datasets, ds_tags = _run_dataset(INCLUDING, 7, 7, 100000, block_len)
        values = [list(range(0, 19)), list(range(8, 34)), list(range(13, 39))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10),
             gen_single(12), gen_start(15)],
            [gen_single(0), gen_stop(2), gen_single(4), gen_start(7),
             gen_start(12), gen_stop(17), gen_single(19), gen_stop(22),
             gen_single(24)],
            [gen_start(2), gen_start(7), gen_stop(12), gen_single(14),
             gen_stop(17), gen_single(19)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_single_trigger_pre_post(self, block_len):
        datasets, ds_tags = _run_dataset(SINGLE, 7, 7, 100000, block_len)
        values = [list(range(0, 11)), list(range(1, 15)), list(range(5, 19)),
                  list(range(20, 34)), list(range(25, 39))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10)],
            [gen_no(1), gen_single(3), gen_no(4), gen_start(4), gen_single(7),
             gen_stop(9), gen_single(11)],
            [gen_no(0), gen_start(0), gen_single(3), gen_stop(5),
             gen_single(7), gen_start(10)],
            [gen_start(0), gen_stop(5), gen_single(7), gen_stop(10),
             gen_single(12)],
            [gen_stop(0), gen_single(2), gen_stop(5), gen_single(7)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_excluding_n_max(self, block_len):
        datasets, ds_tags = _run_dataset(EXCLUDING, 0, 0, 6, block_len)
        values = [[5, 6, 7, 8, 9],
                  [15, 16, 17, 18, 19, 20],
                  [20, 21, 22, 23, 24, 25]]
        _reset_time()
        tags = [
            [gen_no(0), gen_start(0), gen_single(3)],
            [gen_start(0), gen_start(5)],
            [gen_start(0), gen_stop(5)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_excluding_pre_post_n_max(self, block_len):
        datasets, ds_tags = _run_dataset(EXCLUDING, 7, 7, 14, block_len)
        values = [list(range(0, 14)), list(range(8, 22)), list(range(13, 27))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10),
             gen_single(12)],
            [gen_single(0), gen_stop(2), gen_single(4), gen_start(7),
             gen_start(12)],
            [gen_start(2), gen_start(7), gen_stop(12)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_including_n_max(self, block_len):
        datasets, ds_tags = _run_dataset(INCLUDING, 0, 0, 6, block_len)
        values = [[5, 6, 7, 8, 9, 10],
                  [15, 16, 17, 18, 19, 20],
                  [20, 21, 22, 23, 24, 25]]
        _reset_time()
        tags = [
            [gen_no(0), gen_start(0), gen_single(3), gen_stop(5)],
            [gen_start(0), gen_start(5)],
            [gen_start(0), gen_stop(5)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_including_pre_post_n_max(self, block_len):
        datasets, ds_tags = _run_dataset(INCLUDING, 7, 7, 14, block_len)
        values = [list(range(0, 14)), list(range(8, 22)), list(range(13, 27))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10),
             gen_single(12)],
            [gen_single(0), gen_stop(2), gen_single(4), gen_start(7),
             gen_start(12)],
            [gen_start(2), gen_start(7), gen_stop(12)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)

    @pytest.mark.parametrize("block_len", [50, 16])
    def test_single_trigger_pre_post_n_max(self, block_len):
        datasets, ds_tags = _run_dataset(SINGLE, 7, 7, 14, block_len)
        values = [list(range(0, 11)), list(range(1, 15)), list(range(5, 19)),
                  list(range(20, 34)), list(range(25, 39))]
        _reset_time()
        tags = [
            [Tag(0, {"sample_rate": 1000.0}), gen_no(2), gen_single(4),
             gen_no(5), gen_start(5), gen_single(8), gen_stop(10)],
            [gen_no(1), gen_single(3), gen_no(4), gen_start(4), gen_single(7),
             gen_stop(9), gen_single(11)],
            [gen_no(0), gen_start(0), gen_single(3), gen_stop(5),
             gen_single(7), gen_start(10)],
            [gen_start(0), gen_stop(5), gen_single(7), gen_stop(10),
             gen_single(12)],
            [gen_stop(0), gen_single(2), gen_stop(5), gen_single(7)],
        ]
        _check_datasets(datasets, ds_tags, values, tags)


class TestMatcherAndSettings:
    def test_ill_formed_n_pre_post_max(self):
        # ≈ StreamToDataSet.hpp:158-165 settingsChanged validation
        from gnuradio4_tpu.core.errors import GrError
        with pytest.raises(GrError, match="n_pre"):
            StreamToDataSet(filter=SINGLE, n_pre=8, n_post=8, n_max=10)

    def test_unmatched_bracket_raises(self):
        from gnuradio4_tpu.core.errors import GrError
        from gnuradio4_tpu.core.trigger import BasicTriggerNameCtxMatcher
        with pytest.raises(GrError, match="bracket"):
            BasicTriggerNameCtxMatcher("[CMD_A, CMD_B")

    def test_lone_stop_becomes_start(self):
        # TriggerMatcher.hpp:220-232: "[, B]" degenerates to single trigger B
        from gnuradio4_tpu.core.trigger import (BasicTriggerNameCtxMatcher,
                                                MatchResult)
        m = BasicTriggerNameCtxMatcher("[, CMD_B]")
        assert m.is_single and m.start_name == "CMD_B"
        st = m.new_state()
        assert m(Tag(0, {"trigger_name": "CMD_B"}), st) is MatchResult.MATCHED

    def test_identical_start_stop_degenerates_to_single(self):
        # TriggerMatcher.hpp:240-245
        from gnuradio4_tpu.core.trigger import BasicTriggerNameCtxMatcher
        m = BasicTriggerNameCtxMatcher("[CMD_A/X, CMD_A/X]")
        assert m.is_single and not m.stop_defined
