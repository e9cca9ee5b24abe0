"""Golden mirror of the reference's qa_SyncBlock.cpp
(blocks/basic/test/qa_SyncBlock.cpp:104-208): trigger-time alignment across
N streams within tolerance, n_dropped_samples accounting, missing-tag
resynchronization, and max_history back-pressure drops. Tests 1-2 pin exact
values AND tag lists; the 300k-sample dynamics tests pin the reference's
conservation/alignment invariants (the exact drop-tag indices depend on
buffer/work-call granularity — the reference itself compares those with an
index tolerance, qa_SyncBlock.cpp:21,176)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.acquisition import SyncSink
from gnuradio4_tpu.blocks.testing import VectorSource
from gnuradio4_tpu.core.sync_engine import SyncEngine
from gnuradio4_tpu.core.tags import Keys, Tag


def sync_tag(index, time, name="TriggerName"):
    # ≈ qa_SyncBlock.cpp:92 genSyncTag
    return Tag(index, {Keys.TRIGGER_NAME: name, Keys.TRIGGER_TIME: time})


def drop_tag(index, n):
    # ≈ qa_SyncBlock.cpp:96 genDropTag
    return Tag(index, {Keys.N_DROPPED_SAMPLES: n})


def run_engine(in_values, in_tags, *, tolerance=2, max_history=32000,
               chunk=None):
    eng = SyncEngine(len(in_values), tolerance=tolerance,
                     max_history_size=max_history)
    n_max = max(len(v) for v in in_values)
    chunk = chunk or n_max
    for lo in range(0, n_max, chunk):
        for p, vals in enumerate(in_values):
            hi = min(lo + chunk, len(vals))
            if hi <= lo:
                continue
            eng.feed(p, np.asarray(vals[lo:hi], np.int32),
                     [t.shifted(-lo) for t in in_tags[p]
                      if lo <= t.index < hi], pump=False)
        eng.pump()
    return eng


def assert_tags(actual, expected):
    assert len(actual) == len(expected), \
        [(t.index, dict(t.map)) for t in actual]
    for a, e in zip(actual, expected):
        assert a.index == e.index and a.map == e.map, (a, e)


class TestSyncBlockBasic:
    """≈ "SyncBlock basic test" (cpp:110-133)."""

    IN_VALUES = [
        [1, 0, 1, 2, 3, 0, 1, 2, 3, 4, 0, 1],
        [1, 2, 0, 1, 2, 3, 4, 0, 1, 2, 3, 0, 1, 2],
        [1, 2, 3, 0, 1, 2, 3, 4, 5, 0, 1, 2, 0, 1, 2, 3],
    ]

    def in_tags(self):
        return [
            [sync_tag(1, 99), sync_tag(5, 201), sync_tag(10, 301)],
            [sync_tag(2, 100), sync_tag(7, 199), sync_tag(11, 299)],
            [sync_tag(3, 101), sync_tag(9, 200), sync_tag(12, 300)],
        ]

    EXPECTED = [
        [1, 0, 1, 2, 3, 0, 1, 2, 0, 1],
        [2, 0, 1, 2, 3, 0, 1, 2, 0, 1],
        [3, 0, 1, 2, 3, 0, 1, 2, 0, 1],
    ]

    def expected_tags(self):
        return [
            [sync_tag(1, 99), sync_tag(5, 201), drop_tag(8, 2),
             sync_tag(8, 301)],
            [drop_tag(0, 1), sync_tag(1, 100), drop_tag(5, 1),
             sync_tag(5, 199), drop_tag(8, 1), sync_tag(8, 299)],
            [drop_tag(0, 2), sync_tag(1, 101), drop_tag(5, 2),
             sync_tag(5, 200), sync_tag(8, 300)],
        ]

    @pytest.mark.parametrize("chunk", [None, 4, 1])
    def test_engine_exact(self, chunk):
        eng = run_engine(self.IN_VALUES, self.in_tags(), chunk=chunk)
        for p in range(3):
            assert eng.data(p).tolist() == self.EXPECTED[p], (p, eng.data(p))
            assert_tags(eng.out_tags[p], self.expected_tags()[p])

    @pytest.mark.parametrize("block_len", [16, 8])
    def test_through_scheduler(self, block_len):
        g = gr.Graph()
        snk = SyncSink(n_ports=3, tolerance=2)
        for p in range(3):
            src = VectorSource(np.asarray(self.IN_VALUES[p], np.int32),
                               tags=self.in_tags()[p])
            g.connect(src, snk, dst_port=f"in{p}")
        gr.Scheduler(g, block_len=block_len).run_and_wait()
        for p in range(3):
            assert snk.data(p).tolist() == self.EXPECTED[p]
            assert_tags([t for t in snk.out_tags(p)
                         if Keys.END_OF_STREAM not in t.map],
                        self.expected_tags()[p])


class TestSyncBlockMissingTag:
    """≈ "SyncBlock missing tag test" (cpp:135-158): ports missing a common
    sync time resynchronize at the next time present on all ports."""

    def test_engine_exact(self):
        vals = [list(range(12))] * 3
        tags = [
            [sync_tag(1, 100), sync_tag(5, 200), sync_tag(10, 300)],
            [sync_tag(2, 100), sync_tag(10, 300)],
            [sync_tag(4, 200), sync_tag(10, 300)],
        ]
        eng = run_engine(vals, tags)
        expected_vals = [5, 6, 7, 8, 9, 10, 11]
        expected_tags = [
            [drop_tag(0, 5), sync_tag(0, 200), sync_tag(5, 300)],
            [drop_tag(0, 5), sync_tag(5, 300)],
            [drop_tag(0, 5), sync_tag(5, 300)],
        ]
        for p in range(3):
            assert eng.data(p).tolist() == expected_vals, (p, eng.data(p))
            assert_tags(eng.out_tags[p], expected_tags[p])


def _counting(n):
    return np.arange(n, dtype=np.int32)


class TestSyncBlockDynamics:
    """≈ "SyncBlock isSync/back pressure" tests (cpp:160-207): invariant-level
    mirrors of the 300k-sample runs — published counts, total dropped-sample
    conservation, and cross-port sync-tag alignment."""

    def _run(self, in_tags, n=300_000, chunk=10_000):
        eng = SyncEngine(len(in_tags), tolerance=2, max_history_size=32_000)
        for lo in range(0, n, chunk):
            for p, tags in enumerate(in_tags):
                eng.feed(p, _counting(chunk),
                         [t.shifted(-lo) for t in tags
                          if lo <= t.index < lo + chunk], pump=False)
            eng.pump()
        return eng

    def _check_conservation(self, eng, n=300_000):
        for p in range(eng.n):
            dropped = sum(t.map[Keys.N_DROPPED_SAMPLES]
                          for t in eng.out_tags[p]
                          if Keys.N_DROPPED_SAMPLES in t.map)
            # published + dropped + still-buffered = fed
            assert eng.out_n[p] + dropped + eng._buf_n[p] == n, p

    def _sync_indices(self, eng, p):
        return {int(t.map[Keys.TRIGGER_TIME]): t.index
                for t in eng.out_tags[p] if Keys.TRIGGER_TIME in t.map}

    def test_is_sync(self):
        # cpp:160-177: all three times recoverable, 299 000 samples out
        eng = self._run([
            [sync_tag(10, 100), sync_tag(100_100, 200), sync_tag(201_000, 300)],
            [sync_tag(1, 100), sync_tag(100_000, 200), sync_tag(200_000, 300)],
        ])
        assert eng.out_n[0] == eng.out_n[1] == 299_000
        s0, s1 = self._sync_indices(eng, 0), self._sync_indices(eng, 1)
        assert set(s0) == set(s1) == {100, 200, 300}
        for t in (100, 200, 300):
            assert s0[t] == s1[t]          # aligned across ports
        assert s0[100] == 1
        self._check_conservation(eng)

    def test_back_pressure(self):
        # cpp:179-195: port-0's t200 tag has no partner in reach → desync,
        # history-bounded drops, resync at t300; 133 000 samples out
        eng = self._run([
            [sync_tag(1, 100), sync_tag(1_000, 200), sync_tag(200_000, 300)],
            [sync_tag(1, 100), sync_tag(100_000, 200), sync_tag(200_000, 300)],
        ])
        assert eng.out_n[0] == eng.out_n[1] == 133_000
        for p in range(2):
            dropped = sum(t.map[Keys.N_DROPPED_SAMPLES]
                          for t in eng.out_tags[p]
                          if Keys.N_DROPPED_SAMPLES in t.map)
            assert dropped == 167_000, (p, dropped)
        s0, s1 = self._sync_indices(eng, 0), self._sync_indices(eng, 1)
        assert s0[100] == s1[100] == 1
        assert s0[300] == s1[300] == 33_000
        assert 200 not in s0 and 200 not in s1   # the unmatched tag is dropped
        self._check_conservation(eng)

    def test_back_pressure_2(self):
        # cpp:197-207: late first sync at ~100k/101k, 231 000 samples out
        eng = self._run([
            [sync_tag(100_000, 100)],
            [sync_tag(101_000, 100)],
        ])
        assert eng.out_n[0] == eng.out_n[1] == 231_000
        d0 = sum(t.map[Keys.N_DROPPED_SAMPLES] for t in eng.out_tags[0]
                 if Keys.N_DROPPED_SAMPLES in t.map)
        d1 = sum(t.map[Keys.N_DROPPED_SAMPLES] for t in eng.out_tags[1]
                 if Keys.N_DROPPED_SAMPLES in t.map)
        assert d0 == 68_000 and d1 == 69_000
        s0, s1 = self._sync_indices(eng, 0), self._sync_indices(eng, 1)
        assert s0[100] == s1[100] == 32_000
        self._check_conservation(eng)
