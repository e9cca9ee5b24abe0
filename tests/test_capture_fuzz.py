"""Property-style fuzz for the round-3 host engines: the reference-exact
behavior must be invariant to how the stream is chunked, and the SyncEngine
must conserve samples. Seeded RNG — failures reproduce."""

import numpy as np
import pytest

from gnuradio4_tpu.core.stream_capture import CaptureEngine
from gnuradio4_tpu.core.sync_engine import SyncEngine
from gnuradio4_tpu.core.tags import Keys, Tag

P1 = "CTX.A"
P2 = "CTX.B"


def _random_tags(rng, n, n_tags):
    names = ["START", "STOP", "OTHER"]
    ctxs = [P1, P2, ""]
    idxs = sorted(rng.choice(n, size=n_tags, replace=False).tolist())
    return [Tag(int(i), {Keys.TRIGGER_NAME: str(rng.choice(names)),
                         Keys.TRIGGER_TIME: int(k),
                         Keys.CONTEXT: str(rng.choice(ctxs))})
            for k, i in enumerate(idxs)]


def _feed_chunked(engine, data, tags, chunk):
    n = data.shape[-1]
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        engine.feed(data[lo:hi],
                    [t.shifted(-lo) for t in tags if lo <= t.index < hi])


FILTERS = [
    f"[START/{P1}, STOP/{P2}]",
    f"[START/{P1}, STOP/^{P2}]",
    "START",
    f"[START/^{P1}, STOP/{P2}]",
]


class TestCaptureChunkingInvariance:
    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.parametrize("filt", FILTERS)
    def test_stream_mode(self, seed, filt):
        rng = np.random.default_rng(seed)
        n = 400
        data = np.arange(n, dtype=np.float32)
        tags = _random_tags(rng, n, 24)
        pre, post = int(rng.integers(0, 5)), int(rng.integers(0, 5))
        ref = CaptureEngine(filt, n_pre=pre, n_post=post, stream_out=True)
        _feed_chunked(ref, data, tags, n)
        for chunk in (1, 7, 64):
            eng = CaptureEngine(filt, n_pre=pre, n_post=post, stream_out=True)
            _feed_chunked(eng, data, tags, chunk)
            np.testing.assert_array_equal(eng.data(), ref.data(),
                                          err_msg=f"chunk={chunk}")
            assert [(t.index, t.map) for t in eng.out_tags] == \
                [(t.index, t.map) for t in ref.out_tags], chunk

    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.parametrize("filt", FILTERS)
    def test_dataset_mode(self, seed, filt):
        rng = np.random.default_rng(100 + seed)
        n = 400
        data = np.arange(n, dtype=np.float32)
        tags = _random_tags(rng, n, 24)
        pre, post = int(rng.integers(0, 5)), int(rng.integers(0, 5))
        n_max = int(rng.choice([0, 16]))
        if n_max and pre + post > n_max:
            n_max = 0
        ref = CaptureEngine(filt, n_pre=pre, n_post=post, n_max=n_max)
        _feed_chunked(ref, data, tags, n)
        for chunk in (1, 7, 64):
            eng = CaptureEngine(filt, n_pre=pre, n_post=post, n_max=n_max)
            _feed_chunked(eng, data, tags, chunk)
            assert len(eng.datasets) == len(ref.datasets), chunk
            for a, b in zip(eng.datasets, ref.datasets):
                np.testing.assert_array_equal(a.values, b.values)
                assert [(t.index, t.map) for t in a.timing_events[0]] == \
                    [(t.index, t.map) for t in b.timing_events[0]]


class TestSyncEngineInvariants:
    @pytest.mark.parametrize("seed", range(8))
    def test_conservation_and_alignment(self, seed):
        rng = np.random.default_rng(200 + seed)
        n_ports = int(rng.integers(2, 4))
        n = 2000
        # each port gets a random subset of common trigger times at jittered
        # positions (sorted, strictly increasing per port)
        times = [100, 200, 300, 400]
        eng = SyncEngine(n_ports, tolerance=3, max_history_size=400)
        port_tags = []
        for p in range(n_ports):
            tags = []
            pos = 0
            for t in times:
                if rng.random() < 0.8:
                    pos += int(rng.integers(50, 400))
                    if pos >= n:
                        break
                    tags.append(Tag(pos, {Keys.TRIGGER_NAME: "T",
                                          Keys.TRIGGER_TIME: t
                                          + int(rng.integers(-1, 2))}))
            port_tags.append(tags)
        chunk = int(rng.choice([50, 171, 500]))
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            for p in range(n_ports):
                eng.feed(p, np.arange(lo, hi, dtype=np.int32),
                         [t.shifted(-lo) for t in port_tags[p]
                          if lo <= t.index < hi], pump=False)
            eng.pump()
        # conservation per port: published + dropped (tagged + still-pending,
        # like the reference's _nDroppedSamples awaiting the next publish)
        # + buffered == fed
        for p in range(n_ports):
            dropped = sum(t.map[Keys.N_DROPPED_SAMPLES]
                          for t in eng.out_tags[p]
                          if Keys.N_DROPPED_SAMPLES in t.map)
            dropped += eng._dropped[p]
            assert eng.out_n[p] + dropped + eng._buf_n[p] == n, p
        # all ports publish the same number of samples
        assert len(set(eng.out_n)) == 1
        # sync tags align across ports at identical output indices per time
        maps = []
        for p in range(n_ports):
            maps.append({int(t.map[Keys.TRIGGER_TIME]) // 10: t.index
                         for t in eng.out_tags[p]
                         if Keys.TRIGGER_TIME in t.map})
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        for key in common:
            assert len({m[key] for m in maps}) == 1, key
