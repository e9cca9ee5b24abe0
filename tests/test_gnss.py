"""GPS L1 C/A Gold codes + FFT acquisition (ops/gnss.py — device-side
beyond-reference model family)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.ops import gnss


class TestCaCodes:
    def test_published_octal_check_values(self):
        # IS-GPS-200 table 3-I first-10-chips column
        known = {1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133,
                 19: 0o1633}
        for prn, want in known.items():
            assert gnss.ca_code_first_octal(prn) == want, prn

    def test_gold_code_properties(self):
        # balance: 512 ones / 511 zeros per period
        for prn in (1, 9, 17, 32):
            chips = gnss.ca_code(prn)
            assert np.sum(chips < 0) == 512 and np.sum(chips > 0) == 511
        # autocorrelation: peak 1023, sidelobes in the Gold three-level set
        c = gnss.ca_code(5)
        ac = np.array([np.dot(c, np.roll(c, k)) for k in range(1023)])
        assert ac[0] == 1023
        assert set(np.unique(np.round(ac[1:]))) <= {-65.0, -1.0, 63.0}
        # cross-correlation bounded by the same levels
        c2 = gnss.ca_code(6)
        cc = np.array([np.dot(c, np.roll(c2, k)) for k in range(1023)])
        assert set(np.unique(np.round(cc))) <= {-65.0, -1.0, 63.0}

    def test_all_prns_distinct(self):
        codes = {prn: tuple(gnss.ca_code(prn)) for prn in range(1, 33)}
        assert len(set(codes.values())) == 32


class TestAcquisition:
    FS = 2.046e6

    def test_two_satellites_acquired_exactly(self):
        sig = gnss.synthesize([(7, 1800.0, 300), (22, -3250.0, 1501)],
                              fs=self.FS, n_ms=4, noise_std=2.0,
                              rng=np.random.default_rng(1))
        r7 = gnss.acquire(sig, 7, fs=self.FS)
        r22 = gnss.acquire(sig, 22, fs=self.FS)
        assert r7 is not None and r7["code_phase"] == 300
        assert abs(r7["doppler"] - 1800.0) <= 250.0
        assert r22 is not None and r22["code_phase"] == 1501
        assert abs(r22["doppler"] - (-3250.0)) <= 250.0

    def test_absent_prn_rejected(self):
        sig = gnss.synthesize([(7, 1800.0, 300)], fs=self.FS, n_ms=4,
                              noise_std=2.0, rng=np.random.default_rng(2))
        assert gnss.acquire(sig, 13, fs=self.FS) is None

    def test_weak_signal_with_noncoherent_gain(self):
        # amplitude 0.5 under sigma=2 noise: 1 block fails, 4 blocks acquire
        sig = gnss.synthesize([(3, 900.0, 777)], fs=self.FS, n_ms=8,
                              amplitude=0.5, noise_std=2.0,
                              rng=np.random.default_rng(3))
        strong = gnss.acquire(sig, 3, fs=self.FS, n_coherent=8)
        assert strong is not None and strong["code_phase"] == 777


class TestGnssBlock:
    def test_graph_acquisition_sink(self):
        sig = gnss.synthesize([(11, 2400.0, 42), (29, -1000.0, 1999)],
                              fs=2.046e6, n_ms=6, noise_std=1.5,
                              rng=np.random.default_rng(4))
        g = gr.Graph()
        src = g.emplace("VectorSource", data=sig)
        acq = g.emplace("GnssAcquisition", prns=(11, 29, 31),
                        sample_rate_in=2.046e6, n_coherent=4)
        g.connect(src, acq)
        gr.Scheduler(g, block_len=4092, sample_rate=2.046e6).run_and_wait()
        found = {d["prn"]: d for d in acq.detections}
        assert set(found) == {11, 29}
        assert found[11]["code_phase"] == 42
        assert found[29]["code_phase"] == 1999


class TestTracking:
    FS = 2.046e6
    NAV1 = np.array([1, 0, 1, 1, 0, 0, 1, 0], np.int8)
    NAV2 = np.array([0, 1, 1, 0, 1, 0, 0, 1], np.int8)

    def _bits_match_cycle(self, bits, nav):
        # recovered bits = (1 − nav) up to cycle offset and polarity
        exp = np.tile(nav, 30)
        for off in range(len(nav)):
            for pol in (0, 1):
                if np.array_equal(exp[off:off + len(bits)] ^ pol, 1 - bits):
                    return True
        return False

    def test_single_channel_converges_and_recovers_bits(self):
        sig = gnss.synthesize([(7, 1800.0, 300, self.NAV1)], fs=self.FS,
                              n_ms=170, noise_std=1.0,
                              rng=np.random.default_rng(1))
        acq = gnss.acquire(sig, 7, fs=self.FS)
        tr = gnss.track(sig, 7, fs=self.FS, code_phase=acq["code_phase"],
                        doppler=acq["doppler"])
        # Doppler pulled from the 250 Hz acquisition bin to within 2 Hz
        assert abs(np.mean(tr["doppler"][-10:]) - 1800.0) < 2.0
        assert len(tr["bits"]) >= 5
        assert self._bits_match_cycle(tr["bits"], self.NAV1)

    def test_vmapped_channel_bank(self):
        # two satellites tracked simultaneously by ONE vmapped scan program
        sig = gnss.synthesize(
            [(7, 1800.0, 300, self.NAV1), (22, -3250.0, 1501, self.NAV2)],
            fs=self.FS, n_ms=170, noise_std=1.0,
            rng=np.random.default_rng(1))
        acqs = [gnss.acquire(sig, p, fs=self.FS) for p in (7, 22)]
        chans = gnss.track_channels(sig, acqs, fs=self.FS)
        assert [c["prn"] for c in chans] == [7, 22]
        assert abs(np.mean(chans[0]["doppler"][-10:]) - 1800.0) < 2.0
        assert abs(np.mean(chans[1]["doppler"][-10:]) + 3250.0) < 2.0
        assert self._bits_match_cycle(chans[0]["bits"], self.NAV1)
        assert self._bits_match_cycle(chans[1]["bits"], self.NAV2)

    def test_costas_survives_data_flips(self):
        # a loop with an atan2 discriminator re-rotates after every bit flip;
        # the prompt magnitude must stay at full correlation through flips
        sig = gnss.synthesize([(3, 500.0, 100, self.NAV1)], fs=self.FS,
                              n_ms=120, noise_std=0.0)
        tr = gnss.track(sig, 3, fs=self.FS, code_phase=100, doppler=400.0)
        mags = np.abs(tr["prompts"][40:])
        assert mags.min() > 0.9 * mags.max()


class TestSkySearch:
    def test_acquire_all_sharded_equals_unsharded(self):
        """All-constellation acquisition with the PRN axis sharded over the
        8-device mesh (expert-parallel: each chip searches its slice, no
        collectives in the hot loop) matches the unsharded search."""
        from gnuradio4_tpu.parallel.mesh import make_mesh
        import jax
        fs = 2.046e6
        sig = gnss.synthesize(
            [(7, 1800.0, 300), (22, -3250.0, 1501), (31, 4100.0, 888)],
            fs=fs, n_ms=4, noise_std=2.0, rng=np.random.default_rng(1))
        mesh = make_mesh((len(jax.devices()),), axes=("ep",))
        got = gnss.acquire_all(sig, fs=fs, mesh=mesh)
        plain = gnss.acquire_all(sig, fs=fs)
        assert [(d["prn"], d["code_phase"]) for d in got] == \
            [(7, 300), (22, 1501), (31, 888)]
        assert [(d["prn"], d["code_phase"], d["doppler"]) for d in got] == \
            [(d["prn"], d["code_phase"], d["doppler"]) for d in plain]


class TestShortBuffer:
    def test_sub_millisecond_stream_does_not_crash(self):
        import jax
        g = gr.Graph()
        src = g.emplace("VectorSource",
                        data=np.zeros(1024, np.complex64))  # < 1 ms at 2.046M
        acq = g.emplace("GnssAcquisition", prns=(1,), sample_rate_in=2.046e6)
        g.connect(src, acq)
        gr.Scheduler(g, block_len=512, sample_rate=2.046e6).run_and_wait()
        assert acq.detections == []
