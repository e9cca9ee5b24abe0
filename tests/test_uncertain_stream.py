"""UncertainValue as a stream sample type (blocks/uncertain.py + uncertain=True
modes — ≈ reference UncertainValue<T> registrations, Math.hpp:25-28,68-71 and
time_domain_filter.hpp; meta/test/qa_UncertainValue.cpp is the algebra's own
golden suite, mirrored in test_pmt_utils_merge.py)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import gnuradio4_tpu as gr


def _run(g, n=4096, block_len=1024, **kw):
    gr.Scheduler(g, block_len=block_len, sample_rate=48000.0, **kw).run_and_wait()


def _uncertain_graph(v, s):
    """VectorSource pair → ToUncertain; returns (graph, ToUncertain block)."""
    g = gr.Graph()
    sv = g.emplace("VectorSource", data=v.astype(np.float32))
    ss = g.emplace("VectorSource", data=s.astype(np.float32))
    tu = g.emplace("ToUncertain")
    g.connect(sv, tu, dst_port="in")
    g.connect(ss, tu, dst_port="sigma")
    return g, tu


class TestConverters:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal(4096)
        s = np.abs(rng.standard_normal(4096))
        g, tu = _uncertain_graph(v, s)
        fu = g.emplace("FromUncertain")
        kv = g.emplace("VectorSink")
        ks = g.emplace("VectorSink")
        g.connect(tu, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g)
        np.testing.assert_allclose(kv.data()[:4096], v, atol=1e-6)
        np.testing.assert_allclose(ks.data()[:4096], s, atol=1e-6)

    def test_sigma_const(self):
        g = gr.Graph()
        src = g.emplace("VectorSource", data=np.ones(2048, np.float32))
        tu = g.emplace("ToUncertain", sigma_const=0.25)
        fu = g.emplace("FromUncertain")
        ks = g.emplace("VectorSink")
        g.connect(src, tu, dst_port="in")
        g.connect(tu, fu)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=512)
        np.testing.assert_allclose(ks.data()[:2048], 0.25)

    def test_channelled_input_rejected(self):
        g = gr.Graph()
        src = g.emplace("VectorSource", data=np.ones((3, 512), np.float32))
        tu = g.emplace("ToUncertain")
        g.connect(src, tu, dst_port="in")
        with pytest.raises(Exception, match="scalar"):
            _run(g, block_len=512)


class TestUncertainMath:
    def _binary(self, block, v1, s1, v2, s2):
        g = gr.Graph()
        a = g.emplace("VectorSource", data=v1.astype(np.float32))
        b = g.emplace("VectorSource", data=s1.astype(np.float32))
        c = g.emplace("VectorSource", data=v2.astype(np.float32))
        d = g.emplace("VectorSource", data=s2.astype(np.float32))
        t1, t2 = g.emplace("ToUncertain"), g.emplace("ToUncertain")
        g.connect(a, t1, dst_port="in")
        g.connect(b, t1, dst_port="sigma")
        g.connect(c, t2, dst_port="in")
        g.connect(d, t2, dst_port="sigma")
        op = g.emplace(block, uncertain=True)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(t1, op, dst_port="in0")
        g.connect(t2, op, dst_port="in1")
        g.connect(op, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1024)
        n = len(v1)
        return kv.data()[:n], ks.data()[:n]

    def test_add_hypot(self):
        rng = np.random.default_rng(1)
        v1, v2 = rng.standard_normal(2048), rng.standard_normal(2048)
        s1, s2 = rng.uniform(0, 1, 2048), rng.uniform(0, 1, 2048)
        val, sig = self._binary("Add", v1, s1, v2, s2)
        np.testing.assert_allclose(val, v1 + v2, atol=1e-5)
        np.testing.assert_allclose(sig, np.hypot(s1, s2), atol=1e-5)

    def test_multiply_product_rule(self):
        rng = np.random.default_rng(2)
        v1, v2 = rng.uniform(1, 2, 2048), rng.uniform(1, 2, 2048)
        s1, s2 = rng.uniform(0, 0.1, 2048), rng.uniform(0, 0.1, 2048)
        val, sig = self._binary("Multiply", v1, s1, v2, s2)
        np.testing.assert_allclose(val, v1 * v2, rtol=1e-5)
        np.testing.assert_allclose(sig, np.hypot(s1 * v2, s2 * v1), rtol=1e-4)

    def test_divide_quotient_rule(self):
        rng = np.random.default_rng(3)
        v1, v2 = rng.uniform(1, 2, 1024), rng.uniform(1, 2, 1024)
        s1, s2 = rng.uniform(0, 0.1, 1024), rng.uniform(0, 0.1, 1024)
        val, sig = self._binary("Divide", v1, s1, v2, s2)
        np.testing.assert_allclose(val, v1 / v2, rtol=1e-5)
        np.testing.assert_allclose(
            sig, np.hypot(s1 / v2, s2 * v1 / v2**2), rtol=1e-4)

    def test_const_with_uncertain_constant(self):
        rng = np.random.default_rng(4)
        v = rng.uniform(1, 2, 2048)
        s = rng.uniform(0, 0.1, 2048)
        g, tu = _uncertain_graph(v, s)
        op = g.emplace("MultiplyConst", uncertain=True,
                       value=3.0, value_sigma=0.5)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(tu, op)
        g.connect(op, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1024)
        np.testing.assert_allclose(kv.data()[:2048], 3.0 * v, rtol=1e-5)
        np.testing.assert_allclose(ks.data()[:2048],
                                   np.hypot(3.0 * s, 0.5 * v), rtol=1e-4)

    def test_plain_mode_unchanged(self):
        """uncertain defaults off: plain 2-channel streams add planewise."""
        x = np.stack([np.ones(512), 2 * np.ones(512)]).astype(np.float32)
        g = gr.Graph()
        a = g.emplace("VectorSource", data=x)
        b = g.emplace("VectorSource", data=x)
        op = g.emplace("Add")
        k = g.emplace("VectorSink")
        g.connect(a, op, dst_port="in0")
        g.connect(b, op, dst_port="in1")
        g.connect(op, k)
        _run(g, block_len=512)
        np.testing.assert_allclose(k.data()[:, :512], 2 * x)


class TestUncertainFilters:
    def test_fir_variance_rule_streaming(self):
        """sigma_out = sqrt(conv(sigma², h²)); exact across chunk seams."""
        rng = np.random.default_rng(5)
        n = 8192
        v = rng.standard_normal(n)
        s = rng.uniform(0.1, 1.0, n)
        h = np.hanning(31)
        h /= h.sum()
        g, tu = _uncertain_graph(v, s)
        fir = g.emplace("FirFilter", taps=tuple(h), uncertain=True)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(tu, fir)
        g.connect(fir, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1000)   # chunks exercise the carried history
        # causal FIR with zero prehistory
        ref_v = np.convolve(v, h)[:n]
        ref_s = np.sqrt(np.convolve(s**2, h**2)[:n])
        np.testing.assert_allclose(kv.data()[:n], ref_v, atol=1e-5)
        np.testing.assert_allclose(ks.data()[:n], ref_s, atol=1e-5)

    def test_fir_sigma_matches_monte_carlo(self):
        """The propagated sigma IS the output std under input noise."""
        rng = np.random.default_rng(6)
        n = 1024
        v = np.sin(2 * np.pi * 0.01 * np.arange(n))
        s = rng.uniform(0.2, 0.8, n)
        h = np.array([0.5, 0.3, 0.2])
        g, tu = _uncertain_graph(v, s)
        fir = g.emplace("FirFilter", taps=tuple(h), uncertain=True)
        fu = g.emplace("FromUncertain")
        ks = g.emplace("VectorSink")
        g.connect(tu, fir)
        g.connect(fir, fu)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=n)
        predicted = ks.data()[:n]
        draws = np.stack([np.convolve(v + rng.standard_normal(n) * s, h)[:n]
                          for _ in range(4000)])
        empirical = draws.std(axis=0)
        # ignore the warm-up taps, compare in aggregate (MC noise ≈ 1%)
        r = predicted[10:] / empirical[10:]
        assert abs(np.median(r) - 1.0) < 0.05

    def test_fir_decimating(self):
        rng = np.random.default_rng(7)
        n = 4096
        v, s = rng.standard_normal(n), rng.uniform(0.1, 1, n)
        h = np.ones(8) / 8
        g, tu = _uncertain_graph(v, s)
        fir = g.emplace("FirFilter", taps=tuple(h), decim=4, uncertain=True)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(tu, fir)
        g.connect(fir, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1024)
        ref_v = np.convolve(v, h)[:n:4]
        ref_s = np.sqrt(np.convolve(s**2, h**2)[:n:4])
        np.testing.assert_allclose(kv.data()[:n // 4], ref_v, atol=1e-5)
        np.testing.assert_allclose(ks.data()[:n // 4], ref_s, atol=1e-5)

    def test_iir_variance_recursion(self):
        """One-pole smoother: per-op uncorrelated recursion
        sy2[n] = b0²·sx2[n] + a1²·sy2[n−1]."""
        rng = np.random.default_rng(8)
        n = 4096
        v, s = rng.standard_normal(n), rng.uniform(0.1, 1, n)
        b, a = (0.2,), (1.0, -0.8)
        g, tu = _uncertain_graph(v, s)
        iir = g.emplace("IirFilter", b=b, a=a, uncertain=True)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(tu, iir)
        g.connect(iir, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1000)
        ref_v = np.zeros(n)
        ref_s2 = np.zeros(n)
        for i in range(n):
            ref_v[i] = 0.2 * v[i] + 0.8 * (ref_v[i - 1] if i else 0.0)
            ref_s2[i] = 0.04 * s[i]**2 + 0.64 * (ref_s2[i - 1] if i else 0.0)
        np.testing.assert_allclose(kv.data()[:n], ref_v, atol=1e-4)
        np.testing.assert_allclose(ks.data()[:n], np.sqrt(ref_s2), atol=1e-4)

    def test_decimator_is_plane_agnostic(self):
        """Decimator needs no opt-in: both planes decimate identically."""
        rng = np.random.default_rng(9)
        v, s = rng.standard_normal(4096), rng.uniform(0, 1, 4096)
        g, tu = _uncertain_graph(v, s)
        dec = g.emplace("Decimator", decim=8)
        fu = g.emplace("FromUncertain")
        kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
        g.connect(tu, dec)
        g.connect(dec, fu)
        g.connect(fu["value"], kv)
        g.connect(fu["sigma"], ks)
        _run(g, block_len=1024)
        np.testing.assert_allclose(kv.data()[:512], v[::8], atol=1e-6)
        np.testing.assert_allclose(ks.data()[:512], s[::8], atol=1e-6)


class TestUncertainGrc:
    def test_reference_templated_id_activates_uncertain(self, tmp_path):
        """A reference GRC with Add<gr::UncertainValue<float>> loads into
        uncertain mode (the type parameter IS the sample type)."""
        yml = """
blocks:
  - id: gr::blocks::math::Add<gr::UncertainValue<float>>
    parameters: {name: adder}
"""
        g = gr.load_grc(yml)
        blk = next(b for b in g.blocks if b.name == "adder")
        assert blk.settings.get("uncertain") is True

    def test_plain_templated_id_stays_plain(self):
        yml = """
blocks:
  - id: gr::blocks::math::Add<float>
    parameters: {name: adder}
"""
        g = gr.load_grc(yml)
        blk = next(b for b in g.blocks if b.name == "adder")
        assert not blk.settings.get("uncertain")


class TestUncertainSharded:
    def test_fir_chain_sp_sharded_exact(self):
        """The uncertain FIR chain time-shards (2-plane halo exchange) and is
        bit-exact vs unsharded — the sample type rides the runtime's
        parallelism untouched."""
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 devices")
        mesh = Mesh(np.asarray(devs[:8]), ("sp",))
        rng = np.random.default_rng(10)
        n = 16384
        v, s = rng.standard_normal(n), rng.uniform(0.1, 1, n)
        h = np.hanning(63)
        h /= h.sum()

        def build():
            g, tu = _uncertain_graph(v, s)
            fir = g.emplace("FirFilter", taps=tuple(h), uncertain=True)
            fu = g.emplace("FromUncertain")
            kv, ks = g.emplace("VectorSink"), g.emplace("VectorSink")
            g.connect(tu, fir)
            g.connect(fir, fu)
            g.connect(fu["value"], kv)
            g.connect(fu["sigma"], ks)
            return g, kv, ks

        g0, kv0, ks0 = build()
        _run(g0, block_len=4096)
        g1, kv1, ks1 = build()
        _run(g1, block_len=4096, mesh=mesh)
        np.testing.assert_array_equal(kv0.data()[:n], kv1.data()[:n])
        np.testing.assert_array_equal(ks0.data()[:n], ks1.data()[:n])
