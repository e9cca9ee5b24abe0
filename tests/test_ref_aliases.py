"""Reference-name registry aliases, PythonBlock, ToRealImag.

The reference's GR_REGISTER_BLOCK names (SoapySource, ThreePhasePowerMetrics,
FrequencyEstimatorTimeDomain, …) must instantiate here so reference-saved GRC
flowgraphs load (yaml_io strips 'gr::ns::Name<T>' → 'Name')."""

import numpy as np
import pytest

import gnuradio4_tpu as gr

# The FULL set of GR_REGISTER_BLOCK base names extracted from the reference
# (grep 'GR_REGISTER_BLOCK(' over /root/reference, namespaces stripped,
# codegen test fixtures excluded: MyBlockName/blockN/Block0/BlockN/
# CustomBlockNameN/OptionalQuotedName/good::*/ArraySinkImpl/VectorSinkImpl).
# Every name here must instantiate so any reference-saved GRC loads.
REF_NAMES = (
    # basic — ClockSource.hpp / SignalGenerator.hpp / FunctionGenerator.hpp /
    # Selector.hpp / SyncBlock.hpp / StreamToDataSet.hpp / DataSink.hpp /
    # Trigger.hpp / PythonBlock.hpp / CommonBlocks.hpp
    "ClockSource SignalGenerator FunctionGenerator Selector SyncBlock "
    "StreamFilter StreamToDataSet DataSink DataSetSink PythonBlock "
    "SchmittTrigger SchmittTriggerBasic SchmittTriggerNoInterpolation "
    "SchmittTriggerPolynomial builtin_multiply builtin_counter "
    # math — Math.hpp / Rotator.hpp / ExpressionBlocks.hpp
    "Add AddConst Subtract SubtractConst Multiply MultiplyConst Divide "
    "DivideConst Rotator ExpressionSISO ExpressionDISO ExpressionBulk "
    # converters — ConverterBlocks.hpp
    "Abs Arg Convert ScalingConvert Real Imag ComplexToInterleaved "
    "InterleavedToComplex ToRealImag DegreeToRadians RadiansToDegree "
    # filter — time_domain_filter.hpp / FrequencyEstimator.hpp /
    # SavitzkyGolayFilter.hpp / SvdDenoiser.hpp
    "fir_filter iir_filter BasicFilter BasicFilterProto Decimator "
    "FrequencyEstimatorTimeDomain FrequencyEstimatorTimeDomainDecimating "
    "FrequencyEstimatorFrequencyDomain "
    "FrequencyEstimatorFrequencyDomainDecimating IQDemodulator "
    "SavitzkyGolayFilter SavitzkyGolayDataSetFilter SvdDenoiser "
    # fourier / electrical
    "FFT SinglePhasePowerMetrics ThreePhasePowerMetrics "
    "SinglePhasePowerFactorCalculator ThreePhasePowerFactorCalculator "
    "TwoPhaseSystemUnbalanceCalculator ThreePhaseSystemUnbalanceCalculator "
    # fileio / audio / sdr / timing / http
    "BasicFileSource BasicFileSink WavSink WavSource AudioSource AudioSink "
    "SoapySource SoapySink SoapyDualSource SoapyDualSink SoapyQuadSink "
    "SoapyQuadSource RTL2832Source GpsSource PpsSource HttpSource HttpSink "
    # testing — NullSources.hpp / TagMonitors.hpp / Delay.hpp /
    # ImChartMonitor.hpp / PerformanceMonitor.hpp / CollectionTestBlocks.hpp
    "NullSource NullSink ConstantSource CountingSource CountingSink Copy "
    "HeadBlock SlowSource SimCompute TagSource TagSink TagMonitor Delay "
    "ImChartMonitor ConsoleDebugSink PerformanceMonitor "
    "SettingsChangeRecorder VectorSource VectorSink ArraySource ArraySink"
).split()


def test_all_reference_names_registered():
    missing = [n for n in REF_NAMES if not gr.global_registry.contains(n)]
    assert not missing, missing


def test_alias_presets_and_overrides():
    b = gr.global_registry.create("SoapyDualSource")
    assert type(b).__name__ == "SdrSource"
    assert b.settings.get("driver") == "soapy"
    assert b.settings.get("channels") == 2
    b = gr.global_registry.create("RTL2832Source", driver="loopback")
    assert b.settings.get("driver") == "loopback"   # presets are defaults
    b = gr.global_registry.create("FrequencyEstimatorTimeDomain", chunk=256)
    assert b.settings.get("method") == "zero_crossing"
    assert b.settings.get("chunk") == 256


def test_reference_grc_ids_load():
    """A reference-dialect flowgraph using namespaced/templated ids loads."""
    yaml = """
blocks:
  - name: src
    id: gr::testing::ConstantSource<float32>
    parameters:
      value: 2.0
      n_samples: 512
  - name: conv
    id: gr::blocks::type::converter::DegreeToRadians<float32>
  - name: sink
    id: gr::testing::VectorSink<float32>
connections:
  - [src, 0, conv, 0]
  - [conv, 0, sink, 0]
"""
    g = gr.load_grc(yaml)
    gr.Scheduler(g, block_len=256).run_and_wait()
    snk = next(b for b in g.blocks if type(b).__name__ == "VectorSink")
    np.testing.assert_allclose(snk.data(),
                               np.full(512, np.deg2rad(2.0), np.float32),
                               rtol=1e-6)


class TestPythonBlock:
    def test_single_arg_jax_mode(self):
        g = gr.Graph()
        src = g.emplace("VectorSource", data=np.arange(1024, dtype=np.float32))
        pb = g.emplace("PythonBlock",
                       code="def process(x):\n    return jnp.sqrt(x) * 2.0")
        snk = g.emplace("VectorSink")
        g.connect_chain(src, pb, snk)
        gr.Scheduler(g, block_len=256).run_and_wait()
        np.testing.assert_allclose(
            snk.data(), 2 * np.sqrt(np.arange(1024, dtype=np.float32)),
            rtol=1e-6)

    def test_two_arg_dict_form(self):
        g = gr.Graph()
        src = g.emplace("VectorSource", data=np.ones(512, np.float32))
        pb = g.emplace("PythonBlock", code=(
            "def process(ins, ctx):\n"
            "    return {'out': ins['in'] * 3.0}"))
        snk = g.emplace("VectorSink")
        g.connect_chain(src, pb, snk)
        gr.Scheduler(g, block_len=256).run_and_wait()
        np.testing.assert_allclose(snk.data(), np.full(512, 3.0), rtol=1e-6)

    def test_host_mode(self):
        g = gr.Graph()
        src = g.emplace("VectorSource", data=np.arange(256, dtype=np.float32))
        pb = g.emplace("PythonBlock", mode="host",
                       code="def process(x):\n    return np.cumsum(x) * 0 + x")
        snk = g.emplace("VectorSink")
        g.connect_chain(src, pb, snk)
        gr.Scheduler(g, block_len=256).run_and_wait()
        np.testing.assert_allclose(snk.data(),
                                   np.arange(256, dtype=np.float32))

    def test_bad_code_raises(self):
        with pytest.raises(gr.GrError):
            gr.global_registry.create("PythonBlock", code="x = 1")


def test_to_real_imag():
    x = (np.arange(512) + 1j * np.arange(512)[::-1]).astype(np.complex64)
    g = gr.Graph()
    src = g.emplace("VectorSource", data=x)
    tri = g.emplace("ToRealImag")
    s1 = g.emplace("VectorSink")
    s2 = g.emplace("VectorSink")
    g.connect(src, tri)
    g.connect(tri, s1, src_port="real")
    g.connect(tri, s2, src_port="imag")
    gr.Scheduler(g, block_len=256).run_and_wait()
    np.testing.assert_array_equal(s1.data(), x.real)
    np.testing.assert_array_equal(s2.data(), x.imag)
