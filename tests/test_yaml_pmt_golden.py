"""Golden mirror of the reference's qa_YamlPmt.cpp
(core/test/qa_YamlPmt.cpp:190-1155): the typed pmt-YAML dialect — !!intN /
!!uintN / !!floatN scalar and vector tags with range validation, !!complex32/
64 "(re, im)" forms with error cases, strict !!bool, the null family,
untagged inference (0x/0o/0b integers, .inf/.nan spellings), nested
maps/vectors, GRC documents, and serialize→parse round-trips."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.errors import GrError
from gnuradio4_tpu.core.yaml_pmt import dump, load


class TestNumbers:
    """≈ "Numbers" (cpp:475-582)."""

    def test_tagged_integers(self):
        d = load("""
hex: !!int64 0xFF
oct: !!int64 0o77
bin: !!int64 0b1010
positive: !!int64 42
negative: !!int64 -42
uint8: !!uint8 255
uint16: !!uint16 65535
uint32: !!uint32 4294967295
int8: !!int8 -128
int16: !!int16 -32768
int32: !!int32 -2147483648
""")
        assert d["hex"] == 255 and d["oct"] == 63 and d["bin"] == 10
        assert d["positive"] == 42 and d["negative"] == -42
        for k, t, v in [("uint8", np.uint8, 255), ("uint16", np.uint16, 65535),
                        ("uint32", np.uint32, 4294967295),
                        ("int8", np.int8, -128), ("int16", np.int16, -32768),
                        ("int32", np.int32, -2147483648)]:
            assert d[k] == v and type(d[k]) is t, k

    def test_untagged_integers(self):
        d = load("a: 42\nb: 0xFF\nc: 0o77\nd: 0b1010")
        assert d == {"a": 42, "b": 255, "c": 63, "d": 10}

    def test_doubles_and_specials(self):
        d = load("""
normal: !!float64 123.456
scientific: !!float64 1.23e-4
infinity: !!float64 .inf
infinity2: !!float64 .Inf
neg_infinity: !!float64 -.INF
not_a_number: !!float64 .nan
not_a_number2: !!float64 .NAN
untagged: 123.456
untagged_inf: .inf
untagged_nan: .NaN
""")
        assert d["normal"] == 123.456 and d["scientific"] == 1.23e-4
        assert d["infinity"] == np.inf and d["infinity2"] == np.inf
        assert d["neg_infinity"] == -np.inf
        assert np.isnan(d["not_a_number"]) and np.isnan(d["not_a_number2"])
        assert d["untagged"] == 123.456
        assert d["untagged_inf"] == np.inf and np.isnan(d["untagged_nan"])

    def test_error_cases(self):
        # cpp:576-581
        with pytest.raises(GrError, match="floating-point"):
            load("value: !!float64 string")
        with pytest.raises(GrError, match="[Ii]nvalid integral"):
            load("value: !!int64 0xGG")
        with pytest.raises(GrError, match="[Ii]nvalid integral"):
            load("value: !!int8 128")       # out of range


class TestComplex:
    """≈ "Complex" (cpp:861-886): component-width naming — !!complex32 is
    complex<float>, !!complex64 complex<double>."""

    def test_forms(self):
        d = load("""
c1: !!complex64 (1.0, -1.0)
c2: !!complex32 (1.0, -1.0)
c3: !!complex64 (1.0,-1.0)
c4: !!complex32 (  1.0  ,   -1.0)
""")
        assert d["c1"] == 1 - 1j and d["c1"].dtype == np.complex128
        assert d["c2"] == 1 - 1j and d["c2"].dtype == np.complex64
        assert d["c3"] == 1 - 1j and d["c4"] == 1 - 1j

    @pytest.mark.parametrize("bad", [
        "c: !!complex64 (1.01.0)",
        "c: !!complex64 Hello",
        "c: !!complex64 (1.0, -1.0, 2.0)",
        "c: !!complex64 (foo, bar)",
        "c: !!complex64 (1.0, bar)",
    ])
    def test_error_cases(self, bad):
        with pytest.raises(GrError):
            load(bad)


class TestBoolsAndNulls:
    def test_bools(self):
        # ≈ cpp:445-473
        d = load("t: !!bool true\nf: !!bool false\nut: true\nuf: False\n"
                 "ut3: TRUE")
        assert d == {"t": True, "f": False, "ut": True, "uf": False,
                     "ut3": True}
        for bad in ("b: !!bool 1", "b: !!bool TrUe", "b: !!bool FaLsE"):
            with pytest.raises(GrError, match="bool"):
                load(bad)

    def test_nulls(self):
        # ≈ cpp:415-443
        d = load("""
null_value: !!null null
null_value2: null
null_value3: !!null ~
null_value4: ~
null_value5: !!null anything
null_value6: Null
null_value7: NULL
null_value8:
not_null: NuLl
""")
        for k in (f"null_value{i}" for i in ["", 2, 3, 4, 5, 6, 7, 8]):
            assert d[k] is None, k
        assert d["not_null"] == "NuLl"


class TestVectors:
    """≈ "Vectors" (cpp:583-735)."""

    def test_typed_vectors(self):
        d = load("""
floatVector: !!float32
  - 1.0
  - 2.0
  - 3.0
doubleVector: !!float64 [1, 2, 3]
boolVector: !!bool
  - true
  - false
  - true
complexVector: !!complex64
  - (1.0, -1.0)
  - (2.0, -2.0)
  - (3.0, -3.0)
stringVector: !!str
  - "Hello"
  - "World"
""")
        assert d["floatVector"].dtype == np.float32
        assert d["floatVector"].tolist() == [1.0, 2.0, 3.0]
        assert d["doubleVector"].dtype == np.float64
        assert d["boolVector"].tolist() == [True, False, True]
        assert d["complexVector"].dtype == np.complex128
        assert d["complexVector"].tolist() == [1 - 1j, 2 - 2j, 3 - 3j]
        assert d["stringVector"] == ["Hello", "World"]

    def test_pmt_vectors_and_nesting(self):
        d = load("""
mixedPmtVector:
  - !!bool true
  - !!float64 42
  - !!str "Hello"
untaggedBools:
  - true
  - false
nullVector: !!null
  - null
  - null
emptyVector: !!str []
emptyPmtVector: []
nestedVector:
  - !!str
    - 1
    - 2
  -
    - 3
    - 4
vectorWithColons:
  - "key: value"
  - "key2: value2"
""")
        assert d["mixedPmtVector"] == [True, 42.0, "Hello"]
        assert d["untaggedBools"] == [True, False]
        assert d["nullVector"] is None
        assert d["emptyVector"] == [] and d["emptyPmtVector"] == []
        assert d["nestedVector"] == [["1", "2"], [3, 4]]
        assert d["vectorWithColons"] == ["key: value", "key2: value2"]

    def test_vector_error_cases(self):
        with pytest.raises(GrError, match="[Ii]nvalid integral"):
            load("key: !!int64 [foo, bar]")
        with pytest.raises(GrError, match="both list and list item"):
            load("key: !!str [foo, !!float64 1.0]")


class TestGrcAndRoundtrip:
    def test_grc_document(self):
        # ≈ cpp:820-859 "GRC"
        d = load("""
blocks:
  - name: ArraySink<double>
    id: gr::testing::ArraySink<double>
    parameters:
      name: ArraySink<double>
connections:
  - [ArraySource<double>, [0, 0], ArraySink<double>, [1, 1]]
""")
        assert d["blocks"][0]["id"] == "gr::testing::ArraySink<double>"
        assert d["connections"][0][1] == [0, 0]

    def test_tagged_grc_parameters_load_typed(self):
        # reference-written GRC with typed parameters loads with exact dtypes
        g = gr.load_grc("""
name: typed
blocks:
  - name: src
    id: SignalGenerator
    parameters:
      frequency: !!float32 1000.0
      n_samples: !!int32 4096
  - name: snk
    id: VectorSink
connections:
  - [src, out, snk, in]
""")
        src = next(b for b in g.blocks if b.name == "src")
        assert float(src.settings.get("frequency")) == 1000.0
        assert int(src.settings.get("n_samples")) == 4096

    def test_serialize_roundtrip(self):
        # ≈ the qa's testYAML serialize→deserialize fixpoint
        m = {
            "answer": 42,
            "question": "universe",
            "nested": {"answer": np.int16(7), "flag": True},
            "samples": np.asarray([1, 2, 3], np.uint8),
            "taps": np.asarray([0.5, 0.25], np.float32),
            "iq": np.complex64(1 - 2j),
            "names": ["John", "Smith"],
            "nothing": None,
        }
        text = dump(m)
        d = load(text)
        assert d["answer"] == 42 and d["question"] == "universe"
        assert type(d["nested"]["answer"]) is np.int16
        assert d["nested"]["flag"] is True
        assert d["samples"].dtype == np.uint8
        assert d["taps"].dtype == np.float32
        assert d["iq"] == np.complex64(1 - 2j)
        assert d["names"] == ["John", "Smith"]
        assert d["nothing"] is None
        # grep-style content checks (cpp:190-288)
        for needle in ("42", "universe", "answer", "question", "nested",
                       "John", "Smith", "!!uint8", "!!float32",
                       "!!complex32"):
            assert needle in text, needle
        # fixpoint: dump(load(dump(m))) == dump(m)
        assert dump(load(text)) == text

    def test_comments_and_whitespace(self):
        # ≈ cpp:290-325
        d = load("""
# leading comment

key: 1   # trailing comment
# comment between

key2: 2

""")
        assert d == {"key": 1, "key2": 2}


class TestDataSetConsistency:
    """≈ dataset::checkConsistency (DataSetHelper.hpp:183), as exercised all
    over qa_DataSink/qa_StreamToDataSet."""

    def test_valid_dataset_passes(self):
        from gnuradio4_tpu.core.dataset import DataSet
        ds = DataSet.from_stream(np.arange(8, dtype=np.float32),
                                 sample_rate=10.0)
        ds.check_consistency("ok")

    def test_axis_length_mismatch_fails(self):
        from gnuradio4_tpu.core.dataset import Axis, DataSet
        ds = DataSet.from_stream(np.arange(8, dtype=np.float32))
        ds.axes = [Axis(name="time", values=np.arange(5))]
        with pytest.raises(GrError, match="axisValues"):
            ds.check_consistency("bad-axis")

    def test_timing_events_mismatch_fails(self):
        from gnuradio4_tpu.core.dataset import DataSet
        ds = DataSet.from_stream(np.arange(8, dtype=np.float32))
        ds.timing_events = [[], []]
        with pytest.raises(GrError, match="timing_events"):
            ds.check_consistency("bad-events")


class TestReviewRegressions:
    def test_quoted_octal_string_stays_string(self):
        # review finding: only PLAIN scalars resolve as octal ints; quoted /
        # !!str values shaped like octal literals must stay strings
        assert load('a: "0o77"') == {"a": "0o77"}
        assert load("a: !!str 0o77") == {"a": "0o77"}
        assert load("a: 0o77") == {"a": 63}
        assert dump(load(dump({"a": "0o77"}))) == dump({"a": "0o77"})
