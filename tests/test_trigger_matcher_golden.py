"""Golden mirror of the reference's qa_TriggerMatcher.cpp
(core/test/qa_TriggerMatcher.cpp:9-253): the ``name[/ctx]`` parser with
``^``-"ends" prefixes and the full BasicTriggerNameCtxMatcher state-machine
matrix (exclusive/inclusive windows, ends-matchers on either side, mixed
conditions, and the three single-trigger spellings)."""

import pytest

from gnuradio4_tpu.core.errors import GrError
from gnuradio4_tpu.core.tags import Keys, Tag
from gnuradio4_tpu.core.trigger import (BasicTriggerNameCtxMatcher,
                                        MatchResult, _parse_part)

M = MatchResult.MATCHED        # ≈ Matching
N = MatchResult.NOT_MATCHED    # ≈ NotMatching
I = MatchResult.IGNORE         # ≈ Ignore  # noqa: E741


def tag(name, ctx):
    # ≈ qa_TriggerMatcher.cpp:66 createTag
    return Tag(0, {Keys.TRIGGER_NAME: name, Keys.CONTEXT: ctx,
                   Keys.TRIGGER_META_INFO: {}})


def run(filter_str, seq):
    m = BasicTriggerNameCtxMatcher(filter_str)
    st = m.new_state()
    assert m(None, st) is I                      # empty tag → Ignore
    got = [m(t, st) for t, _ in seq]
    for i, ((_, expected), g) in enumerate(zip(seq, got)):
        assert g is expected, (i, g, expected)
    return m


class TestTriggerParser:
    """≈ "trigger parser" (cpp:13-61)."""

    def test_full_name_ctx(self):
        assert _parse_part("alarm/kitchen") == ("alarm", "kitchen",
                                                False, False)
        assert _parse_part("^alarm/kitchen") == ("alarm", "kitchen",
                                                 True, False)
        assert _parse_part("alarm/^kitchen") == ("alarm", "kitchen",
                                                 False, True)
        assert _parse_part("^alarm/^kitchen") == ("alarm", "kitchen",
                                                  True, True)

    def test_name_only(self):
        assert _parse_part("alarm") == ("alarm", "", False, False)

    def test_ctx_only(self):
        assert _parse_part("/kitchen") == ("", "kitchen", False, False)

    def test_extraneous_separator_throws(self):
        with pytest.raises(GrError):
            _parse_part("alarm/kitchen/cabinet")


class TestBasicTriggerNameCtxMatcher:
    def test_room1_room3_exclusive(self):
        # cpp:68-90
        m = run("[alarm/room1, alarm/room3]", [
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("info", "room2"), I),
            (tag("alarm", "room3"), N),
            (tag("alarm", "room4"), I),
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("info", "room2"), I),
            (tag("alarm", "room2"), I),
            (tag("alarm", "room3"), N),
            (tag("alarm", "room4"), I),
        ])
        assert not m.is_single

    def test_room1_ends_room3_inclusive(self):
        # cpp:92-110
        run("[alarm/room1, alarm/^room3]", [
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
        ])

    def test_ends_room1_ends_room3(self):
        # cpp:112-128 — "[alarm/^room1, alarm/^room3]" implicitly resets
        run("[alarm/^room1, alarm/^room3]", [
            (tag("alarm", "room1"), I),
            (tag("info", "room2"), M),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), M),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
        ])

    def test_name_ends_start(self):
        # cpp:130-147 — "[^alarm/room1, alarm/room3]"
        run("[^alarm/room1, alarm/room3]", [
            (tag("alarm", "room1"), I),   # skipped due to ^alarm
            (tag("other", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("other", "room1"), I),
            (tag("alarm", "room3"), N),
            (tag("alarm", "room1"), I),
            (tag("other", "room1"), M),
            (tag("alarm", "room3"), N),
        ])

    def test_double_ends_both_sides(self):
        # cpp:149-168 — "[^alarm/^room1, ^alarm/room3]"
        run("[^alarm/^room1, ^alarm/room3]", [
            (tag("alarm", "room1"), I),   # skipped due to ^alarm/^room1
            (tag("other", "room2"), M),
            (tag("other", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("other", "room3"), I),
            (tag("alarm", "room3"), I),   # skipped due to ^alarm stop
            (tag("other", "room4"), N),
            (tag("alarm", "room1"), I),
            (tag("other", "room2"), M),
            (tag("alarm", "room3"), I),
            (tag("other", "room4"), N),
        ])

    def test_ctx_ends_both_sides(self):
        # cpp:170-187 — "[alarm/^room1, alarm/^room3]"
        run("[alarm/^room1, alarm/^room3]", [
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), M),
            (tag("alarm", "room3"), I),
            (tag("alarm", "room4"), N),
        ])

    def test_mixed_conditions(self):
        # cpp:189-205
        run("[^alarm/room1, alarm/room3]", [
            (tag("alarm", "room1"), I),
            (tag("other", "room1"), M),
            (tag("alarm", "room1"), I),
            (tag("alarm", "room2"), I),
            (tag("alarm", "room3"), N),
            (tag("alarm", "room1"), I),
            (tag("other", "room1"), M),
            (tag("alarm", "room3"), N),
        ])

    def test_single_trigger_bracketed(self):
        # cpp:207-220
        m = run("[alarm/room1]", [
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
            (tag("other", "room1"), I),
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
        ])
        assert m.is_single

    def test_single_trigger_lone_stop(self):
        # cpp:222-236 — "[, alarm/room1]" promotes the stop to the start
        m = run("[, alarm/room1]", [
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
            (tag("other", "room1"), I),
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
        ])
        assert m.is_single

    def test_single_trigger_identical_start_stop(self):
        # cpp:238-251 — "[alarm/room1, alarm/room1]" degenerates to single
        m = run("[alarm/room1, alarm/room1]", [
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
            (tag("other", "room1"), I),
            (tag("alarm", "room1"), M),
            (tag("alarm", "room1"), M),
        ])
        assert m.is_single
