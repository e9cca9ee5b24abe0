"""Trigger predicate matching (≈ reference core TriggerMatcher.hpp:19-60).

The reference DSL matches trigger tags by ``"name[/ctx]"`` with optional
``[t_min, t_max]`` ranges and single-shot/repeat semantics. Here a matcher is a
predicate over a tag's property map; the string form supports:

    "CMD_BP_START"                    trigger_name equality
    "CMD_BP_START/FAIR.SELECTOR.C=1"  name + context equality
    "^CMD_"                           regex on trigger_name (leading ^ enables)
    "name_a|name_b"                   alternatives

Matchers return one of Matched / NotMatched / Ignore — the same tri-state the
reference uses to window multiplexed captures.
"""

from __future__ import annotations

import dataclasses
import enum
import re
from typing import Callable

from .tags import Keys, Tag


class MatchResult(enum.Enum):
    MATCHED = "Matched"
    NOT_MATCHED = "NotMatched"
    IGNORE = "Ignore"


Matcher = Callable[[Tag], MatchResult]


def match_trigger(pattern: str) -> Matcher:
    """Build a matcher from the string DSL."""
    alternatives = [p.strip() for p in pattern.split("|") if p.strip()]

    def one(p: str) -> Callable[[Tag], bool]:
        if "/" in p:
            name, ctx = p.split("/", 1)
            def pred(tag: Tag, name=name, ctx=ctx) -> bool:
                return (str(tag.map.get(Keys.TRIGGER_NAME, "")) == name
                        and str(tag.map.get(Keys.CONTEXT, "")) == ctx)
            return pred
        if p.startswith("^"):
            rx = re.compile(p)
            return lambda tag, rx=rx: bool(
                rx.search(str(tag.map.get(Keys.TRIGGER_NAME, ""))))
        return lambda tag, p=p: str(tag.map.get(Keys.TRIGGER_NAME, "")) == p

    preds = [one(p) for p in alternatives]

    def matcher(tag: Tag) -> MatchResult:
        if Keys.TRIGGER_NAME not in tag.map:
            return MatchResult.IGNORE
        return (MatchResult.MATCHED if any(p(tag) for p in preds)
                else MatchResult.NOT_MATCHED)

    return matcher


def start_stop_matchers(start: str, stop: str) -> tuple[Matcher, Matcher]:
    return match_trigger(start), match_trigger(stop)


@dataclasses.dataclass
class TriggerWindow:
    """An open capture window (multiplexed / triggered acquisition)."""

    start_index: int
    stop_index: int | None = None
    trigger: Tag | None = None
