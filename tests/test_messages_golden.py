"""Golden mirror of the reference's qa_Messages.cpp
(core/test/qa_Messages.cpp:95-1004): per-block property endpoints —
heartbeat/echo by name and unique_name, unknown service/endpoint errors,
lifecycle get/set with invalid-transition errors, Settings vs StagedSettings
semantics, the settings-context lifecycle (create/activate/list/remove,
active falls back to default), subscriptions to lifecycle/setting
notifications, and settings handling via the running scheduler."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.math import MultiplyConst
from gnuradio4_tpu.blocks.testing import CountingSource, NullSink
from gnuradio4_tpu.core.errors import Error
from gnuradio4_tpu.core.messages import Command, Message, Property


def make_sched(n=4096):
    g = gr.Graph()
    src = CountingSource(n_samples=n)
    mul = MultiplyConst(value=2.0, name="gain")
    snk = NullSink()
    g.connect_chain(src, mul, snk)
    sched = gr.Scheduler(g, block_len=1024)
    sched.init()
    return sched, mul


def ask(sched, command, service, endpoint, data=None):
    """Send one message and return its reply (≈ qa's sendMessage +
    waitForReply, qa_Messages.cpp:40-60)."""
    rid = sched.bus.send_command(command, service, endpoint, data)
    sched._process_messages()
    for r in sched.bus.drain_replies():
        if r.client_request_id == rid:
            return r
    raise AssertionError("no reply")


class TestBlockLevelEndpoints:
    def test_heartbeat_by_name_and_unique_name(self):
        # ≈ cpp:99-134
        sched, mul = make_sched()
        r = ask(sched, Command.Get, "gain", Property.HEARTBEAT)
        assert not r.is_error and "heartbeat" in r.data
        r = ask(sched, Command.Get, mul.unique_name, Property.HEARTBEAT)
        assert not r.is_error and "heartbeat" in r.data

    def test_unknown_service_is_error(self):
        sched, _ = make_sched()
        r = ask(sched, Command.Get, "no_such_block", Property.HEARTBEAT)
        assert r.is_error

    def test_echo(self):
        # ≈ cpp:167-244
        sched, mul = make_sched()
        payload = {"custom kv": 42, "nested": {"a": 1}}
        r = ask(sched, Command.Get, "gain", Property.ECHO, payload)
        assert not r.is_error and r.data == payload
        r = ask(sched, Command.Get, mul.unique_name, Property.ECHO, payload)
        assert r.data == payload

    def test_unknown_endpoint_is_error(self):
        sched, _ = make_sched()
        r = ask(sched, Command.Get, "gain", "NoSuchEndpoint")
        assert r.is_error

    def test_lifecycle_get_and_invalid_set(self):
        # ≈ cpp:245-300: get the FSM state; an illegal transition errors
        sched, _ = make_sched()
        r = ask(sched, Command.Get, "", Property.LIFECYCLE_STATE)
        assert r.data["state"] == "INITIALISED"
        r = ask(sched, Command.Set, "", Property.LIFECYCLE_STATE,
                {"state": "PAUSED"})   # INITIALISED → PAUSED is illegal
        # (LifeCycle.hpp:109: INITIALISED may only go to RUNNING /
        # REQUESTED_STOP / STOPPED)
        assert r.is_error
        r = ask(sched, Command.Set, "", Property.LIFECYCLE_STATE,
                {"state": "NOT_A_STATE"})
        assert r.is_error


class TestSettingsEndpoints:
    def test_get_settings(self):
        # ≈ cpp:310-324: full applied settings map
        sched, _ = make_sched()
        r = ask(sched, Command.Get, "gain", Property.SETTING)
        assert not r.is_error and r.data["value"] == 2.0

    def test_staged_settings_roundtrip(self):
        # ≈ cpp:325-380: staged values visible before apply, gone after
        sched, mul = make_sched()
        r = ask(sched, Command.Get, "gain", Property.STAGED_SETTING)
        assert r.data == {}
        r = ask(sched, Command.Set, "gain", Property.STAGED_SETTING,
                {"value": 5.0})
        assert r.data == {"value": 5.0}          # now staged
        assert mul.settings.get("value") == 2.0  # not yet applied
        sched.run_and_wait()                     # apply at the step boundary
        assert mul.settings.get("value") == 5.0
        rid = sched.bus.send_command(Command.Get, "gain",
                                     Property.STAGED_SETTING)
        sched._process_messages()
        reply = [r for r in sched.bus.drain_replies()
                 if r.client_request_id == rid][0]
        assert reply.data == {}                  # staged drained by apply

    def test_set_unknown_key_is_error(self):
        sched, _ = make_sched()
        r = ask(sched, Command.Set, "gain", Property.SETTING, {"nope": 1})
        assert r.is_error


class TestContextEndpoints:
    """≈ cpp:381-559 "Block<T>-level active context tests"."""

    def test_context_lifecycle(self):
        sched, mul = make_sched()
        # default: no stored contexts, active == ""
        r = ask(sched, Command.Get, "gain", Property.SETTINGS_CONTEXTS)
        assert r.data["contexts"] == []
        r = ask(sched, Command.Get, "gain", Property.ACTIVE_CONTEXT)
        assert r.data["context"] == ""
        # create + activate test_context
        r = ask(sched, Command.Set, "gain", Property.ACTIVE_CONTEXT,
                {"context": "test_context"})
        assert r.data["context"] == "test_context"
        # create new_context (stored, not activated) with preset values
        r = ask(sched, Command.Set, "gain", Property.SETTINGS_CONTEXTS,
                {"context": "new_context", "properties": {"value": 9.0}})
        assert "new_context" in r.data["contexts"]
        # activate new_context
        r = ask(sched, Command.Set, "gain", Property.ACTIVE_CONTEXT,
                {"context": "new_context"})
        assert r.data["context"] == "new_context"
        # its preset staged → applied at the next boundary
        sched._apply_staged_settings()
        assert mul.settings.get("value") == 9.0
        # list all stored contexts
        r = ask(sched, Command.Get, "gain", Property.SETTINGS_CONTEXTS)
        assert set(r.data["contexts"]) == {"test_context", "new_context"}
        # remove new_context
        r = ask(sched, Command.Disconnect, "gain", Property.SETTINGS_CONTEXTS,
                {"context": "new_context"})
        assert "new_context" not in r.data["contexts"]
        # removing twice errors
        r = ask(sched, Command.Disconnect, "gain", Property.SETTINGS_CONTEXTS,
                {"context": "new_context"})
        assert r.is_error
        # back to the default context
        r = ask(sched, Command.Set, "gain", Property.ACTIVE_CONTEXT,
                {"context": ""})
        assert r.data["context"] == ""


class TestSubscriptionsAndSchedulerPath:
    def test_lifecycle_notifications_during_run(self):
        # ≈ cpp:789-840 "Subscribe to scheduler lifecycle messages"
        sched, _ = make_sched()
        states = []
        sched.bus.subscribe(Property.LIFECYCLE_STATE,
                            lambda m: states.append(m.data.get("state")))
        sched.run_and_wait()
        assert "RUNNING" in states and "STOPPED" in states

    def test_setting_notifications_on_apply(self):
        # ≈ cpp:841-927 "Settings handling via scheduler": applied settings
        # notify subscribers
        sched, mul = make_sched()
        seen = []
        sched.bus.subscribe(Property.SETTING, lambda m: seen.append(m.data))
        sched.bus.send_command(Command.Set, "gain", Property.SETTING,
                               {"value": 7.0})
        sched.run_and_wait()
        assert any(d.get("value") == 7.0 for d in seen)
        assert mul.settings.get("value") == 7.0


class TestGraphMessages:
    """≈ qa_GraphMessages.cpp:79-113 "Get available block types"."""

    def test_registry_block_types(self):
        sched, _ = make_sched()
        r = ask(sched, Command.Get, "", Property.REGISTRY_BLOCK_TYPES)
        types = r.data["types"]
        assert len(types) > 100
        for t in ("SignalGenerator", "FirFilter", "DataSink", "Selector"):
            assert t in types
        assert types == sorted(types)
