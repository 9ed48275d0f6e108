"""Vendored mini-protobuf runtime: wire-format and presence semantics.

The integration test is the real one — tests/test_streaming_watermark.py
runs transformWithStateInPandas end-to-end, where the JVM's stock
protobuf-java parses every byte this runtime emits.  These unit tests
pin the runtime behaviors that e2e failures would report only as an
opaque worker crash.
"""

from __future__ import annotations

import importlib.util

import pytest

import risinglight_spark  # noqa: F401  (installs the vendor path)

spec = importlib.util.find_spec("google.protobuf")
if spec is None:
    pytest.skip("no protobuf available at all", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_real_transform_with_state_path_is_active():
    from risinglight_spark.streaming.ops import _has_protobuf

    assert _has_protobuf()


def test_request_round_trip():
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="range", schema="n BIGINT"
            )
        ),
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.version == 2
    assert back.statefulProcessorCall.getValueState.stateName == "range"
    assert back.statefulProcessorCall.getValueState.schema == "n BIGINT"


def test_vivified_submessage_presence():
    # cmd.ttl must not serialize unless modified: an empty TTLConfig on
    # the wire would enable TTL with durationMs=0 on the JVM side.
    cmd = sm.StateCallCommand(stateName="s")
    before = cmd.SerializeToString()
    _ = cmd.ttl  # read-only vivification
    assert cmd.SerializeToString() == before
    cmd.ttl.durationMs = 1500
    after = cmd.SerializeToString()
    assert after != before
    back = sm.StateCallCommand()
    back.ParseFromString(after)
    assert back.ttl.durationMs == 1500


def test_empty_oneof_member_is_emitted():
    # RemoveImplicitKey carries no fields but IS the oneof selector —
    # explicitly assigned empty messages must hit the wire.
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    data = req.SerializeToString()
    assert data  # non-empty: tag + zero length
    back = sm.ImplicitGroupingKeyRequest()
    back.ParseFromString(data)


def test_negative_int64_and_bytes():
    info = sm.TimerInfo(key=b"\x00\xff", timestampMs=-5)
    back = sm.TimerInfo()
    back.ParseFromString(info.SerializeToString())
    assert back.key == b"\x00\xff"
    assert back.timestampMs == -5


def test_repeated_message_parse():
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"a", value=b"1"),
            sm.KeyAndValuePair(key=b"b", value=b"2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"a", b"1"),
        (b"b", b"2"),
    ]
    assert back.requireNextFetch is True


def test_enum_constants_exported():
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
