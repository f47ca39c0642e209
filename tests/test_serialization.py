"""Arbitrary-object tuple payloads (Kryo analogue — SURVEY §7 narrowing).

Parity: ``backtype/storm/serialization/SerializationFactory.java:52-68``
(registered per-class serializers) and ``Config.java``
``topology.fall.back.on.java.serialization`` (pickle fallback here).
Round-trip coverage: custom object → feeder → each (decode on executor) →
grouped state → DRPC readback, plus object-typed *output* fields.
"""

import struct

import pytest

from storm_spark import (
    FeederSource,
    LocalCluster,
    Topology,
    decode_object,
    encode_object,
    register_encoder,
)
from storm_spark.io.sources import FixedBatchSource
from storm_spark.operations import MapGet, Sum
from storm_spark.operations.base import (
    PandasFunction,
    TridentCollector,
    TridentTuple,
)
from storm_spark.serialization import EncoderRegistry
from storm_spark.state import MemoryMapState


class Point:
    """A non-row-type payload — the reference's Kryo-registered object."""

    def __init__(self, x: float, y: float):
        self.x = x
        self.y = y

    def __eq__(self, other):
        return isinstance(other, Point) and (self.x, self.y) == (other.x, other.y)


def _ser_point(p: Point) -> bytes:
    return struct.pack(">dd", p.x, p.y)


def _de_point(b: bytes) -> Point:
    return Point(*struct.unpack(">dd", b))


# module-import-time registration — re-runs on executor workers when this
# module is imported to unpickle the PandasFunctions below (the same contract
# as Kryo registrations shipped in the topology jar)
register_encoder(Point, _ser_point, _de_point)


class UnregisteredThing:
    def __init__(self, tag):
        self.tag = tag

    def __eq__(self, other):
        return isinstance(other, UnregisteredThing) and self.tag == other.tag


# ---------------------------------------------------------------------------
# registry unit tests
# ---------------------------------------------------------------------------


def test_registered_round_trip():
    p = Point(3.0, 4.0)
    data = encode_object(p)
    assert isinstance(data, bytes) and EncoderRegistry.is_encoded(data)
    assert decode_object(data) == p


def test_binary_and_none_passthrough():
    assert encode_object(None) is None
    assert decode_object(None) is None
    raw = b"\x00\x01plain bytes"
    assert encode_object(raw) == raw  # already binary: not framed
    assert decode_object(raw) == raw  # no magic: returned unchanged
    assert encode_object(bytearray(b"ab")) == b"ab"


def test_pickle_fallback_round_trip():
    t = UnregisteredThing("hello")
    data = encode_object(t)
    assert EncoderRegistry.is_encoded(data)
    assert decode_object(data) == t


def test_fallback_disabled_raises_like_kryo():
    strict = EncoderRegistry(allow_pickle_fallback=False)
    with pytest.raises(TypeError, match="no encoder registered"):
        strict.encode(UnregisteredThing("x"))
    # registered classes still work
    strict.register(Point, _ser_point, _de_point)
    assert strict.decode(strict.encode(Point(1.0, 2.0))) == Point(1.0, 2.0)


def test_unknown_tag_raises():
    lone = EncoderRegistry()
    lone.register(Point, _ser_point, _de_point, name="pt")
    data = lone.encode(Point(1.0, 2.0))
    with pytest.raises(KeyError, match="no decoder registered"):
        EncoderRegistry().decode(data)


def test_fixed_batch_source_encodes_object_fields(spark):
    src = FixedBatchSource(
        ["name", "payload"], 2, [["a", Point(1.0, 2.0)], ["b", Point(3.0, 4.0)]],
        types=["string", "object"],
    )
    batch = src.next_batch()
    assert [r[0] for r in batch] == ["a", "b"]
    assert all(EncoderRegistry.is_encoded(r[1]) for r in batch)
    assert decode_object(batch[0][1]) == Point(1.0, 2.0)
    assert src.schema()["payload"].dataType.typeName() == "binary"


# ---------------------------------------------------------------------------
# executor-path operations
# ---------------------------------------------------------------------------


class Magnitude(PandasFunction):
    """Decode the object payload on the executor, emit a scalar."""

    out_types = ["double"]

    def execute(self, tup: TridentTuple, collector: TridentCollector) -> None:
        p = tup.get_object(0)  # positional: works for any input field name
        collector.emit([(p.x * p.x + p.y * p.y) ** 0.5])


class DoublePoint(PandasFunction):
    """Emit a NEW object — exercises the object-typed *output* path (the
    harness encodes emitted objects into the Arrow batch)."""

    out_types = ["object"]

    def execute(self, tup: TridentTuple, collector: TridentCollector) -> None:
        p = tup.get_object(0)
        collector.emit([Point(2 * p.x, 2 * p.y)])


def test_object_each_round_trip(spark):
    """object in → transform → object out → decode again — all executor-side."""
    topo = Topology(spark)
    feeder = FeederSource(["name", "payload"], types=["string", "object"])
    rows = feeder.encode_rows([["a", Point(3.0, 4.0)], ["b", Point(6.0, 8.0)]])
    df = spark.createDataFrame([tuple(r) for r in rows], feeder.schema())
    out = (
        topo.new_stream("s", df)
        .each(["payload"], DoublePoint(), ["doubled"])
        .each(["doubled"], Magnitude(), ["mag"])
        .project(["name", "mag"])
        .df
    )
    got = {r["name"]: r["mag"] for r in out.collect()}
    assert got == {"a": 10.0, "b": 20.0}


def test_object_through_state_and_drpc(spark):
    """The verdict's round-trip: feed a custom object through each → grouped
    persistent state → DRPC readback."""
    topo = Topology(spark)
    feeder = FeederSource(["name", "payload"], types=["string", "object"])
    mags = (
        topo.new_stream("pts", feeder)
        .each(["payload"], Magnitude(), ["mag"])
        .group_by(["name"])
        .persistent_aggregate(MemoryMapState.factory(), ["mag"], Sum("double"), ["total"])
    )
    (
        topo.new_drpc_stream("total_mag")
        .state_query(mags, ["args"], MapGet(), ["total"])
    )
    cluster = LocalCluster(topo)
    feeder.feed([["a", Point(3.0, 4.0)], ["a", Point(6.0, 8.0)], ["b", Point(5.0, 12.0)]])
    assert cluster.execute_drpc("total_mag", "a") == [["a", 15.0]]
    assert cluster.execute_drpc("total_mag", "b") == [["b", 13.0]]
    # second batch accumulates (state, not per-batch)
    feeder.feed([["b", Point(9.0, 12.0)]])
    assert cluster.execute_drpc("total_mag", "b") == [["b", 28.0]]


def test_strict_registry_refuses_pickle_payloads():
    """allow_pickle_fallback=False must gate DECODE too — a pickle-tagged
    frame from a hostile producer is refused, not executed."""
    import pickle

    import pytest

    from storm_spark.serialization import EncoderRegistry, _MAGIC

    loose, strict = EncoderRegistry(), EncoderRegistry(allow_pickle_fallback=False)
    frame = loose.encode({"any": "object"})
    assert loose.decode(frame) == {"any": "object"}
    with pytest.raises(KeyError, match="refused"):
        strict.decode(frame)


def test_magic_prefixed_plain_bytes_round_trip():
    """Plain user bytes that happen to start with the magic prefix must
    survive encode->decode unchanged (escaped through the raw-bytes tag)."""
    from storm_spark.serialization import _MAGIC, registry

    evil = _MAGIC + b"\x00\x07!pickleGARBAGE"
    assert registry.decode(registry.encode(evil)) == evil
    assert registry.decode(registry.encode(b"normal")) == b"normal"
