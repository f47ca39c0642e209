"""Arbitrary-object tuple payloads — the engine's Kryo analogue.

Parity: ``backtype/storm/serialization/SerializationFactory.java:52-68``
(per-class Kryo registrations from ``topology.kryo.register``) and
``Config.java``'s ``topology.fall.back.on.java.serialization``. Spark rows
are typed columns, so the reference's "tuples carry any registered object"
narrows to **BinaryType** (SURVEY §7): users register a ``(serialize,
deserialize)`` pair per class, values travel as tagged bytes, and python-path
operations decode with :meth:`TridentTuple.get_object`. Unregistered classes
fall back to pickle — mirroring the reference's java-serialization fallback —
unless the registry is built with ``allow_pickle_fallback=False``, in which
case encoding raises exactly like Kryo's unregistered-class error.

Scale note: object columns are opaque to Catalyst (no pushdown, no codegen)
and only make sense on the Arrow python path — which is where the reference's
arbitrary-object tuples lived too (user code, not the engine's operators).
Everything expressible as typed columns should stay typed.
"""

from __future__ import annotations

import pickle
import struct
from typing import Any, Callable

#: wire prefix marking a registry-encoded payload (vs plain user bytes)
_MAGIC = b"\xabSOBJ\x01"
_PICKLE_TAG = "!pickle"
_BYTES_TAG = "!bytes"


class EncoderRegistry:
    """Per-class (serialize, deserialize) registrations with a tagged wire
    format: ``MAGIC + u16 tag_len + tag_utf8 + payload``.

    ``encode`` passes ``bytes``/``bytearray``/``None`` through untouched
    (they are already valid BinaryType values); ``decode`` passes anything
    without the magic prefix through untouched, so plain binary columns and
    object columns can share code paths safely.
    """

    def __init__(self, allow_pickle_fallback: bool = True):
        self.allow_pickle_fallback = allow_pickle_fallback
        self._by_cls: dict[type, tuple[str, Callable[[Any], bytes]]] = {}
        self._by_tag: dict[str, Callable[[bytes], Any]] = {}

    def register(
        self,
        cls: type,
        ser: Callable[[Any], bytes],
        de: Callable[[bytes], Any],
        name: str | None = None,
    ) -> None:
        tag = name or f"{cls.__module__}.{cls.__qualname__}"
        if tag in (_PICKLE_TAG, _BYTES_TAG):
            raise ValueError(f"{tag!r} is reserved")
        self._by_cls[cls] = (tag, ser)
        self._by_tag[tag] = de

    def unregister(self, cls: type) -> None:
        tag, _ = self._by_cls.pop(cls)
        self._by_tag.pop(tag, None)

    @staticmethod
    def _frame(tag: str, payload: bytes) -> bytes:
        t = tag.encode("utf-8")
        return _MAGIC + struct.pack(">H", len(t)) + t + payload

    def encode(self, obj: Any) -> bytes | None:
        if obj is None or isinstance(obj, (bytes, bytearray)):
            if obj is None:
                return None
            b = bytes(obj)
            # plain bytes that HAPPEN to start with the magic prefix would
            # be mis-parsed as a frame on decode — escape them through the
            # reserved raw-bytes tag so the round-trip stays lossless
            return self._frame(_BYTES_TAG, b) if b.startswith(_MAGIC) else b
        reg = self._by_cls.get(type(obj))
        if reg is not None:
            tag, ser = reg
            return self._frame(tag, ser(obj))
        if self.allow_pickle_fallback:
            return self._frame(_PICKLE_TAG, pickle.dumps(obj))
        raise TypeError(
            f"no encoder registered for {type(obj).__qualname__} and pickle "
            f"fallback is disabled — register_encoder({type(obj).__qualname__}, "
            "ser, de) first"
        )

    def decode(self, data: bytes | bytearray | None) -> Any:
        if data is None:
            return None
        b = bytes(data)
        if not b.startswith(_MAGIC):
            return b  # plain binary passthrough
        off = len(_MAGIC)
        (tlen,) = struct.unpack_from(">H", b, off)
        off += 2
        tag = b[off : off + tlen].decode("utf-8")
        payload = b[off + tlen :]
        if tag == _BYTES_TAG:
            return payload
        if tag == _PICKLE_TAG:
            # the strict flag must gate BOTH directions: a registry built
            # with allow_pickle_fallback=False would otherwise still run
            # pickle.loads (arbitrary code execution) on hostile payloads
            if not self.allow_pickle_fallback:
                raise KeyError(
                    "pickle-tagged payload refused: this registry was built "
                    "with allow_pickle_fallback=False"
                )
            return pickle.loads(payload)
        de = self._by_tag.get(tag)
        if de is None:
            raise KeyError(
                f"no decoder registered for tag {tag!r} — register_encoder "
                "the class in this process before reading its payloads"
            )
        return de(payload)

    @staticmethod
    def is_encoded(data: Any) -> bool:
        return isinstance(data, (bytes, bytearray)) and bytes(data).startswith(_MAGIC)


#: process-global default registry (the reference's Config is per-topology;
#: executors re-import this module, so registrations made at module import
#: time in user code are visible on workers — same contract as Kryo configs
#: shipped in the topology jar)
registry = EncoderRegistry()


def register_encoder(
    cls: type, ser: Callable[[Any], bytes], de: Callable[[bytes], Any], name: str | None = None
) -> None:
    """Register a class on the global registry (``topology.kryo.register``)."""
    registry.register(cls, ser, de, name)


def encode_object(obj: Any) -> bytes | None:
    return registry.encode(obj)


def decode_object(data: bytes | bytearray | None) -> Any:
    return registry.decode(data)


def encode_rows(rows, types):
    """Encode ``object``-typed columns of literal rows via the global
    registry — the one shared implementation behind every feeder/fixture
    source (``FeederSource``, ``FixedBatchSource``). No-op when no column
    is typed ``object``."""
    obj_idx = [i for i, t in enumerate(types) if t == "object"]
    if not obj_idx:
        return [list(r) for r in rows]
    out = []
    for r in rows:
        r = list(r)
        for i in obj_idx:
            r[i] = encode_object(r[i])
        out.append(r)
    return out
