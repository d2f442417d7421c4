"""Python-side stand-ins for BSON values.

The reference engine consumes real BSON via the mongocxx driver; our
document backends traffic in plain Python dicts with a small set of typed
wrappers so the same inference/flattening semantics apply (SURVEY.md §1.2,
reference /root/reference/src/schema/mongo_schema_inference_internal.hpp:15-62).

Mapping (Python value -> BSON-equivalent type tag):
  str                -> "string"
  bool               -> "bool"        (must test before int!)
  int                -> "int64"
  float              -> "double"
  decimal.Decimal    -> "decimal128"
  datetime.datetime  -> "date"        (BSON date = ms since epoch, UTC)
  datetime.date      -> "date"
  ObjectId           -> "objectid"
  bytes/bytearray    -> "binary"
  list               -> "array"
  dict               -> "document"
  None               -> "null"
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import os
import re
import struct
import threading

_HEX24 = re.compile(r"\A[0-9a-fA-F]{24}\Z")


class ObjectId:
    """Minimal 12-byte ObjectId (24-hex rendering), API-compatible subset.

    The reference renders ObjectIds as 24-hex VARCHAR
    (src/mongo_schema_inference.cpp:1029-1030) and coerces hex strings back
    to ObjectId only for columns probed as true ObjectIds
    (src/mongo_filter_pushdown.cpp:46-67).
    """

    __slots__ = ("_hex",)
    _counter = [int.from_bytes(os.urandom(3), "big")]
    _lock = threading.Lock()

    def __init__(self, value: str | bytes | None = None):
        if value is None:
            with ObjectId._lock:
                ObjectId._counter[0] = (ObjectId._counter[0] + 1) % (1 << 24)
                cnt = ObjectId._counter[0]
            ts = int(_dt.datetime.now(_dt.timezone.utc).timestamp())
            raw = struct.pack(">I", ts) + os.urandom(5) + cnt.to_bytes(3, "big")
            self._hex = raw.hex()
        elif isinstance(value, bytes):
            if len(value) != 12:
                raise ValueError("ObjectId bytes must be length 12")
            self._hex = value.hex()
        else:
            s = str(value)
            if not _HEX24.match(s):
                raise ValueError(f"invalid ObjectId hex: {s!r}")
            self._hex = s.lower()

    def __str__(self):
        return self._hex

    @property
    def binary(self) -> bytes:
        """Raw 12 bytes (same attribute as pymongo's bson.ObjectId)."""
        return bytes.fromhex(self._hex)

    def __repr__(self):
        return f"ObjectId('{self._hex}')"

    def __eq__(self, other):
        if isinstance(other, ObjectId):
            return self._hex == other._hex
        return NotImplemented

    def __hash__(self):
        return hash(self._hex)

    def __lt__(self, other):
        if isinstance(other, ObjectId):
            return self._hex < other._hex
        return NotImplemented


def is_hex24(s) -> bool:
    return isinstance(s, str) and bool(_HEX24.match(s))


def bson_type_name(v) -> str:
    """BSON-equivalent type tag for a Python value (see module docstring)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, ObjectId):
        return "objectid"
    if isinstance(v, str):
        return "string"
    if isinstance(v, int):
        return "int64"
    if isinstance(v, float):
        return "double"
    if isinstance(v, _decimal.Decimal):
        return "decimal128"
    if isinstance(v, _dt.datetime):
        return "date"
    if isinstance(v, _dt.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "binary"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "document"
    # defensive duck-typing for raw driver classes that bypassed the
    # backend boundary's _from_wire normalization (bson.ObjectId /
    # bson.Decimal128): classify correctly instead of falling through
    # to "string" and silently mistyping a column
    tn = type(v).__name__
    if tn == "ObjectId" and hasattr(v, "binary"):
        return "objectid"
    if tn == "Decimal128" and hasattr(v, "to_decimal"):
        return "decimal128"
    return "string"  # regex/code/symbol/minkey/... all render as strings


def is_midnight_utc(dt) -> bool:
    """BSON date maps to DATE iff ms-since-epoch is a multiple of 86400s.

    Reference: mongo_schema_inference_internal.hpp:28-38 (midnight-UTC rule).
    """
    if isinstance(dt, _dt.datetime):
        if dt.tzinfo is not None:
            dt = dt.astimezone(_dt.timezone.utc)
        return dt.hour == 0 and dt.minute == 0 and dt.second == 0 and dt.microsecond == 0
    return isinstance(dt, _dt.date)


def to_utc_naive(dt: _dt.datetime) -> _dt.datetime:
    if dt.tzinfo is not None:
        return dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt
