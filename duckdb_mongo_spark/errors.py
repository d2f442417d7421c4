"""Engine exceptions.

Mirrors the error surface of the reference extension (e.g.
``NotImplementedException`` for writes, ``BinderException`` for bad
parameters) without copying any code — reference behavior documented in
/root/reference/src/mongo_catalog.cpp:387-405 (writes rejected) and
src/mongo_schema_inference.cpp:703-717 (FAILFAST).
"""

from __future__ import annotations


class MongoSparkError(Exception):
    """Base class for all engine errors."""


class BinderError(MongoSparkError):
    """Bad user parameters (unknown type name, malformed columns spec...)."""


class NotImplementedInEngine(MongoSparkError):
    """Operation intentionally unsupported (e.g. writes — the reference is read-only)."""


class CursorError(MongoSparkError):
    """A server cursor became invalid mid-scan (CursorNotFound: idle
    timeout, server restart, or explicit killCursors).

    Continuing would silently truncate the scan's results, so the error
    propagates and fails the Spark task — a task retry opens a FRESH
    cursor and re-reads the partition completely. Transient network
    errors (AutoReconnect-class) propagate unchanged for the same
    reason: the retry unit is the task, never a partially-consumed
    cursor."""


class SchemaEnforcementError(MongoSparkError):
    """FAILFAST mode hit a document that does not conform to the schema.

    Carries the offending document ``_id`` like the reference does
    (src/mongo_schema_inference.cpp:703-717).
    """

    def __init__(self, doc_id, field, expected, actual):
        self.doc_id = doc_id
        self.field = field
        self.expected = expected
        self.actual = actual
        super().__init__(
            f"Document with _id={doc_id!r}: field {field!r} has BSON type "
            f"{actual!r} incompatible with declared type {expected!r} (FAILFAST)"
        )


class ConnectionStringError(MongoSparkError):
    """Malformed connection string / ATTACH options."""
