"""Exception hierarchy for the PySpark PGQ engine.

Mirrors the error *categories* the reference raises (Binder/Constraint/
NotImplemented exceptions in duckpgq, e.g.
/root/reference/src/core/functions/table/create_property_graph.cpp:106-191,
/root/reference/src/core/functions/table/match.cpp:81-104) without copying
messages verbatim except where tests assert on them.
"""

from __future__ import annotations


class PGQError(Exception):
    """Base class for all engine errors."""


class PGQParseError(PGQError):
    """Syntax error in the PGQ sublanguage."""


class PGQBinderError(PGQError):
    """Name-resolution error: unknown graph/table/column/label/binding.

    Reference analog: DuckDB BinderException raised throughout
    create_property_graph.cpp and match.cpp.
    """


class PGQConstraintError(PGQError):
    """Data-level constraint violation, e.g. edge endpoints that do not
    resolve to exactly one vertex (reference CSR guard:
    /root/reference/src/core/functions/scalar/csr_creation.cpp:121-125).
    """


class PGQNotImplementedError(PGQError):
    """Feature intentionally not (yet) supported."""


class PGQCapacityError(PGQError):
    """A combinatorial enumeration exceeded its configured row cap.

    Raised by bfs_distances(all_shortest=True) and bfs_all_paths when
    `max_rows` is set and the accumulated path count crosses it — a loud,
    recoverable failure instead of an executor OOM deep inside a stage.
    The message tells the caller which levers bound the blow-up
    (max_hops, selective sources, a larger cap).
    """
