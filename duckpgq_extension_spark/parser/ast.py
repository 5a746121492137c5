"""AST for the PGQ sublanguage.

Shapes mirror the reference parser IR:
- MatchExpression: /root/reference/src/include/duckpgq/parser/tableref/matchref.hpp:10-22
- PathPattern:     /root/reference/src/include/duckpgq/parser/path_pattern.hpp:15-24
- PathElement/SubPath:
  /root/reference/src/include/duckpgq/parser/path_element.hpp:8-37 and
  subpath_element.hpp:9-31

Expressions (WHERE clauses, COLUMNS items) are carried as raw SQL text and
resolved later against DataFrame aliases — the same strategy as the
reference, which re-parses SQL strings through a helper mini-parser
(src/core/utils/duckpgq_sql.cpp:57-101).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Edge direction constants (reference PGQMatchType)
EDGE_RIGHT = "right"  # (a)-[e]->(b)
EDGE_LEFT = "left"  # (a)<-[e]-(b)
EDGE_ANY = "any"  # (a)-[e]-(b)      undirected
EDGE_BOTH = "both"  # (a)<-[e]->(b)    edge required in both directions

UNBOUNDED = None  # upper bound of * / + / {l,}


@dataclass
class VertexElement:
    binding: str
    label: str | None = None
    where: str | None = None
    anonymous: bool = False


@dataclass
class EdgeElement:
    binding: str
    label: str | None = None
    where: str | None = None
    direction: str = EDGE_RIGHT
    # quantifier: {lower, upper}; upper=None means unbounded; quantified=False
    # for a plain single edge
    quantified: bool = False
    lower: int = 1
    upper: int | None = 1
    anonymous: bool = False
    cost_col: str | None = None  # COST <column> (ANY CHEAPEST, beyond-reference)


@dataclass
class PathPattern:
    """One comma-separated pattern: alternating vertex/edge elements."""

    elements: list = field(default_factory=list)
    shortest: bool = False
    all_paths: bool = False
    all_shortest: bool = False  # ALL SHORTEST (beyond-reference; rejected by match.cpp:81-104)
    topk: int | None = None
    cheapest: bool = False  # ANY CHEAPEST (beyond-reference, GQL-style)
    path_variable: str | None = None
    path_mode: str = "WALK"  # TRAIL/SIMPLE/ACYCLIC implemented beyond-reference


@dataclass
class ColumnItem:
    """One COLUMNS(...) projection item.

    kind: 'expr' (raw SQL over bindings), 'star' (binding.*),
    'binding' (bare binding -> struct), 'path_fn'
    (element_id/path_length/vertices/edges over a path variable).
    """

    kind: str
    text: str
    alias: str | None = None
    binding: str | None = None  # for star/binding kinds
    fn: str | None = None  # for path_fn
    path_var: str | None = None  # for path_fn


@dataclass
class MatchExpression:
    graph_name: str
    patterns: list[PathPattern] = field(default_factory=list)
    where: str | None = None
    columns: list[ColumnItem] = field(default_factory=list)
    alias: str | None = None


@dataclass
class CreatePropertyGraph:
    name: str
    vertex_tables: list = field(default_factory=list)  # PropertyGraphTable
    edge_tables: list = field(default_factory=list)
    or_replace: bool = False
    if_not_exists: bool = False


@dataclass
class DropPropertyGraph:
    name: str
    if_exists: bool = False
