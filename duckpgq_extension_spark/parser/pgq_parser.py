"""Tokenizer + recursive-descent parser for the PGQ sublanguage.

Covers the grammar surface of the reference PEG grammar
(/root/reference/third_party/duckdb_peg_parser/upstream/src/parser/peg/grammar/statements/pgq.gram:1-63):

  CREATE [OR REPLACE] PROPERTY GRAPH [IF NOT EXISTS] name
      VERTEX TABLES ( ... ) [EDGE TABLES ( ... )]
  DROP PROPERTY GRAPH [IF EXISTS] name
  <graph_table body>:  pg MATCH <patterns> [WHERE expr] COLUMNS ( items )

Quantifier sugar matches the reference transformer
(third_party/.../transformer/transform_pgq.cpp:500-523):
  *  -> {0, inf}    +  -> {1, inf}    ?  -> {0, 1}
  {n} -> {n, n}     {l,u} with empty bounds defaulted to 0 / inf.

SQL expressions embedded in WHERE / COLUMNS are captured as source-text
spans and compiled later against DataFrame aliases (the reference similarly
round-trips expression strings through a mini parser,
src/core/utils/duckpgq_sql.cpp:57-101).
"""

from __future__ import annotations

import re

from ..catalog import PropertyGraphTable
from ..errors import PGQNotImplementedError, PGQParseError
from .ast import (
    EDGE_ANY,
    EDGE_BOTH,
    EDGE_LEFT,
    EDGE_RIGHT,
    ColumnItem,
    CreatePropertyGraph,
    DropPropertyGraph,
    EdgeElement,
    MatchExpression,
    PathPattern,
    VertexElement,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*(?s:.*?)\*/)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qident>"(?:[^"]|"")*")
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9$]*)
  | (?P<op><=|>=|<>|!=|\|\||::|[-<>\[\](){},.:*+?=/%&|^;])
    """,
    re.VERBOSE,
)

PATH_FNS = {"element_id", "path_length", "vertices", "edges", "path_cost"}


class Token:
    __slots__ = ("kind", "value", "start", "end")

    def __init__(self, kind: str, value: str, start: int, end: int):
        self.kind = kind
        self.value = value
        self.start = start
        self.end = end

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind},{self.value!r})"


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise PGQParseError(f"Unexpected character {text[pos]!r} at offset {pos}")
        kind = m.lastgroup
        if kind not in ("ws", "comment"):
            out.append(Token(kind, m.group(), m.start(), m.end()))
        pos = m.end()
    return out


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.pos = 0

    # -- primitives --------------------------------------------------------
    def peek(self, offset: int = 0) -> Token | None:
        i = self.pos + offset
        return self.toks[i] if i < len(self.toks) else None

    def at_end(self) -> bool:
        return self.pos >= len(self.toks)

    def advance(self) -> Token:
        t = self.peek()
        if t is None:
            raise PGQParseError("Unexpected end of input")
        self.pos += 1
        return t

    def is_kw(self, *words: str, offset: int = 0) -> bool:
        t = self.peek(offset)
        return t is not None and t.kind == "ident" and t.value.upper() in words

    def match_kw(self, *words: str) -> bool:
        if self.is_kw(*words):
            self.pos += 1
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.match_kw(word):
            t = self.peek()
            raise PGQParseError(
                f"Expected keyword {word}, got {t.value if t else '<eof>'!r}"
            )

    def is_op(self, op: str, offset: int = 0) -> bool:
        t = self.peek(offset)
        return t is not None and t.kind == "op" and t.value == op

    def match_op(self, op: str) -> bool:
        if self.is_op(op):
            self.pos += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.match_op(op):
            t = self.peek()
            raise PGQParseError(f"Expected '{op}', got {t.value if t else '<eof>'!r}")

    def ident(self) -> str:
        t = self.advance()
        if t.kind == "ident":
            return t.value
        if t.kind == "qident":
            return t.value[1:-1].replace('""', '"')
        raise PGQParseError(f"Expected identifier, got {t.value!r}")

    def _span_text(self, start_tok: int, end_tok: int) -> str:
        """Original source text covering tokens [start_tok, end_tok)."""
        if end_tok <= start_tok:
            return ""
        return self.text[self.toks[start_tok].start : self.toks[end_tok - 1].end]

    def capture_expr(self, stop) -> str:
        """Consume tokens until stop(parser) is true at paren/bracket depth 0;
        return the covered source text."""
        depth = 0
        start = self.pos
        while not self.at_end():
            if depth == 0 and stop(self):
                break
            t = self.peek()
            if t.value in ("(", "["):
                depth += 1
            elif t.value in (")", "]"):
                if depth == 0:
                    break
                depth -= 1
            self.pos += 1
        return self._span_text(start, self.pos).strip()

    # -- statements --------------------------------------------------------
    def parse_statement(self):
        if self.is_kw("CREATE"):
            return self.parse_create()
        if self.is_kw("DROP"):
            return self.parse_drop()
        raise PGQParseError("Expected CREATE or DROP PROPERTY GRAPH statement")

    def parse_create(self) -> CreatePropertyGraph:
        self.expect_kw("CREATE")
        or_replace = False
        if self.match_kw("OR"):
            self.expect_kw("REPLACE")
            or_replace = True
        self.expect_kw("PROPERTY")
        self.expect_kw("GRAPH")
        if_not_exists = False
        if self.match_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            if_not_exists = True
        name = self.ident()
        stmt = CreatePropertyGraph(
            name=name, or_replace=or_replace, if_not_exists=if_not_exists
        )
        self.expect_kw("VERTEX")
        self.expect_kw("TABLES")
        self.expect_op("(")
        while True:
            stmt.vertex_tables.append(self.parse_pg_table(is_vertex=True))
            if not self.match_op(","):
                break
        self.expect_op(")")
        if self.match_kw("EDGE"):
            self.expect_kw("TABLES")
            self.expect_op("(")
            while True:
                stmt.edge_tables.append(self.parse_pg_table(is_vertex=False))
                if not self.match_op(","):
                    break
            self.expect_op(")")
        self.match_op(";")
        return stmt

    def qualified_name(self) -> str:
        """catalog.schema.table / schema.table / table (211_using_other_schemas)."""
        parts = [self.ident()]
        while self.is_op(".") and self.peek(1) is not None and self.peek(1).kind in (
            "ident",
            "qident",
        ):
            self.advance()
            parts.append(self.ident())
        return ".".join(parts)

    def parse_pg_table(self, is_vertex: bool) -> PropertyGraphTable:
        table_name = self.qualified_name()
        t = PropertyGraphTable(table_name=table_name, is_vertex=is_vertex)
        alias = None
        if self.match_kw("AS"):
            alias = self.ident()
        if not is_vertex:
            # two forms, like the reference (create_property_graph.cpp:117-153):
            #   SOURCE KEY (fk) REFERENCES v (pk)   -- explicit keys
            #   SOURCE v                            -- keys discovered from
            # declared metadata (reference: FOREIGN KEY constraints; Spark
            # analog: duckpgq.key / duckpgq.fk.* table properties —
            # resolved at DDL validation, catalog.PropertyGraph.validate)
            self.expect_kw("SOURCE")
            if self.match_kw("KEY"):
                t.source_fk = self._paren_name_list()
                self.expect_kw("REFERENCES")
                t.source_reference = self.qualified_name()
                t.source_pk = self._paren_name_list()
            else:
                t.source_reference = self.qualified_name()
            self.expect_kw("DESTINATION")
            if self.match_kw("KEY"):
                t.destination_fk = self._paren_name_list()
                self.expect_kw("REFERENCES")
                t.destination_reference = self.qualified_name()
                t.destination_pk = self._paren_name_list()
            else:
                t.destination_reference = self.qualified_name()
            # Spark extension: designate a unique edge-id column (the analog
            # of the reference's implicit rowid in path output).  Optional;
            # without it path edge-ids are per-query artifacts.
            if self.match_kw("EDGE"):
                self.expect_kw("ID")
                ids = self._paren_name_list()
                if len(ids) != 1:
                    raise PGQParseError("EDGE ID takes exactly one column")
                t.edge_id_col = ids[0]
        # properties clause
        if self.match_kw("NO"):
            self.expect_kw("PROPERTIES")
            t.no_properties = True
            t.all_properties = False
        elif self.match_kw("PROPERTIES"):
            if self.match_kw("ARE"):
                self.expect_kw("ALL")
                self.expect_kw("COLUMNS")
                t.all_properties = True
                if self.match_kw("EXCEPT"):
                    t.except_columns = self._paren_name_list()
            elif self.match_kw("ALL"):
                self.expect_kw("COLUMNS")
                t.all_properties = True
                if self.match_kw("EXCEPT"):
                    t.except_columns = self._paren_name_list()
            else:
                t.all_properties = False
                self.expect_op("(")
                while True:
                    col = self.ident()
                    out = col
                    if self.match_kw("AS"):
                        out = self.ident()
                    t.properties[col] = out
                    if not self.match_op(","):
                        break
                self.expect_op(")")
        # label clause
        if self.match_kw("LABEL"):
            t.main_label = self.ident()
            if self.match_kw("IN"):
                t.discriminator = self.ident()
                t.sub_labels = self._paren_name_list()
        else:
            t.main_label = alias or table_name
        return t

    def _paren_name_list(self) -> list[str]:
        self.expect_op("(")
        names = [self.ident()]
        while self.match_op(","):
            names.append(self.ident())
        self.expect_op(")")
        return names

    def parse_drop(self) -> DropPropertyGraph:
        self.expect_kw("DROP")
        self.expect_kw("PROPERTY")
        self.expect_kw("GRAPH")
        if_exists = False
        if self.match_kw("IF"):
            self.expect_kw("EXISTS")
            if_exists = True
        name = self.ident()
        self.match_op(";")
        return DropPropertyGraph(name=name, if_exists=if_exists)

    # -- GRAPH_TABLE body --------------------------------------------------
    def parse_graph_table_body(self) -> MatchExpression:
        """Parse `pg MATCH <patterns> [WHERE expr] COLUMNS (items)`."""
        graph_name = self.ident()
        self.expect_kw("MATCH")
        expr = MatchExpression(graph_name=graph_name)
        while True:
            expr.patterns.append(self.parse_path_pattern())
            if not self.match_op(","):
                break
        if self.match_kw("WHERE"):
            expr.where = self.capture_expr(lambda p: p.is_kw("COLUMNS"))
        # COLUMNS is optional in the reference grammar (bi.test:56-60 runs a
        # bare MATCH); default to projecting every named binding's properties
        if self.match_kw("COLUMNS"):
            self.expect_op("(")
            while True:
                expr.columns.append(self.parse_column_item())
                if not self.match_op(","):
                    break
                if self.is_op(")"):
                    # trailing comma: COLUMNS (p.id AS p_id,) parses in the
                    # reference (optional_columns.test:44-55)
                    break
            self.expect_op(")")
        else:
            expr.columns.append(ColumnItem(kind="expr", text="*"))
        return expr

    _anon_counter = 0

    def _fresh_binding(self, prefix: str) -> str:
        Parser._anon_counter += 1
        return f"__{prefix}{Parser._anon_counter}"

    def parse_path_pattern(self) -> PathPattern:
        pat = PathPattern()
        # optional "p = " path variable
        t0, t1 = self.peek(), self.peek(1)
        if t0 is not None and t0.kind == "ident" and t1 is not None and t1.value == "=":
            if t0.value.upper() not in ("ANY", "ALL", "SHORTEST"):
                pat.path_variable = self.ident().lower()
                self.advance()  # '='
        # modifiers, possibly followed by "p = " again (ANY SHORTEST p = ...)
        if self.match_kw("ANY"):
            if self.match_kw("SHORTEST"):
                t = self.peek()
                if t is not None and t.kind == "number":
                    # parser-error parity: the reference grammar rejects a
                    # count after ANY SHORTEST (top_k.test:24-31,51-56)
                    raise PGQParseError(f"syntax error at or near \"{t.value}\"")
                pat.shortest = True
            elif self.match_kw("CHEAPEST"):
                # beyond-reference (GQL-style): cheapest weighted walk;
                # the quantified edge names its weight via COST <column>
                pat.cheapest = True
            # plain ANY = any walk
        elif self.match_kw("ALL"):
            if self.match_kw("SHORTEST"):
                # beyond-reference: the reference rejects ALL SHORTEST
                # (match.cpp:81-104); we enumerate EVERY distinct
                # minimal-length path per (src, dst) — one row per path
                pat.shortest = True
                pat.all_shortest = True
            else:
                pat.all_paths = True
        elif self.match_kw("SHORTEST"):
            t = self.peek()
            if t is not None and t.kind == "number":
                # beyond-reference: SHORTEST k top-k walks (the reference
                # raises "TopK has not been implemented yet.",
                # top_k.test:33-49); implemented on the batched BFS by
                # keeping the k best (dist, lex path) walks per (src, dst)
                k = int(self.advance().value)
                if k < 1:
                    raise PGQParseError("SHORTEST k requires k >= 1")
                pat.topk = k
            pat.shortest = True
        if pat.path_variable is None:
            t0, t1 = self.peek(), self.peek(1)
            if (
                t0 is not None
                and t0.kind == "ident"
                and t1 is not None
                and t1.value == "="
            ):
                pat.path_variable = self.ident().lower()
                self.advance()
        # optional path-mode prefix (grammar pgq.gram:40-44).  The reference
        # rejects everything except WALK (match.cpp:96-99); we exceed it and
        # implement TRAIL (no repeated edge), ACYCLIC (no repeated vertex)
        # and SIMPLE (no repeated vertex except first=last closure) — see
        # plans/compiler._apply_path_mode and operators/paths.bfs_all_paths.
        for mode in ("WALK", "TRAIL", "SIMPLE", "ACYCLIC"):
            if self.match_kw(mode):
                pat.path_mode = mode
                self.match_kw("PATH")
                break
        pat.elements.append(self.parse_vertex())
        while not self.at_end() and (self.is_op("-") or self.is_op("<")):
            edge = self.parse_edge()
            vertex = self.parse_vertex()
            pat.elements.append(edge)
            pat.elements.append(vertex)
        return pat


    def _is_label_keyword(self) -> bool:
        """True when the current token is IS introducing a label — i.e. an
        identifier follows that is not WHERE.  `(is:Person)` / `(is)` /
        `(is WHERE ...)` keep binding an element literally named `is`."""
        nxt = self.peek(1)
        return (
            self.is_kw("IS")
            and nxt is not None
            and nxt.kind in ("ident", "qident")
            and not (nxt.kind == "ident" and nxt.value.upper() == "WHERE")
        )

    def parse_vertex(self) -> VertexElement:
        self.expect_op("(")
        if self.peek() is not None and self.peek().kind == "op" and self.peek().value == "(":
            # parenthesized subpath in a vertex position — reference parity
            # (match.cpp:824-826 rejects these before binding)
            raise PGQNotImplementedError("Recursive patterns are not yet supported.")
        binding = None
        label = None
        where = None
        if self.peek() is not None and self.peek().kind in ("ident", "qident"):
            # WHERE starts the filter; IS starts an anonymous `(IS label)`
            # element ONLY when an identifier follows — `(is:Person)` and
            # `(is)` keep binding an element literally named `is`
            if not self.is_kw("WHERE") and not self._is_label_keyword():
                binding = self.ident()
        # `:label` or the SQL/PGQ-standard `IS label` spelling
        # (copy_to_duckpgq.test:57 uses `(a is person ...)`)
        if self.match_op(":"):
            label = self.ident()
        elif self.match_kw("IS"):
            label = self.ident()
        if self.match_kw("WHERE"):
            where = self.capture_expr(lambda p: False)  # runs to the closing paren
        self.expect_op(")")
        anonymous = binding is None
        if binding is None:
            binding = self._fresh_binding("v")
        elif label is None:
            # `(Person)` — a lone identifier is both the binding and the
            # label, matching the reference's grammar (PathElement keeps
            # label == variable_binding; graph_table_keyword.test:22-27 uses
            # `MATCH (Person) COLUMNS (Person.id)`).
            label = binding
        return VertexElement(
            binding=binding.lower(), label=label, where=where, anonymous=anonymous
        )

    def parse_edge(self) -> EdgeElement:
        """Arrow forms:
          -[e]->   right      <-[e]-   left
          -[e]-    any        <-[e]->  both
        plus bracketless -> , <- , - , <-> with anonymous edge.
        """
        left_head = False
        if self.match_op("<"):
            left_head = True
        self.expect_op("-")
        binding = None
        label = None
        where = None
        cost_col = None
        if self.match_op("["):
            if self.is_op("]"):
                # reference PEG grammar requires a binding or label inside
                # edge brackets; bare `-[]->` is a syntax error
                raise PGQParseError(
                    "Empty edge brackets are not allowed; write -> for an "
                    "anonymous edge or name/label the edge inside [...]"
                )
            if self.peek() is not None and self.peek().kind in ("ident", "qident"):
                if not self.is_kw("WHERE") and not self._is_label_keyword():
                    binding = self.ident()
            if self.match_op(":"):
                label = self.ident()
            elif self.match_kw("IS"):
                label = self.ident()
            if self.match_kw("COST"):
                cost_col = self.ident().lower()
            if self.match_kw("WHERE"):
                where = self.capture_expr(lambda p: False)
            self.expect_op("]")
            self.expect_op("-")
        right_head = self.match_op(">")
        if left_head and right_head:
            direction = EDGE_BOTH
        elif left_head:
            direction = EDGE_LEFT
        elif right_head:
            direction = EDGE_RIGHT
        else:
            direction = EDGE_ANY
        anonymous = binding is None
        if binding is None:
            binding = self._fresh_binding("e")
        edge = EdgeElement(
            binding=binding.lower(),
            label=label,
            where=where,
            direction=direction,
            anonymous=anonymous,
            cost_col=cost_col,
        )
        self._parse_quantifier(edge)
        return edge

    def _parse_quantifier(self, edge: EdgeElement) -> None:
        if self.match_op("*"):
            edge.quantified, edge.lower, edge.upper = True, 0, None
        elif self.match_op("+"):
            edge.quantified, edge.lower, edge.upper = True, 1, None
        elif self.match_op("?"):
            edge.quantified, edge.lower, edge.upper = True, 0, 1
        elif self.is_op("{"):
            self.advance()
            edge.quantified = True
            lower = None
            upper = None
            t = self.peek()
            if t is not None and t.kind == "number":
                lower = int(self.advance().value)
            if self.match_op(","):
                t = self.peek()
                if t is not None and t.kind == "number":
                    upper = int(self.advance().value)
            else:
                upper = lower  # {n}
            self.expect_op("}")
            edge.lower = lower if lower is not None else 0
            edge.upper = upper  # None = unbounded

    def parse_column_item(self) -> ColumnItem:
        # binding.*
        t0, t1, t2 = self.peek(), self.peek(1), self.peek(2)
        if (
            t0 is not None
            and t0.kind in ("ident", "qident")
            and t1 is not None
            and t1.value == "."
            and t2 is not None
            and t2.value == "*"
        ):
            binding = self.ident().lower()
            self.advance()
            self.advance()
            return ColumnItem(kind="star", text=f"{binding}.*", binding=binding)
        expr = self.capture_expr(lambda p: p.is_kw("AS") or p.is_op(","))
        if not expr:
            raise PGQParseError("Empty COLUMNS item")
        alias = None
        if self.match_kw("AS"):
            alias = self.ident()
        # classify
        m = re.fullmatch(r"([A-Za-z_][\w$]*)\s*\(\s*([A-Za-z_][\w$]*)\s*\)", expr)
        if m and m.group(1).lower() in PATH_FNS:
            return ColumnItem(
                kind="path_fn",
                text=expr,
                alias=alias or m.group(1).lower(),
                fn=m.group(1).lower(),
                path_var=m.group(2).lower(),
            )
        if re.fullmatch(r"[A-Za-z_][\w$]*", expr):
            return ColumnItem(kind="binding", text=expr, alias=alias, binding=expr.lower())
        # bare binding.prop refs default their output name in the compiler
        # (which also dedups duplicates with _1/_2, nested_subquery.test)
        return ColumnItem(kind="expr", text=expr, alias=alias)


def parse_statement(text: str):
    return Parser(text).parse_statement()


def parse_graph_table_body(text: str) -> MatchExpression:
    p = Parser(text)
    expr = p.parse_graph_table_body()
    if not p.at_end():
        t = p.peek()
        raise PGQParseError(f"Trailing input at {t.value!r}")
    return expr


def parse_match(
    graph_name: str, pattern: str, where: str | None = None, columns: str | None = None
) -> MatchExpression:
    """Programmatic entry: pg.match('(a:L)-[e:K]->(b:L)', columns='a.x AS x')."""
    body = f"{graph_name} MATCH {pattern}"
    if where:
        body += f" WHERE {where}"
    body += f" COLUMNS ({columns or '*'})"
    return parse_graph_table_body(body)
