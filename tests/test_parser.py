import pytest

from duckpgq_extension_spark.errors import PGQNotImplementedError, PGQParseError
from duckpgq_extension_spark.parser.ast import (
    EDGE_ANY,
    EDGE_BOTH,
    EDGE_LEFT,
    EDGE_RIGHT,
    EdgeElement,
    VertexElement,
)
from duckpgq_extension_spark.parser.pgq_parser import (
    parse_graph_table_body,
    parse_statement,
)


def test_create_property_graph_basic():
    stmt = parse_statement(
        """
        CREATE PROPERTY GRAPH pg
        VERTEX TABLES (
            Student PROPERTIES (id, name) LABEL Person,
            School LABEL School
        )
        EDGE TABLES (
            know SOURCE KEY (src) REFERENCES Student (id)
                 DESTINATION KEY (dst) REFERENCES Student (id)
                 LABEL Knows
        )
        """
    )
    assert stmt.name == "pg"
    assert len(stmt.vertex_tables) == 2
    assert stmt.vertex_tables[0].properties == {"id": "id", "name": "name"}
    assert stmt.vertex_tables[0].main_label == "Person"
    e = stmt.edge_tables[0]
    assert e.source_reference == "Student"
    assert e.source_fk == ["src"] and e.source_pk == ["id"]
    assert e.destination_fk == ["dst"] and e.destination_pk == ["id"]


def test_create_with_inheritance_and_except():
    stmt = parse_statement(
        """
        CREATE OR REPLACE PROPERTY GRAPH g
        VERTEX TABLES (
            Organisation PROPERTIES ARE ALL COLUMNS EXCEPT (url)
                LABEL Organisation IN typemask (company, university)
        )
        """
    )
    assert stmt.or_replace
    t = stmt.vertex_tables[0]
    assert t.discriminator == "typemask"
    assert t.sub_labels == ["company", "university"]
    assert t.except_columns == ["url"]


def test_drop():
    stmt = parse_statement("DROP PROPERTY GRAPH IF EXISTS pg")
    assert stmt.name == "pg" and stmt.if_exists


def test_match_directions():
    for arrow, d in [
        ("-[e:K]->", EDGE_RIGHT),
        ("<-[e:K]-", EDGE_LEFT),
        ("-[e:K]-", EDGE_ANY),
        ("<-[e:K]->", EDGE_BOTH),
    ]:
        expr = parse_graph_table_body(
            f"pg MATCH (a:P){arrow}(b:P) COLUMNS (a.name)"
        )
        edge = expr.patterns[0].elements[1]
        assert isinstance(edge, EdgeElement)
        assert edge.direction == d, arrow
        assert edge.binding == "e" and edge.label == "K"


def test_match_quantifiers():
    cases = {
        "*": (0, None),
        "+": (1, None),
        "?": (0, 1),
        "{3}": (3, 3),
        "{1,4}": (1, 4),
        "{,4}": (0, 4),
    }
    for q, (lo, hi) in cases.items():
        expr = parse_graph_table_body(
            f"pg MATCH (a:P)-[e:K]->{q}(b:P) COLUMNS (a.name)"
        )
        edge = expr.patterns[0].elements[1]
        assert edge.quantified and (edge.lower, edge.upper) == (lo, hi), q


def test_match_where_and_columns():
    expr = parse_graph_table_body(
        "pg MATCH (a:Person WHERE a.id = 0)-[k:Knows]->(b:Person) "
        "WHERE a.name = 'Daniel' AND b.id > 1 "
        "COLUMNS (a.name AS a_name, b.*, k, avg(a.id) AS m)"
    )
    v = expr.patterns[0].elements[0]
    assert isinstance(v, VertexElement) and v.where == "a.id = 0"
    assert expr.where == "a.name = 'Daniel' AND b.id > 1"
    kinds = [c.kind for c in expr.columns]
    assert kinds == ["expr", "star", "binding", "expr"]
    assert expr.columns[0].alias == "a_name"
    assert expr.columns[3].alias == "m"


def test_shortest_path_syntax():
    expr = parse_graph_table_body(
        "pg MATCH p = ANY SHORTEST (a:Person)-[k:Knows]->*(b:Person) "
        "COLUMNS (a.id, element_id(p), path_length(p), vertices(p), edges(p))"
    )
    pat = expr.patterns[0]
    assert pat.shortest and pat.path_variable == "p"
    fns = [c.fn for c in expr.columns if c.kind == "path_fn"]
    assert fns == ["element_id", "path_length", "vertices", "edges"]


def test_multiple_patterns_shared_binding():
    expr = parse_graph_table_body(
        "pg MATCH (a:P)-[e1:K]->(b:P), (b:P)-[e2:K]->(c:P) COLUMNS (a.id)"
    )
    assert len(expr.patterns) == 2


def test_beyond_reference_modifiers_parse():
    # ALL SHORTEST now parses (beyond-reference all-minimal-paths
    # enumeration; the reference rejects it, match.cpp:81-104)
    expr = parse_graph_table_body(
        "pg MATCH ALL SHORTEST (a:P)-[e:K]->*(b:P) COLUMNS (a.id)"
    )
    assert expr.patterns[0].all_shortest and expr.patterns[0].shortest
    # SHORTEST k parses too (beyond-reference top-k walks; the reference
    # rejects it, top_k.test:33-49)
    expr = parse_graph_table_body(
        "pg MATCH SHORTEST 3 (a:P)-[e:K]->*(b:P) COLUMNS (a.id)"
    )
    assert expr.patterns[0].topk == 3 and expr.patterns[0].shortest


def test_parse_errors():
    with pytest.raises(PGQParseError):
        parse_statement("CREATE PROPERTY pg")
    with pytest.raises(PGQParseError):
        parse_graph_table_body("pg MATCH (a:P COLUMNS (a.id)")


def test_is_label_spelling():
    """The SQL/PGQ-standard `IS` label form parses identically to `:`
    (copy_to_duckpgq.test:57-60 uses `(a is person WHERE ...)`)."""
    expr = parse_graph_table_body(
        "pg MATCH (a IS person WHERE a.id = 5)-[k is knows]->(b is Person) "
        "COLUMNS (a.firstName, b.id AS bid)"
    )
    v0, e, v1 = expr.patterns[0].elements
    assert v0.binding == "a" and v0.label == "person"
    assert v0.where is not None
    assert e.binding == "k" and e.label == "knows"
    assert v1.binding == "b" and v1.label == "Person"


def test_is_label_anonymous_elements():
    """Anonymous `(IS label)` / `-[IS label]->` forms: IS must not be
    consumed as the binding."""
    expr = parse_graph_table_body(
        "pg MATCH (IS Person)-[is knows]->(b:Person) COLUMNS (b.id)"
    )
    v0, e, v1 = expr.patterns[0].elements
    assert v0.anonymous and v0.label == "Person"
    assert e.anonymous and e.label == "knows"
    assert v1.binding == "b"


def test_is_binding_name_still_parses():
    """Regression: elements literally named `is` with an explicit label
    or alone must keep parsing — IS is a label keyword only when an
    identifier follows."""
    expr = parse_graph_table_body(
        "pg MATCH (is:Person)-[is2:knows]->(is) COLUMNS (is.id)"
    )
    v0, e, v1 = expr.patterns[0].elements
    assert v0.binding == "is" and v0.label == "Person"
    assert v1.binding == "is"
    expr2 = parse_graph_table_body(
        "pg MATCH (is WHERE is.id = 1)-[:knows]->(b:Person) COLUMNS (b.id)"
    )
    assert expr2.patterns[0].elements[0].binding == "is"
