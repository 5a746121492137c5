"""Property-based guards (hypothesis).

- word_ngrams' zip_with construction equals a plain-Python reference on
  arbitrary generated corpora (guards the linear-time rewrite).
- The PGQ parser never crashes with a non-PGQ exception on generated
  MATCH bodies built from valid fragments; quantifier braces parse to the
  exact (lower, upper) AST fields (l > u is rejected later, at bind time,
  matching the reference's binder-level error).
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckpgq_extension_spark.errors import (
    PGQConstraintError,
    PGQNotImplementedError,
    PGQParseError,
)
from duckpgq_extension_spark.parser.pgq_parser import (
    Parser,
    parse_graph_table_body,
    tokenize,
)

# words without regex-special behavior or quoting needs
_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = text.lower().strip().split()
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(st.lists(_WORD, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=8),
    n=st.integers(min_value=2, max_value=4),
)
def test_word_ngrams_matches_python_reference(spark, docs, n):
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.functions.text import word_ngrams

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, text string")
    got = {
        r["id"]: list(r["g"])
        for r in df.select("id", word_ngrams(F.col("text"), n).alias("g")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _py_ngrams(d, n), (d, n)


_LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(a=_LABEL, e=_LABEL, b=_LABEL, lo=st.integers(0, 5), hi=st.integers(0, 5))
def test_parser_quantifier_bounds(a, e, b, lo, hi):
    body = f"g MATCH (x:{a})-[y:{e}]->{{{lo},{hi}}}(z:{b}) COLUMNS (x.k AS k)"
    # the parser accepts any {l,u}; l > u is a bind-time constraint error
    # (reference parity: the binder, not the grammar, rejects it)
    expr = parse_graph_table_body(body)
    edge = expr.patterns[0].elements[1]
    assert (edge.quantified, edge.lower, edge.upper) == (True, lo, hi)


@settings(max_examples=200, deadline=None)
@given(
    a=_LABEL,
    e=_LABEL,
    b=_LABEL,
    arrow=st.sampled_from(["->", "<-", "-"]),
    cols=st.lists(_LABEL, min_size=1, max_size=3),
)
def test_parser_roundtrips_generated_patterns(a, e, b, arrow, cols):
    """Any pattern assembled from valid fragments parses into the expected
    shape or raises a typed PGQ error — never an arbitrary exception."""
    col_sql = ", ".join(f"x.{c} AS {c}{i}" for i, c in enumerate(cols))
    left, right = ("-", arrow) if arrow != "<-" else ("<-", "-")
    body = f"g MATCH (x:{a}){left}[y:{e}]{right}(z:{b}) COLUMNS ({col_sql})"
    try:
        expr = parse_graph_table_body(body)
    except (PGQParseError, PGQNotImplementedError, PGQConstraintError):
        return  # typed rejection is acceptable (e.g. reserved word collision)
    assert expr.graph_name == "g"
    pat = expr.patterns[0]
    assert len(pat.elements) == 3
    assert len(expr.columns) == len(cols)


@settings(max_examples=200, deadline=None)
@given(s=st.text(max_size=60))
def test_tokenizer_total(s):
    """tokenize either succeeds or raises PGQParseError — no other
    exception type, no hang — on arbitrary input."""
    try:
        toks = tokenize(s)
    except PGQParseError:
        return
    # every non-ws, non-comment character is covered by some token
    stripped = re.sub(r"\s+", "", re.sub(r"--[^\n]*|/\*(?s:.*?)\*/", "", s))
    assert sum(len(t.value) for t in toks) >= len(stripped) - s.count("''") * 2


@settings(max_examples=100, deadline=None)
@given(s=st.text(alphabet="abc()'\"`-/*,. \n", max_size=40))
def test_statement_parser_total(s):
    """Parser.parse_statement on fuzz never raises a non-PGQ exception."""
    try:
        Parser(s).parse_statement()
    except (PGQParseError, PGQNotImplementedError, PGQConstraintError):
        pass


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=25,
    )
)
def test_dedup_clusters_equals_union_find(spark, pairs):
    """dedup_clusters over an arbitrary injected pair graph always equals a
    plain union-find closure: same membership, canonical = min member,
    cluster_size = component size, singletons absent."""
    from duckpgq_extension_spark.operators.dedup import dedup_clusters

    # union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in pairs:
        union(a, b)
    comp = {}
    for v in list(parent):
        comp.setdefault(find(v), set()).add(v)
    want = {}
    for members in comp.values():
        if len(members) >= 2:
            mn = min(members)
            for v in members:
                want[v] = (mn, len(members))

    ids = sorted({x for p in pairs for x in p})
    docs = spark.createDataFrame([(i, f"d{i}") for i in ids], "doc_id long, text string")
    pdf = spark.createDataFrame([(a, b) for a, b in pairs], "id_a long, id_b long")
    got = {r["doc_id"]: (r["canonical_id"], r["cluster_size"])
           for r in dedup_clusters(docs, "doc_id", "text", pairs=pdf).collect()}
    assert got == want
