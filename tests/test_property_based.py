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


# ---- round-4 algorithm cross-checks vs pure-Python oracles ----------------


def _gen_digraph(seed: int, n: int = 24, m: int = 60):
    """Deterministic pseudo-random digraph from an arithmetic generator."""
    edges = set()
    x = seed * 2654435761 % (2**31)
    for _ in range(m):
        x = (1103515245 * x + 12345) % (2**31)
        s = x % n
        x = (1103515245 * x + 12345) % (2**31)
        d = x % n
        if s != d:
            edges.add((s, d))
    return sorted(edges)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_scc_random_seeds_vs_tarjan(spark, seed):
    from .test_algorithms2 import _tarjan_scc
    from duckpgq_extension_spark import algorithms as A

    el = _gen_digraph(seed)
    edges = spark.createDataFrame(el, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(24)], "vid long")
    got = {r.vid: r.scc_id for r in A.strongly_connected_component(edges, verts).collect()}
    assert got == _tarjan_scc(24, el), seed


@pytest.mark.parametrize("seed", [5, 42])
def test_closeness_vs_python_bfs(spark, seed):
    from collections import deque

    from duckpgq_extension_spark import algorithms as A

    el = _gen_digraph(seed)
    adj = {}
    for s, d in el:
        adj.setdefault(s, []).append(d)
    edges = spark.createDataFrame(el, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (7,)], "vid long")
    got = {r.vid: (r.reached, r.closeness) for r in
           A.closeness_centrality(edges, seeds).collect()}
    for s in (0, 7):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        total = sum(dist.values())
        expect = ((len(dist) - 1) / total) if total else 0.0
        assert got[s][0] == len(dist) and got[s][1] == pytest.approx(expect), seed


@pytest.mark.parametrize("seed", [11, 23])
def test_temporal_reach_vs_python(spark, seed):
    """Earliest arrival cross-checked against an exhaustive Python
    label-correcting relaxation over timestamped edges."""
    from duckpgq_extension_spark.operators.paths import temporal_reachability

    el = _gen_digraph(seed, n=16, m=40)
    tel = [(s, d, (s * 7 + d * 13 + seed) % 20) for s, d in el]
    edges = spark.createDataFrame(tel, "src long, dst long, ts long")
    seeds = spark.createDataFrame([(1,), (2,)], "vid long")
    got = {(r.src, r.dst): r.arrival for r in
           temporal_reachability(edges, seeds).collect()}
    for s in (1, 2):
        best = {s: 0}
        changed = True
        while changed:
            changed = False
            for u, v, ts in tel:
                if u in best and ts >= best[u] and ts < best.get(v, 10**9):
                    best[v] = ts
                    changed = True
        for v, a in best.items():
            assert got.get((s, v)) == a, (seed, s, v)
        assert {d for (ss, d) in got if ss == s} == set(best), (seed, s)


# -- round-7 primitives ---------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    scores=st.lists(st.integers(0, 9), min_size=1, max_size=40),
    n_bins=st.integers(1, 6),
)
def test_global_rank_and_curriculum_vs_python(spark, scores, n_bins):
    """_global_rank equals the sorted index, and curriculum_bins' phase
    equals SQL ntile semantics, on arbitrary (score, id) data with ties."""
    from duckpgq_extension_spark.operators.corpus import _global_rank, curriculum_bins
    from pyspark.sql import functions as F

    rows = [(i, float(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    ranked, n = _global_rank(
        df, [F.col("q").asc(), F.col("doc_id").asc()], "r"
    )
    got = {r["doc_id"]: r["r"] for r in ranked.collect()}
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    exp = {doc: i + 1 for i, (doc, _) in enumerate(ordered)}
    assert got == exp and n == len(rows)
    phases = {
        r["doc_id"]: r["phase"]
        for r in curriculum_bins(df, "doc_id", "q", n_bins=n_bins).collect()
    }
    q, rem = divmod(len(rows), n_bins)
    exp_phase, idx = {}, 0
    for b in range(1, n_bins + 1):
        for _ in range(q + 1 if b <= rem else q):
            exp_phase[ordered[idx][0]] = b
            idx += 1
    assert phases == exp_phase


def _py_substring_dedup(docs, window):
    """Plain-python reference for exact_substring_dedup."""
    wins = {}
    for doc_id, text in docs:
        t = text.lower().strip().split()
        for p in range(len(t) - window + 1):
            wins.setdefault(tuple(t[p : p + window]), []).append((doc_id, p + 1))
    dropped = set()
    for occs in wins.values():
        if len(occs) > 1:
            for o in sorted(occs)[1:]:
                dropped.add(o)
    out = {}
    for doc_id, text in docs:
        t = text.lower().strip().split()
        covered = set()
        for (d, p) in dropped:
            if d == doc_id:
                covered.update(range(p, p + window))
        kept = [tok for i, tok in enumerate(t, 1) if i not in covered]
        out[doc_id] = (" ".join(kept), len(kept), len(t) - len(kept))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_exact_substring_dedup_vs_python(spark, docs):
    """Tiny alphabet forces heavy window collisions — the dedup result
    must equal the plain-python reference exactly."""
    from duckpgq_extension_spark.operators import dedup

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.exact_substring_dedup(df, "doc_id", "text", window=3).collect()
    }
    assert got == _py_substring_dedup(rows, 3)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    vocab_words=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
)
def test_apply_vocab_vs_python(spark, docs, vocab_words):
    """apply_vocab equals the plain-python mapping in both OOV modes on
    arbitrary corpora (including empty documents)."""
    from duckpgq_extension_spark.operators.corpus import apply_vocab

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vmap = {w: i for i, w in enumerate(sorted(vocab_words))}
    vocab = spark.createDataFrame(list(vmap.items()), "token string, token_id long")

    def ref(oov):
        # NB: the engine's tokens('') convention is [''] — one empty
        # token (string_split_regex semantics, mirrored by every SQL
        # oracle) — which re.split reproduces and str.split does not
        out = set()
        for doc_id, text in rows:
            for pos, tok in enumerate(re.split(r"\s+", text.lower().strip()), 1):
                if tok in vmap:
                    out.add((doc_id, pos, vmap[tok]))
                elif oov is not None:
                    out.add((doc_id, pos, oov))
        return out

    got_drop = {
        (r["doc_id"], r["pos"], r["token_id"])
        for r in apply_vocab(df, vocab).collect()
    }
    assert got_drop == ref(None)
    got_oov = {
        (r["doc_id"], r["pos"], r["token_id"])
        for r in apply_vocab(df, vocab, oov_id=-1).collect()
    }
    assert got_oov == ref(-1)


# --------------------------------------------------- round-7c operators


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(_WORD, min_size=1, max_size=6).map(lambda w: " ".join(w)),
    min_size=2, max_size=6, unique=True,
))
def test_edit_distance_pairs_scores_match_python(spark, texts):
    """Every emitted pair's edit_sim equals the plain-python Levenshtein
    similarity (candidates are LSH-dependent; scores must be exact)."""
    from pyspark.sql import Row

    from duckpgq_extension_spark.operators import dedup

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = dedup.edit_distance_pairs(docs, "doc_id", "text", n=1, threshold=0.0)
    for r in out.collect():
        a, b = texts[r["id_a"]], texts[r["id_b"]]
        want = round(1.0 - _py_lev(a, b) / max(len(a), len(b), 1), 6)
        assert r["edit_sim"] == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.floats(min_value=0.1, max_value=50.0, allow_nan=False),
             min_size=3, max_size=25),
    st.integers(min_value=1, max_value=5),
)
def test_weighted_sample_matches_python_ares_property(spark, weights, k):
    """The chosen id set equals the plain-python Efraimidis-Spirakis
    selection for arbitrary weights and k."""
    import hashlib

    from duckpgq_extension_spark.operators import corpus

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(r["doc_id"]
                 for r in corpus.weighted_sample(df, "doc_id", "w", k=k).collect())
    M = 1 << 20

    def pri(i, w):
        h = int(hashlib.md5(f"{i}|ws".encode()).hexdigest()[:15], 16) % M
        return ((h + 0.5) / M) ** (1.0 / w)

    want = sorted(i for i, _ in
                  sorted(rows, key=lambda t: (-pri(*t), t[0]))[:k])
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9), st.integers(1, 30)),
    min_size=1, max_size=30,
))
def test_rrf_fusion_matches_python(spark, triples):
    """rrf_score equals the python sum of 1/(k+rank) per (query, item)
    across lists (here: one list, arbitrary duplicates collapse is NOT
    expected — build unique (q,i) per list)."""
    from duckpgq_extension_spark.operators import similarity

    seen, rows = set(), []
    for q, i, rk in triples:
        if (q, i) not in seen:
            seen.add((q, i))
            rows.append((q, i, rk))
    df = spark.createDataFrame(rows, "query_id long, item_id long, rank long")
    out = similarity.rrf_fusion([df, df], k=60)
    want = {(q, i): round(2 * (1.0 / (60.0 + rk)), 6) for q, i, rk in rows}
    got = {(r["query"], r["item"]): r["rrf_score"] for r in out.collect()}
    assert got == want


# ---- heterogeneous variable-length paths vs a Python BFS reference ----

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 4)),
        min_size=1, max_size=25,
    ),
    st.integers(0, 6),
)
def test_hetero_var_length_matches_python_bfs(spark, edges_ab, seed):
    """Random bipartite A->B edge sets (A and B key ranges deliberately
    OVERLAP): undirected {1,3} distances from one A-seed must equal a
    plain-Python BFS over the (table, key)-tagged union graph — the
    semantics the table-tagged surrogates implement."""
    from duckpgq_extension_spark import PGQSession

    a_ids = sorted({a for a, _ in edges_ab} | {seed})
    b_ids = sorted({b for _, b in edges_ab})
    spark.createDataFrame([(i,) for i in a_ids], "aid long").createOrReplaceTempView("hp_a")
    spark.createDataFrame(
        [(i,) for i in b_ids] or [(999,)], "bid long"
    ).createOrReplaceTempView("hp_b")
    spark.createDataFrame(
        list({(a, b) for a, b in edges_ab}), "sa long, db long"
    ).createOrReplaceTempView("hp_e")
    s = PGQSession(spark)
    s.execute(
        """CREATE OR REPLACE PROPERTY GRAPH hp
        VERTEX TABLES ( hp_a PROPERTIES (aid) LABEL A, hp_b PROPERTIES (bid) LABEL B )
        EDGE TABLES ( hp_e SOURCE KEY (sa) REFERENCES hp_a (aid)
                      DESTINATION KEY (db) REFERENCES hp_b (bid) LABEL AB )"""
    )
    df = s.graph_table(
        f"""hp MATCH (x:A WHERE x.aid = {seed})-[e:AB]-{{1,3}}(y:A)
            COLUMNS (y.aid AS y_id, CAST(e.dist AS BIGINT) AS dist)"""
    )
    got = sorted((r.y_id, r.dist) for r in df.collect())
    # Python BFS over the tagged union graph
    adj: dict = {}
    for a, b in set(edges_ab):
        adj.setdefault(("a", a), set()).add(("b", b))
        adj.setdefault(("b", b), set()).add(("a", a))
    dist = {("a", seed): 0}
    frontier = [("a", seed)]
    d = 0
    while frontier and d < 3:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):  # noqa: B905
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    exp = sorted(
        (k, dv) for (tag, k), dv in dist.items()
        if tag == "a" and 1 <= dv <= 3
    )
    assert got == exp
