import pytest
from pyspark.sql import Row

from duckpgq_extension_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the old river"),  # near dup
        (4, "completely different content about spark sql engines and joins"),
        (5, "spark sql engines and joins are discussed in this different text"),
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in base])


def test_exact_duplicates(corpus):
    got = dedup.exact_duplicates(corpus, "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["keep_id"] == 1 and got[0]["n_copies"] == 2


def test_deduplicate_exact(corpus):
    kept = dedup.deduplicate_exact(corpus, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6]


def test_ngram_jaccard_pairs(corpus):
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in got and 0.3 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_minhash_signatures_shape(corpus):
    sig = dedup.minhash_signatures(corpus, "doc_id", "text", n=3, num_perm=16)
    rows = sig.collect()
    assert all(len(r["sig"]) == 16 for r in rows)
    by_id = {r["id"]: r["sig"] for r in rows}
    assert by_id[1] == by_id[2]  # identical text -> identical signature


def test_minhash_lsh_pairs(corpus):
    pairs = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", n=3, num_perm=16, bands=8, threshold=0.4
    )
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got  # near dup estimated above threshold
    assert (1, 6) not in got


def test_simhash_near_dup(corpus):
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(corpus, "doc_id", "text").collect()}
    assert sh[1] == sh[2]
    ham13 = bin(sh[1] ^ sh[3]).count("1")
    ham14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated


def test_simhash_pairs(corpus):
    pairs = dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got


def test_on_real_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=5, threshold=0.8, max_doc_freq=100
    )
    assert pairs.count() >= 0  # executes end-to-end on the real corpus


def test_bucket_pairs_hot_path_equals_plain_join(spark):
    """Triangle-salted hot-bucket pair generation returns exactly the
    plain self-join's pair set (one 60-member hot bucket to force the
    salted path, one cold bucket, one singleton)."""
    from pyspark.sql import functions as F
    from duckpgq_extension_spark.operators.dedup import _bucket_pairs

    data = (
        [("hot", 1000 + i) for i in range(60)]
        + [("cold", i) for i in range(5)]
        + [("single", 7777)]
    )
    df = spark.createDataFrame(data, "bh string, id long")
    got = _bucket_pairs(df, ["bh"], hot_threshold=16, chunks=4)
    plain = (
        df.alias("l")
        .join(df.alias("r"), "bh")
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    assert got.count() == 60 * 59 // 2 + 5 * 4 // 2


def test_minhash_lsh_mass_duplicate_corpus(spark):
    """10^3 identical docs: every band bucket holds all 1000 docs — the
    pre-salt plan put the full 10^6 pair space on one reducer.  The salted
    join must still emit exactly C(1000,2) pairs at est_jaccard 1.0, and
    the triangle split bounds any single join cell to ~(g/chunks)^2."""
    from pyspark.sql import functions as F
    from duckpgq_extension_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again").alias("text"),
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_perm=16, bands=4)
    assert pairs.count() == 1000 * 999 // 2
    assert pairs.agg(F.min("est_jaccard")).first()[0] == 1.0

    # the salted key space spreads one 1000-member bucket over
    # chunks*(chunks+1)/2 cells, each side bounded by ~g/chunks rows
    chunks = 8
    cell_sizes = (
        spark.range(0, 1000)
        .select(F.pmod(F.xxhash64(F.col("id")), F.lit(chunks)).alias("c"))
        .groupBy("c")
        .count()
    )
    assert cell_sizes.agg(F.max("count")).first()[0] < 1000 / chunks * 2


def test_dedup_clusters_transitive(spark):
    """Similarity is not transitive: A~B and B~C with A!~C must still
    land in ONE cluster (the whole point of the component step over
    pairwise dedup).  Pairs are injected directly so the golden is exact."""
    from pyspark.sql import functions as F
    from duckpgq_extension_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        # component {1,2,3} via a chain (1-2, 2-3; no 1-3 edge),
        # component {5,6}; docs 0 and 4 are clean
        [(1, 2), (2, 3), (5, 6)],
        "id_a long, id_b long",
    )
    got = dedup_clusters(docs, "doc_id", "text", pairs=pairs)
    rows = {r["doc_id"]: (r["canonical_id"], r["cluster_size"]) for r in got.collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 5: (5, 2), 6: (5, 2)}


def test_deduplicate_lsh_keeps_canonical(spark):
    """deduplicate_lsh drops exactly the non-canonical cluster members."""
    from duckpgq_extension_spark.operators.dedup import deduplicate_lsh

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (3, "completely different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    kept = deduplicate_lsh(
        docs, "doc_id", "text", n=2, num_perm=16, bands=8, threshold=0.5
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 0/1/2 are near-dups -> one cluster, canonical 0 survives; 3 untouched
    assert ids == [0, 3]


def test_dedup_clusters_star_coarsens_pairs(spark):
    """connectivity="star" links every band-bucket to its min member —
    components must be a coarsening (superset-union) of the thresholded
    all-pairs components under the same banding, and identical docs must
    land in one cluster either way."""
    from duckpgq_extension_spark.operators.dedup import dedup_clusters

    rows = (
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)]
        + [(10 + i, "one two three four five six seven eight") for i in range(3)]
        + [(100, "completely unrelated text nothing shared here at all")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=2, num_perm=16, bands=8)
    pairs_mode = {
        r.doc_id: r.canonical_id
        for r in dedup_clusters(
            docs, "doc_id", "text", threshold=0.5, **kw
        ).collect()
    }
    star_mode = {
        r.doc_id: r.canonical_id
        for r in dedup_clusters(
            docs, "doc_id", "text", connectivity="star", **kw
        ).collect()
    }
    # identical docs cluster identically in both modes
    assert {pairs_mode[i] for i in range(4)} == {0}
    assert {star_mode[i] for i in range(4)} == {0}
    assert {pairs_mode[i] for i in (10, 11, 12)} == {10}
    assert {star_mode[i] for i in (10, 11, 12)} == {10}
    # coarsening: every pairs-mode co-cluster pair is co-clustered in star
    for a in pairs_mode:
        for b in pairs_mode:
            if pairs_mode[a] == pairs_mode[b]:
                assert a in star_mode and b in star_mode
                assert star_mode[a] == star_mode[b]


def test_dedup_clusters_connectivity_validation(spark):
    import pytest
    from duckpgq_extension_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_clusters(docs, "doc_id", "text", connectivity="mesh")


def test_dedup_clusters_star_rejects_threshold(spark):
    """connectivity='star' has no per-pair jaccard to threshold: passing
    one must raise instead of being silently ignored (round-6 advice)."""
    import pytest
    from duckpgq_extension_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="star"):
        dedup_clusters(
            docs, "doc_id", "text", connectivity="star", threshold=0.9
        )


def test_cross_corpus_dedup_exact_and_near(spark):
    """Snapshot-increment dedup: exact drops byte-identical re-crawls,
    near drops band-bucket collisions; survivors keep the new corpus's
    schema."""
    from duckpgq_extension_spark.operators.dedup import cross_corpus_dedup

    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "unique fresh content here"),
         (12, "alpha beta gamma delta epsilon"), (13, "solo")],
        "doc_id long, text string")
    ref = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "other old page")],
        "doc_id long, text string")
    ex = sorted(r.doc_id for r in cross_corpus_dedup(new, ref, "doc_id", "text").collect())
    assert ex == [11, 12, 13]  # only the exact copy of ref#1 drops
    near = sorted(r.doc_id for r in cross_corpus_dedup(
        new, ref, "doc_id", "text", mode="near").collect())
    # 12 shares most shingles with ref#1 -> band collision; 13 has no
    # 2-gram shingles -> passes through
    assert near == [11, 13]
    # scored mode at an unreachable threshold keeps near-misses
    scored = sorted(r.doc_id for r in cross_corpus_dedup(
        new, ref, "doc_id", "text", mode="near", threshold=0.99).collect())
    assert 12 in scored and 10 not in scored
    import pytest
    with pytest.raises(ValueError, match="mode"):
        cross_corpus_dedup(new, ref, "doc_id", "text", mode="fuzzy")


def test_dedup_paragraphs_first_occurrence_wins(spark):
    """Corpus-global paragraph dedup: a repeated paragraph survives only
    at its minimum (doc, position) occurrence; per-doc text is
    reassembled in original order."""
    from duckpgq_extension_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, ["intro one", "COMMON FOOTER", "body a"]),
         (2, ["body b", "COMMON FOOTER"]),
         (3, ["COMMON FOOTER", "COMMON FOOTER"])],
        "doc_id long, paras array<string>")
    out = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in dedup_paragraphs(docs, "doc_id", "paras").collect()}
    assert out[1] == ("intro one\nCOMMON FOOTER\nbody a", 3, 0)
    assert out[2] == ("body b", 1, 1)
    assert out[3] == ("", 0, 2)  # doc of pure boilerplate empties out


def test_deduplicate_lsh_keep_longest(spark):
    """keep='longest' retains the fullest cluster member (token count
    desc, id asc tie-break) instead of the minimum id."""
    import pytest
    from duckpgq_extension_spark.operators.dedup import (
        dedup_clusters, deduplicate_lsh)

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"),
         (2, "a b c d e f g h longer version extra tokens"),
         (3, "totally different content words")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    clusters = dedup_clusters(docs, "doc_id", "text", pairs=pairs)
    kept = sorted(r.doc_id for r in deduplicate_lsh(
        docs, "doc_id", "text", clusters=clusters, keep="longest").collect())
    assert kept == [2, 3]
    keptm = sorted(r.doc_id for r in deduplicate_lsh(
        docs, "doc_id", "text", clusters=clusters).collect())
    assert keptm == [1, 3]
    with pytest.raises(ValueError, match="keep"):
        deduplicate_lsh(docs, "doc_id", "text", clusters=clusters, keep="best")


def test_minhash_signatures_inrow_equals_groupby(spark):
    """The shuffle-free in-row signature path and the explode+groupBy
    path (forced via max_doc_freq) compute identical signatures and both
    drop shingle-less docs."""
    from duckpgq_extension_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b c d"), (3, "b c d e f"), (4, "")],
        "doc_id long, text string")
    a = {(r.id, tuple(r.sig)) for r in minhash_signatures(
        docs, "doc_id", "text", n=2, num_perm=8).collect()}
    b = {(r.id, tuple(r.sig)) for r in minhash_signatures(
        docs, "doc_id", "text", n=2, num_perm=8, max_doc_freq=10**9).collect()}
    assert a == b
    assert {i for i, _ in a} == {2, 3}


def test_dedup_paragraphs_drop_above_threshold(spark):
    """drop_above=k: paragraphs with corpus frequency > k vanish entirely
    (no surviving first copy); others keep first-occurrence-wins."""
    from duckpgq_extension_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, ["BOILER", "keep one", "unique a"]),
         (2, ["BOILER", "keep one"]),
         (3, ["BOILER"])],
        "doc_id long, paras array<string>")
    out = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in dedup_paragraphs(
               docs, "doc_id", "paras", drop_above=2).collect()}
    # BOILER freq 3 > 2 -> gone everywhere; "keep one" freq 2 -> first wins
    assert out[1] == ("keep one\nunique a", 2, 1)
    assert out[2] == ("", 0, 2)
    assert out[3] == ("", 0, 1)


def test_cross_corpus_dedup_empty_reference(spark):
    """An empty reference corpus drops nothing in any mode."""
    from duckpgq_extension_spark.operators.dedup import cross_corpus_dedup

    new = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    ref = spark.createDataFrame([], "doc_id long, text string")
    for kw in ({"mode": "exact"}, {"mode": "near"},
               {"mode": "near", "threshold": 0.5}):
        got = sorted(r.doc_id for r in cross_corpus_dedup(
            new, ref, "doc_id", "text", **kw).collect())
        assert got == [1, 2], (kw, got)


# -- containment --------------------------------------------------------------


def _containment_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base + " and runs away very fast indeed"),
            (3, "completely different words live here nothing shared at all"),
            (4, "completely different words live here nothing shared at all"),
        ],
        "doc_id long, text string",
    )


def test_containment_pairs_detects_substring_doc(spark):
    df = _containment_corpus(spark)
    rows = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_pairs(df, "doc_id", "text", n=2, threshold=0.9).collect()
    }
    # doc 1's 8 bigrams all appear in doc 2 -> C(1->2) = 1.0; the reverse
    # direction is 8/14 < 0.9; docs 3/4 are exact copies -> both directions
    assert rows[(1, 2)] == pytest.approx(1.0)
    assert (2, 1) not in rows
    assert rows[(3, 4)] == pytest.approx(1.0)
    assert rows[(4, 3)] == pytest.approx(1.0)
    assert set(rows) == {(1, 2), (3, 4), (4, 3)}


def test_containment_pairs_matches_brute_force(spark):
    """Prefix filtering is lossless: every ordered pair the brute-force
    (python) computation finds must come back, values equal."""
    docs = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(6 + i % 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    def sh(t):
        ws = t.split()
        return {" ".join(ws[i:i+2]) for i in range(len(ws) - 1)}
    exp = {}
    for ia, ta in docs:
        for ib, tb in docs:
            if ia == ib:
                continue
            a, b = sh(ta), sh(tb)
            c = len(a & b) / len(a)
            if round(c, 6) >= 0.5:
                exp[(ia, ib)] = round(c, 6)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    assert got == {k: pytest.approx(v) for k, v in exp.items()}


def test_deduplicate_contained_keeps_superset(spark):
    df = _containment_corpus(spark)
    kept = sorted(
        r["doc_id"]
        for r in dedup.deduplicate_contained(df, "doc_id", "text", n=2, threshold=0.9).collect()
    )
    # doc 1 contained in the larger doc 2 -> dropped; docs 3/4 mutually
    # contained at equal size -> lowest id (3) survives
    assert kept == [2, 3]


def test_containment_candidate_cap(spark):
    """max_candidates_per_doc keeps only the largest candidate containers
    per contained doc — dedup decisions survive, pair enumeration shrinks."""
    base = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " i j"),
            (3, base + " i j k l"),
            (4, base + " i j k l m n"),
        ],
        "doc_id long, text string",
    )
    full = dedup.containment_pairs(df, "doc_id", "text", n=2, threshold=0.9)
    capped = dedup.containment_pairs(
        df, "doc_id", "text", n=2, threshold=0.9, max_candidates_per_doc=1
    )
    full_a = {r["id_a"] for r in full.collect()}
    capped_rows = capped.collect()
    # every doc with ANY container still shows up (its largest container
    # necessarily contains it here), but with exactly one pair each
    assert {r["id_a"] for r in capped_rows} == full_a
    from collections import Counter
    assert max(Counter(r["id_a"] for r in capped_rows).values()) == 1
    assert capped.count() < full.count()


def test_containment_strategies_agree(spark):
    """'count' and 'prefix' are two exact plans for the same definition —
    identical output on the same corpus (auto picks one of them)."""
    docs = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(6 + i % 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kw = dict(n=2, threshold=0.5)
    a = {tuple(r) for r in dedup.containment_pairs(df, "doc_id", "text", strategy="prefix", **kw).collect()}
    b = {tuple(r) for r in dedup.containment_pairs(df, "doc_id", "text", strategy="count", **kw).collect()}
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="strategy"):
        dedup.containment_pairs(df, "doc_id", "text", strategy="nope", **kw)


# -- exact substring (passage) dedup -------------------------------------------


def test_exact_substring_dedup_removes_shared_passage(spark):
    passage = "p1 p2 p3 p4 p5 p6"
    df = spark.createDataFrame(
        [
            (1, "intro one two " + passage + " outro alpha"),
            (2, "different start here " + passage + " unrelated tail words"),
            (3, "no shared content at all in this one"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.exact_substring_dedup(df, "doc_id", "text", window=4).collect()}
    # doc 1 owns every duplicated window (lowest doc_id) -> untouched
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == "intro one two " + passage + " outro alpha"
    # doc 2 loses exactly the shared passage tokens (6 of them)
    assert got[2]["n_removed"] == 6
    assert got[2]["clean_text"] == "different start here unrelated tail words"
    assert got[3]["n_removed"] == 0


def test_exact_substring_dedup_identical_docs_and_short_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.exact_substring_dedup(df, "doc_id", "text", window=4).collect()}
    assert got[1]["n_removed"] == 0 and got[1]["n_tokens"] == 8
    # doc 2 is fully covered by duplicated windows -> emptied, still present
    assert got[2]["clean_text"] == "" and got[2]["n_removed"] == 8
    # shorter than the window -> no windows -> untouched
    assert got[3]["clean_text"] == "too short" and got[3]["n_removed"] == 0


def test_exact_substring_dedup_within_doc_repetition(spark):
    rep = "x1 x2 x3 x4"
    df = spark.createDataFrame(
        [(1, rep + " middle words here " + rep)],
        "doc_id long, text string",
    )
    got = dedup.exact_substring_dedup(df, "doc_id", "text", window=4).collect()[0]
    # the second occurrence of the repeated 4-token span is removed
    assert got["n_removed"] == 4
    assert got["clean_text"] == rep + " middle words here"


def test_deduplicate_lsh_keep_longest_string_ids(spark):
    """Round-10 ADVICE regression: keep='longest' must work for STRING
    id columns (the old max_by(-doc_id) negation assumed numeric ids)
    and preserve the ties-to-minimum-id contract for any orderable id."""
    from duckpgq_extension_spark.operators.dedup import (
        dedup_clusters, deduplicate_lsh)

    docs = spark.createDataFrame(
        [("doc-a", "a b c d e f g h"),
         ("doc-b", "a b c d e f g h longer version extra tokens"),
         ("doc-c", "totally different content words"),
         # tie cluster: equal token counts -> minimum id wins
         ("doc-y", "same length here now"),
         ("doc-z", "same length here too")],
        "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-y", "doc-z")],
        "id_a string, id_b string")
    clusters = dedup_clusters(docs, "doc_id", "text", pairs=pairs)
    kept = sorted(r.doc_id for r in deduplicate_lsh(
        docs, "doc_id", "text", clusters=clusters, keep="longest").collect())
    assert kept == ["doc-b", "doc-c", "doc-y"]


def test_dedup_paragraphs_empty_and_null_arrays_absent(spark):
    """Contract pin for the round-10 rewrite: docs whose paragraph array
    is empty or NULL produce NO output row (the exploded shape never saw
    them); string doc ids exercise the join-back rename."""
    from duckpgq_extension_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [("a", ["x y", "common"]), ("b", ["common"]), ("c", []), ("d", None)],
        "doc_id string, paras array<string>")
    out = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in dedup_paragraphs(docs, "doc_id", "paras").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"] == ("x y\ncommon", 2, 0)
    assert out["b"] == ("", 0, 1)


def test_sql_rendered_minhash_bit_identical(spark):
    """r10: minhash_sig_inrow's SQL-string fast path (column NAME arg) must
    produce signatures bit-identical to the Column-API form on real data."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.select("doc_id", dedup.minhash_sig_inrow("text", 2, 16).alias("s"))
    b = docs.select("doc_id", dedup.minhash_sig_inrow(F.col("text"), 2, 16).alias("s"))
    ra = sorted((r["doc_id"], tuple(r["s"])) for r in a.collect())
    rb = sorted((r["doc_id"], tuple(r["s"])) for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_sql_rendered_simhash_reference_values(spark):
    """r10: simhash's SQL-rendered packed aggregates must match a direct
    per-bit majority reference computed independently per document."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    got = {r["id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    # independent reference: explode tokens, md5_long, per-bit majority in Python
    rows = docs.select(
        F.col("doc_id"),
        F.expr(
            "transform(split(trim(lower(text)), '\\\\s+'), "
            "t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"
        ).alias("hs"),
    ).collect()
    for r in rows:
        hs = r["hs"]
        want = 0
        for b in range(32):
            ones = sum((h >> b) & 1 for h in hs)
            if 2 * ones > len(hs):
                want |= 1 << b
        assert got[r["doc_id"]] == want, f"doc {r['doc_id']}"


def test_minhash_sig_inrow_dotted_name_matches_column_path(spark):
    """ADVICE r10: a dotted/nested column NAME must route through the
    Column path (F.col semantics), not the backtick-quoted SQL render."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(20)
        .select("doc_id", F.struct(F.col("text").alias("body")).alias("payload"))
    )
    a = docs.select(
        "doc_id", dedup.minhash_sig_inrow("payload.body", 2, 8).alias("s")
    )
    b = docs.select(
        "doc_id", dedup.minhash_sig_inrow(F.col("payload.body"), 2, 8).alias("s")
    )
    ra = sorted((r["doc_id"], tuple(r["s"])) for r in a.collect())
    rb = sorted((r["doc_id"], tuple(r["s"])) for r in b.collect())
    assert ra == rb and len(ra) == 20


def test_simhash_rejects_bits_below_4(spark):
    """ADVICE r10: bits < 4 used to render an empty aggregate join and die
    in the SQL parser; it must raise a clear ValueError up front."""
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    for bad in (0, 2, 3, 5):
        with pytest.raises(ValueError, match="bits >= 4"):
            dedup.simhash(docs, "doc_id", "text", bits=bad)


def test_tokens_sql_invariant_to_escaped_string_literals(spark):
    """ADVICE r10: tokens_sql's regex renders via concat(char(92), 's+'),
    so it must split identically with escapedStringLiterals on or off."""
    from pyspark.sql import functions as F

    from duckpgq_extension_spark.functions.text import tokens, tokens_sql

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    want = [tuple(r["t"]) for r in docs.select(tokens(F.col("text")).alias("t")).collect()]
    conf = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(conf, "false")
    try:
        for mode in ("false", "true"):
            spark.conf.set(conf, mode)
            got = [
                tuple(r["t"])
                for r in docs.select(F.expr(tokens_sql("text")).alias("t")).collect()
            ]
            assert got == want, f"escapedStringLiterals={mode}"
    finally:
        spark.conf.set(conf, old)
