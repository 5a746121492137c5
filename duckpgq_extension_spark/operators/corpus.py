"""Corpus-preparation operators for training-data pipelines.

Beyond-reference additions (SURVEY.md §2C): document chunking and
deterministic sampling — the two standard steps between cleaning/dedup
(operators/dedup.py, functions/text.py) and tokenizer/training ingestion.

Scale design: both operators are pure JVM column expressions (no Python
UDFs, no shuffle of their own) — chunking is an explode over per-row token
windows, sampling is a filter — so they pipeline into whatever
partitioning the surrounding plan already has, and both are expressible in
portable SQL for oracle verification (the shared md5-prefix hash of
functions/text.md5_long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, tokens, word_ngrams_from_tokens
from .paths import materialize as pathops_materialize


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
    toks: Column | None = None,
) -> DataFrame:
    """Split documents into overlapping token windows:
    (id, chunk_id, chunk_text, n_chunk_tok), one row per chunk.

    Window k covers tokens [k*step, k*step + chunk_tokens) with
    step = chunk_tokens - overlap; the final window may be shorter.
    Zero-token documents produce no chunks.  The whole operator is a
    single JVM projection + explode — no shuffle, no Python — so at
    100 TB it streams through the scan partitioning untouched.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col)) if toks is None else toks
    base = df.select(
        F.col(id_col).alias("id"), t.alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.col("__n"), F.lit(1)), F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(F.col("__toks"), s, chunk_tokens))
    return (
        base.where(F.col("__n") > 0)
        .select("id", F.posexplode(chunks).alias("chunk_id", "__chunk"))
        .select(
            "id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            F.size("__chunk").cast("long").alias("n_chunk_tok"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tok_count_col: str,
    budget: int = 2048,
    num_shards: int = 64,
) -> DataFrame:
    """Next-fit sequence packing: assign documents to fixed token-budget
    bins for training-batch construction.  Returns
    (id, n_tok, shard, bin_id), one row per document.

    Packing is inherently a sequential scan (the current bin's fill is
    state), so the corpus is first split into `num_shards` deterministic
    hash shards (md5-prefix of the id — reproducible across runs and
    engines, like deterministic_sample); each shard then packs its
    documents independently in id order with the classic next-fit rule:

        a document goes into the current bin if it fits, else it opens a
        new bin; a document larger than the budget occupies a bin alone.

    Next-fit is a 2-approximation of optimal bin count — the standard
    trade for a single streaming pass.  Scale design: shards are the
    parallelism unit (one `applyInPandas` group each, Arrow-batched), so
    throughput scales with num_shards while each task does an O(rows)
    local scan; bins never span shards, so the output is stable under any
    cluster size.  Raise num_shards until a shard's rows fit comfortably
    in one task (e.g. 100 TB / 10k shards = 10 GB of metadata rows — the
    pack scan only needs (id, n_tok), not the text).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    import pandas as pd

    # ids keep their own domain: integral ids stay long, everything else
    # (string chunk keys etc.) rides as string — a blind long cast would
    # NULL non-numeric ids and collapse the deterministic in-shard order
    integral = df.schema[id_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )
    id_type = "long" if integral else "string"
    meta = df.select(
        F.col(id_col).cast(id_type).alias("id"),
        F.col(tok_count_col).cast("long").alias("n_tok"),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(num_shards))
        .cast("long")
        .alias("shard"),
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        first = True
        for n in pdf["n_tok"]:
            n = int(n)
            if not first and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += n
            first = False
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return meta.groupBy("shard").applyInPandas(
        _pack, f"id {id_type}, n_tok long, shard long, bin_id long"
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Reproducible Bernoulli sample by content hash: keeps a row iff the
    md5-prefix hash of (key, salt) lands below `rate` of the bucket space.

    Unlike df.sample(), the decision is a pure function of the key — the
    same rows are kept across runs, engines, partitionings, and cluster
    sizes (promote/demote a corpus slice deterministically; vary `salt`
    to draw an independent sample).  A filter expression only: pushes
    down to the scan like any predicate.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    buckets = 1_000_000
    b = F.pmod(
        md5_long(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(buckets),
    )
    return df.where(b < int(rate * buckets))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, the number
    of distinct word n-grams it shares with ANY benchmark document.

    This is the standard eval-decontamination step for LLM training
    corpora (n-gram collision against held-out benchmark sets): a corpus
    document sharing >= min_overlap n-grams with the benchmark is flagged
    for removal before training.

    Returns (doc_id, overlap_ngrams) for flagged documents only.

    Scale design: the benchmark n-gram set (eval suites are MBs, not TBs)
    is reduced to DISTINCT n-gram hashes and broadcast, so the 100 TB
    corpus side is one scan + one local semi-join per partition — no
    shuffle of corpus n-grams at all; the only aggregation is the
    per-document overlap count, partial-aggregated map-side.
    """
    from ..functions.text import md5_long, tokens, word_ngrams_from_tokens
    from pyspark.sql import functions as F

    def grams(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        g = df.select(
            *cols,
            F.explode(
                F.array_distinct(
                    word_ngrams_from_tokens(tokens(F.col(text_col)), n)
                )
            ).alias("g"),
        ).withColumn("gh", md5_long(F.col("g")))
        return g.select(*(["doc_id"] if with_id else []), "gh")

    bench = grams(benchmark, with_id=False).distinct()
    return (
        grams(corpus, with_id=True)
        .join(F.broadcast(bench), "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap_ngrams"))
        .where(F.col("overlap_ngrams") >= min_overlap)
    )



def _doc_token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token, n) occurrence counts — the shared first phase of
    vocab_stats and tfidf (map-side combine collapses per-doc repeats
    before the shuffle); one definition so tokenization/NULL handling
    can never drift between the two operators."""
    from ..functions.text import tokens

    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("n"))
    )


def vocab_stats(
    df: DataFrame, id_col: str, text_col: str, min_occurrences: int = 1
) -> DataFrame:
    """Corpus vocabulary statistics: per whitespace token, total
    occurrence count and document frequency.

    The LLM-pipeline uses: vocabulary coverage checks before tokenizer
    training, stopword-list induction, and corpus drift monitoring
    between crawl snapshots.

    Returns (token, occurrences, doc_freq).

    Scale design: two-phase aggregation — (token, doc) partial counts
    first (map-side combine collapses each document's repeats before any
    shuffle), then one shuffle on token for the final (sum, count).
    This avoids count_distinct's expand over raw token rows: on 100 TB
    the first groupBy reduces the shuffle volume to |vocab x docs-present|
    and the hot "the"-style tokens arrive pre-collapsed to one row per
    document rather than one per occurrence.
    """
    per_doc = _doc_token_counts(df, id_col, text_col)
    out = per_doc.groupBy("token").agg(
        F.sum("n").alias("occurrences"),
        F.count("*").alias("doc_freq"),
    )
    if min_occurrences > 1:
        out = out.where(F.col("occurrences") >= min_occurrences)
    return out


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the content-hash
    of (key, salt) lands below its stratum's rate.

    Training-data curation constantly reweights sources ("keep 100% of
    books, 10% of common-crawl, 0% of spam-domains"); doing it with a
    pure hash function keeps the draw reproducible across runs, engines
    and partitionings, and nested by rate (the 10% sample is a superset
    of the 5% sample at the same salt), unlike df.sampleBy.

    `rates` maps stratum value -> keep rate in [0,1]; unmapped strata get
    `default_rate`.  A filter of literal CASE arms over broadcast-free
    column expressions — pushes down to the scan like any predicate, no
    join, no shuffle.
    """
    from ..functions.text import md5_long

    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {v!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    buckets = 1_000_000
    b = F.pmod(
        md5_long(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(buckets),
    )
    thr = F.lit(int(default_rate * buckets))
    for v, r in rates.items():
        thr = F.when(F.col(strata_col) == F.lit(v), F.lit(int(r * buckets))).otherwise(thr)
    return df.where(b < thr)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    weights: dict[str, float],
    token_budget: int,
    salt: str = "",
) -> DataFrame:
    """Token-budget mixture sampling: draw a deterministic subcorpus whose
    per-group token mass approximates `token_budget` split by `weights`.

    The standard "build me a 1T-token training mix, 60% web / 30% books /
    10% code" step: for each group g the target is
    budget * w_g / sum(w); the keep-rate is min(1, target / tokens_g),
    applied as the same content-hash Bernoulli draw deterministic_sample
    uses (reproducible across runs, engines, partitionings; nested by
    rate at the same salt).  Groups absent from `weights` sample at 0
    (dropped).  When a group's corpus is smaller than its target, the
    rate caps at 1 — the shortfall is reported by comparing the output's
    per-group token sums to the targets, not silently rebalanced.

    Returns (id, group, n_tok) for kept documents.

    Scale design: per-group token totals are a tiny aggregate (groups =
    corpus sources, O(10..10^3)) broadcast back as thresholds, so the
    100 TB corpus side is one scan + a broadcast hash join + a filter —
    no corpus shuffle.  The numerator budget*w_g/sum(w)*bucket_space is
    folded to ONE double literal driver-side, so the only runtime float
    op is a single division — bit-identical across engines (the same
    convention the DuckDB oracle replays).
    """
    from ..functions.text import md5_long, token_count

    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if not weights:
        raise ValueError("weights must name at least one group")
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for group {g!r} must be >= 0, got {w}")
    sumw = float(sum(weights.values()))
    if sumw <= 0:
        raise ValueError("weights must sum to a positive value")
    buckets = 1_000_000
    base = df.withColumn(
        "__ntok", token_count(F.col(text_col)).cast("long")
    )
    totals = base.groupBy(group_col).agg(F.sum("__ntok").alias("__tg"))
    numer = F.lit(0.0)
    for g, w in weights.items():
        # one driver-side double per group: budget * normalized weight,
        # scaled to the hash-bucket space
        n = float(token_budget) * (float(w) / sumw) * buckets
        numer = F.when(F.col(group_col) == F.lit(g), F.lit(n)).otherwise(numer)
    thresholds = totals.select(
        F.col(group_col),
        F.least(
            F.lit(buckets).cast("bigint"),
            # a group whose token total is 0 has nothing to sample: its
            # threshold must be 0 (keep nothing), not NULL — Spark's
            # null-skipping least() would otherwise turn the NULL division
            # into the full bucket space and keep EVERY row of the group
            F.coalesce(
                F.floor(
                    numer
                    / F.when(F.col("__tg") != 0, F.col("__tg")).cast("double")
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        ).alias("__thr"),
    )
    b = F.pmod(
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.lit(buckets),
    )
    return (
        base.join(F.broadcast(thresholds), group_col)
        .where(b < F.col("__thr"))
        .select(
            F.col(id_col), F.col(group_col), F.col("__ntok").alias("n_tok")
        )
    )


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int | None = None,
) -> DataFrame:
    """TF-IDF scores per (document, token): tf * ln(N / doc_freq) over
    whitespace tokens — the classic relevance weighting used for
    keyword extraction, sparse retrieval baselines, and corpus quality
    signals.

    Returns (doc_id, token, tf, tfidf); with `top_n`, only each
    document's top-n terms (ties broken by token text, deterministic).

    Scale design: term frequencies aggregate on (doc, token) with
    map-side combine; document frequencies derive from that frame with
    one more vocab-sized aggregation that joins back broadcast (a vocab
    is millions of rows where the corpus is billions).  The corpus count
    N is a single count() action, like the vertex count in pagerank.
    With top_n the rank filter compiles to WindowGroupLimit — partial
    top-n before the full per-document sort.
    """
    n_docs = df.count()
    tf = _doc_token_counts(df, id_col, text_col).withColumnRenamed("n", "tf")
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    # no forced broadcast: a whitespace-token vocabulary is unbounded (a
    # web-scale corpus easily exceeds the driver's memory); let the
    # optimizer broadcast when dfreq is actually small and shuffle-join
    # otherwise
    out = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dfreq"))).alias("tfidf"),
    )
    if top_n is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), F.col("token").asc()
        )
        out = (
            out.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= top_n)
            .drop("__rk")
        )
    return out


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a set of term
    queries — the sparse-retrieval ranking used to mine topical training
    data ("find the docs most about X") and as the lexical leg of hybrid
    (BM25 + embedding) retrieval.  `queries` is a (qid, term) DataFrame;
    a query's score for a document is the sum over its terms of

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    with the Robertson-Sparck Jones idf ln(1 + (N - df + 0.5)/(df + 0.5))
    (Lucene's variant — always positive).  Returns (qid, doc_id, score);
    with `top_k`, each query's best k documents (ties broken by doc_id).

    Scale design: term frequencies aggregate with map-side combine; the
    query-term join broadcasts (a query workload is tiny next to the
    corpus); document frequencies come from one vocab-sized aggregation
    joined back per matched term only.  N and avgdl are two scalars
    collected once (like pagerank's vertex count).  The top_k filter
    compiles to WindowGroupLimit (partial top-k before the final sort).
    """
    tf = _doc_token_counts(df, id_col, text_col).withColumnRenamed("n", "tf")
    tf = tf.persist()
    try:
        stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        row = stats.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 1.0)
        matched = tf.join(
            F.broadcast(queries.select(F.col("qid"), F.col("term").alias("token"))),
            "token",
        )
        # tf has exactly one row per (token, doc), so the doc frequency is
        # a plain count; restricting to matched terms keeps it query-sized
        dfreq = matched.select("token").distinct().join(
            tf.groupBy("token").agg(F.count("*").alias("dfreq")), "token"
        )
        scored = (
            matched.join(F.broadcast(dfreq), "token")
            .join(stats, "doc_id")
            .select(
                "qid",
                "doc_id",
                (
                    F.log(
                        F.lit(1.0)
                        + (F.lit(float(n_docs)) - F.col("dfreq") + F.lit(0.5))
                        / (F.col("dfreq") + F.lit(0.5))
                    )
                    * (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.lit(avgdl)
                        )
                    )
                ).alias("__s"),
            )
            .groupBy("qid", "doc_id")
            .agg(F.round(F.sum("__s"), 6).alias("score"))
        )
        if top_k is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("qid").orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
            scored = (
                scored.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= top_k)
                .drop("__rk")
            )
        return scored.localCheckpoint(eager=True)
    finally:
        tf.unpersist()


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    MLE unigram language model — the classic cheap perplexity proxy for
    quality filtering (documents of rare/garbled tokens score low,
    repetitive common-token spam scores suspiciously high; both tails
    get cut).  No smoothing needed: every scored token is in the model
    by construction.

    Returns (id_col, n_tokens, avg_logprob) with
    avg_logprob = sum_t n_t * ln(cf_t / T) / sum_t n_t, where cf_t is
    the corpus frequency of token t and T the total token count.

    Scale design: reuses the two-phase (token, doc) partial counts of
    vocab_stats — one shuffle builds the model, one token-keyed join
    scores the documents, and the corpus total rides as a broadcast
    1-row frame (no driver collect)."""
    per_doc = _doc_token_counts(df, id_col, text_col).persist()
    try:
        model = per_doc.groupBy("token").agg(F.sum("n").alias("cf"))
        total = F.broadcast(model.agg(F.sum("cf").alias("__t")))
        return pathops_materialize(
            per_doc.join(model, "token")
            .crossJoin(total)
            .groupBy("doc_id")
            .agg(
                F.sum("n").alias("n_tokens"),
                (
                    F.sum(F.col("n") * F.log(F.col("cf") / F.col("__t")))
                    / F.sum("n")
                ).alias("avg_logprob"),
            )
        )
    finally:
        per_doc.unpersist()


def per_group_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group cap: keep at most `k` rows per group,
    chosen by the portable content-hash order of (key, salt) — the
    generic form of the per-source / per-domain document cap every
    corpus-mixing pipeline applies before training (and of
    algorithms.neighbor_sample, which is this with group = src).

    Reproducible across runs, engines and partitionings; nested (the
    k=20 sample contains the k=10 sample at the same salt); vary `salt`
    for an independent draw.  One window over one shuffle on the group
    key — no joins.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    h = md5_long(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt)))
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals, Gopher-rule style (Rae et al.
    2021 §A1.1 "repetition filters"): per document,

    - ``dup_line_frac``       — fraction of (non-empty) lines whose content
      occurs more than once in the document, counting every occurrence;
    - ``dup_line_char_frac``  — fraction of line characters contained in
      those duplicated lines;
    - ``top_2gram_char_frac`` — character coverage of the highest-coverage
      word 2-gram: max over grams of (count x gram length) / length(text);
    - ``flagged``             — the standard gate (dup_line_frac > 0.30 OR
      dup_line_char_frac > 0.30 OR top_2gram_char_frac > 0.20).

    Boilerplate-heavy and loop-generated documents (nav bars, templated
    spam, decoding loops) score high and get dropped before training.

    Scale design: NOT per-row array nesting (a transform-over-distinct
    scan is O(len^2) per document and dies on long documents).  Each
    signal is an explode + one aggregation keyed (doc, line/gram) — the
    document id in the key spreads hot grams, so the plan is linear in
    corpus size and skew-safe at 100 TB.  Fractions are rounded to 6
    decimals (portable-hash convention of the oracle gate).
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.length(F.col(text_col)).cast("double").alias("__n_chars"),
    )

    lines = base.select(
        "__id", F.explode(F.split(F.col("__text"), "\n")).alias("__line")
    ).where(F.col("__line") != "")
    line_counts = lines.groupBy("__id", "__line").agg(
        F.count(F.lit(1)).alias("__c")
    )
    line_agg = line_counts.groupBy("__id").agg(
        (
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0)))
            / F.sum("__c")
        ).alias("__dup_line_frac"),
        (
            F.sum(
                F.when(
                    F.col("__c") > 1, F.col("__c") * F.length("__line")
                ).otherwise(F.lit(0))
            )
            / F.nullif(F.sum(F.col("__c") * F.length("__line")), F.lit(0))
        ).alias("__dup_char_frac"),
    )

    grams = base.select(
        "__id",
        F.explode(
            word_ngrams_from_tokens(tokens(F.col("__text")), 2)
        ).alias("__g"),
    )
    gram_counts = grams.groupBy("__id", "__g").agg(F.count(F.lit(1)).alias("__c"))
    gram_agg = gram_counts.groupBy("__id").agg(
        F.max(F.col("__c") * F.length("__g")).cast("double").alias("__cover")
    )

    dup_line = F.coalesce(F.round("__dup_line_frac", 6), F.lit(0.0))
    dup_char = F.coalesce(F.round("__dup_char_frac", 6), F.lit(0.0))
    top2 = F.coalesce(
        F.round(F.col("__cover") / F.col("__n_chars"), 6), F.lit(0.0)
    )
    return (
        base.join(line_agg, "__id", "left")
        .join(gram_agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            dup_line.alias("dup_line_frac"),
            dup_char.alias("dup_line_char_frac"),
            top2.alias("top_2gram_char_frac"),
            (
                (dup_line > 0.30) | (dup_char > 0.30) | (top2 > 0.20)
            ).alias("flagged"),
        )
    )


def importance_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_text_col: str | None = None,
    k: int = 1000,
    n_buckets: int = 512,
    smoothing: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR-style, Xie et al.
    2023, simplified): score every raw document by how much more likely
    its tokens are under a small TARGET-domain corpus than under the raw
    corpus itself, and keep the top-k — the standard recipe for carving
    a domain-matched training subset out of a web-scale crawl.

    Features are hashed unigram buckets (token -> md5 % n_buckets), the
    two distributions are Laplace-smoothed bucket frequencies, and the
    document score is the mean log-likelihood ratio
    mean_t ln(p_target(b_t) / p_raw(b_t)) (length-normalized so long
    documents aren't favored).  Deterministic: ties break by id, no
    sampling noise — the Gumbel top-k of the paper degrades to plain
    top-k, which keeps the operator oracle-checkable.

    Returns the top-k (doc_id, n_tokens, score), score rounded to 6.

    Scale design: both bucket tables are n_buckets rows (driver-free
    broadcast joins); the raw corpus is scanned once (explode -> bucket
    -> map-side-combined count + per-doc aggregate); top-k is a
    TakeOrdered, never a full sort."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    ttext = target_text_col or text_col
    bucket = lambda c: F.pmod(md5_long(c), F.lit(n_buckets))  # noqa: E731

    def bucket_counts(frame: DataFrame, col: str) -> DataFrame:
        return (
            frame.select(F.explode(tokens(F.col(col))).alias("tok"))
            .select(bucket(F.col("tok")).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("cnt"))
        )

    tgt = bucket_counts(target, ttext)
    raw = bucket_counts(df, text_col)
    # log p(b) = ln((cnt + s) / (total + s * n_buckets)); buckets missing
    # from a corpus get the pure-smoothing mass via the outer join
    tt = F.broadcast(tgt.agg(F.sum("cnt").alias("__tt")))
    rt = F.broadcast(raw.agg(F.sum("cnt").alias("__rt")))
    ratios = (
        tgt.withColumnRenamed("cnt", "tc")
        .join(raw.withColumnRenamed("cnt", "rc"), "b", "full_outer")
        .crossJoin(tt)
        .crossJoin(rt)
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(float(smoothing)))
                    / (F.col("__tt") + F.lit(float(smoothing) * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)) + F.lit(float(smoothing)))
                    / (F.col("__rt") + F.lit(float(smoothing) * n_buckets))
                )
            ).alias("llr"),
        )
    )
    scored = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .select("doc_id", bucket(F.col("tok")).alias("b"))
        .join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("llr"), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    token_budget: int,
    alpha: float = 0.7,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture sampling: group token targets are
    proportional to (group token share)^alpha — the standard
    multilingual up-sampling rule (alpha=1 keeps natural proportions,
    alpha -> 0 approaches uniform across groups; mT5/XLM-R use ~0.3-0.7
    to boost low-resource languages).  The companion to `mixture_sample`
    when weights should be DERIVED from the data rather than given.

    Same reproducible content-hash Bernoulli mechanics as
    mixture_sample; per-group keep-rate = min(1, budget * tg^alpha /
    (sum_g tg^alpha) / tg).  Everything is computed inside the plan —
    the group-total frame is broadcast, the normalizer rides as a
    broadcast 1-row aggregate, no driver collect.  Returns
    (id_col, group_col, n_tok) for the kept rows.
    """
    from ..functions.text import token_count

    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    buckets = 1_000_000
    base = df.withColumn("__ntok", token_count(F.col(text_col)).cast("long"))
    totals = base.groupBy(group_col).agg(F.sum("__ntok").alias("__tg"))
    z = F.broadcast(
        totals.agg(
            F.sum(F.pow(F.col("__tg").cast("double"), F.lit(alpha))).alias("__z")
        )
    )
    thresholds = totals.crossJoin(z).select(
        F.col(group_col),
        F.least(
            F.lit(buckets).cast("bigint"),
            # tg = 0 or NULL -> 0/0 -> NULL -> threshold 0 (keep nothing),
            # same zero-token-group rule as mixture_sample
            F.coalesce(
                F.floor(
                    F.lit(float(token_budget))
                    * F.pow(F.col("__tg").cast("double"), F.lit(alpha))
                    / F.col("__z")
                    / F.when(F.col("__tg") != 0, F.col("__tg")).cast("double")
                    * F.lit(buckets)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        ).alias("__thr"),
    )
    b = F.pmod(
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.lit(buckets),
    )
    return (
        base.join(F.broadcast(thresholds), group_col)
        .where(b < F.col("__thr"))
        .select(
            F.col(id_col), F.col(group_col), F.col("__ntok").alias("n_tok")
        )
    )


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's own
    MLE bigram language model — the second-order companion to
    `unigram_logprob`: P(w2 | w1) = c(w1 w2) / c(w1 ·), scored as
    avg over the document's bigrams of n * ln(P) / n.  Repetitive
    word-salad that fools unigram scoring (common tokens in nonsense
    order) scores low here; like the unigram scorer, no smoothing is
    needed because every scored bigram is in the self-model by
    construction.  Documents with fewer than two tokens are dropped
    (no bigrams to score).

    Returns (doc_id, n_bigrams, avg_logprob).

    Scale design: one explode to (doc, w1, w2) with map-side-combined
    per-doc counts; the model and its context marginal are two more
    aggregations over that frame; scoring is one join back on the
    bigram key.  Same shuffle shape as unigram_logprob, one key wider.
    """
    from ..functions.text import tokens

    t = tokens(F.col(text_col))
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    per_doc = (
        pairs.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n")).persist()
    )
    try:
        model = per_doc.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
        ctx = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
        return pathops_materialize(
            per_doc.join(model, ["w1", "w2"])
            .join(ctx, "w1")
            .groupBy("doc_id")
            .agg(
                F.sum("n").alias("n_bigrams"),
                F.round(
                    F.sum(F.col("n") * F.log(F.col("c2") / F.col("c1")))
                    / F.sum("n"),
                    6,
                ).alias("avg_logprob"),
            )
        )
    finally:
        per_doc.unpersist()


def _global_rank(df: DataFrame, order_exprs, rank_name: str):
    """Exact 1-based global rank under a total order, WITHOUT the
    single-partition trap: `Window.orderBy(...)` with no partition key
    moves the whole dataset into one task, so instead this range-sorts
    (the terasort pattern), counts rows per range partition (a tiny
    driver-side collect — one long per partition), and adds the
    cumulative offset to a per-partition row_number.  Rank correctness
    needs only the range property (every row in partition i sorts before
    partition i+1) — it does not depend on partition balance, so the
    range sampler can't break determinism.  Returns (df + rank_name, N).
    """
    from pyspark.sql import Window

    s = (
        df.repartitionByRange(*order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in s.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
    )
    w = Window.partitionBy("__pid").orderBy(*order_exprs)
    out = (
        s.join(off_df, "__pid")
        .withColumn(rank_name, (F.row_number().over(w) + F.col("__off")).cast("bigint"))
        .drop("__pid", "__off")
    )
    # materialize before releasing the sorted frame so the rank can't
    # recompute against a re-sampled range partitioning
    out = pathops_materialize(out)
    s.unpersist()
    return out, acc


def curriculum_bins(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_bins: int = 4,
    ascending: bool = True,
    salt: str = "",
) -> DataFrame:
    """Curriculum ordering for training: split the corpus into `n_bins`
    equal-budget phases by score quantile (ntile semantics over the
    (score, id) total order — phase 1 is the lowest-scoring / "easiest"
    slice when `ascending`), and give every row a deterministic 1-based
    `position` inside its phase by content-hash order — the reproducible
    shuffle a training loader consumes directly; `salt` reshuffles
    across epochs without touching phase assignment.

    ntile is computed in CLOSED FORM from the exact global rank (the
    first n % k phases hold n//k + 1 rows, the rest n//k), and both
    ranks come from `_global_rank`'s range-sort + partition-offset plan
    — two distributed range shuffles, two driver-side collects of one
    long per partition, NO single-partition window anywhere.  Phases are
    budget-balanced by construction, so per-phase downstream jobs are
    skew-free.  `id_col` must be unique (it is the order tie-break)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    score = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    ranked, n = _global_rank(df, [score, F.col(id_col).asc()], "__grank")
    q, r = divmod(n, n_bins)
    cutoff = r * (q + 1)
    g = F.col("__grank")
    phase = F.when(
        g <= F.lit(cutoff), (g - 1) / F.lit(q + 1) + 1
    ).otherwise(F.lit(r) + (g - F.lit(cutoff) - 1) / F.lit(max(q, 1)) + 1)
    with_phase = ranked.withColumn(
        "phase", F.floor(phase).cast("bigint")
    ).drop("__grank")
    shuffle_key = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    ranked2, _ = _global_rank(
        with_phase.withColumn("__shuf", shuffle_key),
        [F.col("phase").asc(), F.col("__shuf").asc(), F.col(id_col).asc()],
        "__grank2",
    )
    # phase start offsets are closed-form from the same (q, r) split
    p = F.col("phase")
    phase_start = F.when(
        p <= F.lit(r), (p - 1) * F.lit(q + 1)
    ).otherwise(F.lit(cutoff) + (p - 1 - F.lit(r)) * F.lit(q))
    return (
        ranked2.withColumn(
            "position", (F.col("__grank2") - phase_start).cast("bigint")
        )
        .drop("__grank2", "__shuf")
    )


def bigram_logprob_vs(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram log-probability under a model trained on
    a REFERENCE corpus — the KenLM-style quality filter of CCNet/GPT-3
    data prep (score web text against a clean-corpus LM; keep the
    high-likelihood tail), with Laplace smoothing since target bigrams
    can be unseen: P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha*V),
    V = distinct second-token vocabulary of the reference (so an unseen
    context scores 1/V, never log(0)).

    Returns (doc_id, n_bigrams, avg_logprob) over target docs with >= 1
    bigram.  Scale: the model is two aggregations over the reference's
    bigram frame; scoring is two LEFT joins on (w1, w2) / (w1) with
    map-side-combined per-doc counts — the same shuffle shape as
    bigram_logprob plus the model side; V is a scalar literal."""
    from ..functions.text import tokens

    ref_text_col = ref_text_col or text_col

    def _pairs(frame, txt, idc=None):
        t = tokens(F.col(txt))
        cols = [F.col(idc).alias("doc_id")] if idc else []
        return frame.select(
            *cols,
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
                    F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
                )
            ).alias("bg"),
        ).select(*(["doc_id"] if idc else []), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    model = (
        _pairs(reference, ref_text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .persist()
    )
    try:
        ctx = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
        v = model.select(F.countDistinct("w2")).first()[0] or 1
        scored = (
            _pairs(df, text_col, id_col)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("n"))
            .join(model, ["w1", "w2"], "left")
            .join(ctx, "w1", "left")
            .select(
                "doc_id",
                "n",
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.lit(float(v)))
                ).alias("__lp"),
            )
        )
        return pathops_materialize(
            scored.groupBy("doc_id").agg(
                F.sum("n").alias("n_bigrams"),
                F.round(F.sum(F.col("n") * F.col("__lp")) / F.sum("n"), 6).alias(
                    "avg_logprob"
                ),
            )
        )
    finally:
        model.unpersist()


def apply_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    token_id_col: str = "token_id",
    oov_id: int | None = None,
) -> DataFrame:
    """Tokenizer application: map every document to its token-id
    sequence under a fixed vocabulary table — the step between vocab
    induction (vocab_stats) and sequence packing (pack_sequences) that a
    training pipeline actually runs per epoch.

    `vocab` is a (token, token_id) DataFrame.  Out-of-vocabulary tokens
    map to `oov_id` when given (the <unk> convention), else are DROPPED
    from the sequence.  Returns (doc_id, pos, token_id) — one row per
    SURVIVING token, pos = 1-based position in the original token
    stream (so consumers can detect dropped-OOV gaps); empty and
    fully-OOV documents yield no rows, like chunking of empty docs.

    Scale: explode to (doc, pos, token), one BROADCAST join against the
    vocab (tokenizer vocabularies are MBs — always the small side), no
    regrouping shuffle: the output stays in token order per doc because
    pos rides along.  Callers who need the packed array do ONE
    per-doc aggregate downstream; keeping the operator exploded avoids
    paying that shuffle when the next stage (packing, counting,
    windowing) wants rows anyway."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("__p0", "__tok"),
    ).select(
        "doc_id", (F.col("__p0") + 1).cast("long").alias("pos"), F.col("__tok")
    )
    v = F.broadcast(
        vocab.select(
            F.col(token_col).alias("__tok"),
            F.col(token_id_col).cast("long").alias("token_id"),
        )
    )
    joined = toks.join(v, "__tok", "left")
    if oov_id is None:
        return joined.where(F.col("token_id").isNotNull()).select(
            "doc_id", "pos", "token_id"
        )
    return joined.select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(int(oov_id)).cast("long")).alias(
            "token_id"
        ),
    )


def vocab_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Corpus drift monitoring: per-token Jensen-Shannon divergence
    contribution between two snapshots' unigram distributions — the
    standard between-crawl check before mixing a new snapshot into a
    training corpus (which tokens moved, and how much of the divergence
    each explains).

    JS(P,Q) = 0.5*KL(P||M) + 0.5*KL(Q||M), M = (P+Q)/2, decomposed per
    token as 0.5*p*ln(p/m) + 0.5*q*ln(q/m) (terms with p or q = 0
    contribute only the other side — the 0*ln(0) = 0 convention), so
    contributions are non-negative and sum to the divergence.

    Returns the `top_n` tokens by contribution (ties broken by token):
    (token, p_a, p_b, js_contribution), probabilities and contribution
    rounded to 1e-6 / 1e-9.

    Scale: one token-count aggregate per corpus (the vocab_stats
    shuffle shape), one full-outer join on token, totals as broadcast
    1-row frames — nothing quadratic, nothing collected."""

    def _counts(df):
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("n"))
        )
    ca, cb = _counts(corpus_a), _counts(corpus_b)
    ta = F.broadcast(ca.agg(F.sum("n").alias("__ta")))
    tb = F.broadcast(cb.agg(F.sum("n").alias("__tb")))
    joined = (
        ca.withColumnRenamed("n", "na")
        .join(cb.withColumnRenamed("n", "nb"), "token", "full_outer")
        .crossJoin(ta)
        .crossJoin(tb)
        .select(
            "token",
            (F.coalesce(F.col("na"), F.lit(0)) / F.col("__ta")).alias("p"),
            (F.coalesce(F.col("nb"), F.lit(0)) / F.col("__tb")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    )
    scored = joined.select(
        "token",
        F.round(F.col("p"), 6).alias("p_a"),
        F.round(F.col("q"), 6).alias("p_b"),
        F.round(contrib, 9).alias("js_contribution"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("js_contribution").desc(), F.col("token").asc())
    # the ranking window runs over the VOCABULARY relation (bounded by
    # construction, like apply_vocab's), not the corpus
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): each row draws priority u^(1/w) with u
    a reproducible md5-hash fraction of (id, salt); the k highest
    priorities are exactly a weight-proportional sample without
    replacement.  With `group_col`, k per group (domain-balanced corpus
    subsetting with importance weights — the exact-size counterpart of
    the Bernoulli samplers above).

    Non-positive weights are excluded (they cannot be drawn).

    Scale design: priorities are pure per-row JVM expressions (no RNG
    state, rerun-stable); selection is one top-k window per group, which
    compiles to WindowGroupLimit (partial top-k before the final sort) —
    the same single-shuffle shape as top_k_per_group.

    Cross-engine caveat: the selection ranks on u^(1/w) via pow(),
    which libm does not guarantee bit-identical across engines — two
    rows with NEAR-TIED priorities can rank differently in Spark vs
    DuckDB and flip the sample at the k boundary.  The md5 draw itself
    is exact (integer hash / 2^20), so ties are only possible through
    pow rounding; if an engine-exact rank ever matters, compare
    ln(u)/w instead (monotone-equivalent) or follow node2vec's
    float-exact draw design.
    """
    from pyspark.sql import Window

    from ..functions.text import md5_long

    M = 1 << 20
    u = (
        md5_long(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))
        % F.lit(M)
        + F.lit(0.5)
    ) / F.lit(float(M))
    pri = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    base = df.where(F.col(weight_col) > 0).withColumn("__pri", pri)
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col("__pri").desc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(
            *([F.col(group_col)] if group_col else []),
            F.col(id_col),
            F.round("__pri", 6).alias("priority"),
        )
    )


def cooccurrence_pmi(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Item co-occurrence with pointwise mutual information: unordered
    item pairs appearing in the same group (order/basket/document), their
    joint count, and pmi = ln(c_ab * N / (c_a * c_b)) over the N groups —
    the classic association signal behind item embeddings, related-items,
    and phrase mining.

    Returns (item_a, item_b, n_pairs, pmi) for pairs with
    n_pairs >= min_count; item_a < item_b canonicalizes.

    Scale design: the pair space is a self-equi-join on the group key —
    quadratic ONLY in per-group item count (baskets are small; cap or
    sample pathological groups upstream), never corpus-quadratic.  Item
    marginals are one aggregation joined back; with a vocabulary-sized
    item domain Catalyst broadcasts them.  AQE's skew join spreads hot
    groups.
    """
    items = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    n_groups = items.select("g").distinct().count()
    marg = items.groupBy("item").agg(F.count("*").alias("c"))
    pairs = (
        items.alias("l")
        .join(items.alias("r"), "g")
        .where(F.col("l.item") < F.col("r.item"))
        .groupBy(
            F.col("l.item").alias("item_a"), F.col("r.item").alias("item_b")
        )
        .agg(F.count("*").alias("n_pairs"))
        .where(F.col("n_pairs") >= min_count)
    )
    return (
        pairs.join(marg.select(F.col("item").alias("item_a"), F.col("c").alias("__ca")), "item_a")
        .join(marg.select(F.col("item").alias("item_b"), F.col("c").alias("__cb")), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pairs",
            F.round(
                F.log(
                    F.col("n_pairs") * F.lit(float(n_groups))
                    / (F.col("__ca") * F.col("__cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def materialize_packs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tok_count_col: str,
    budget: int = 2048,
    num_shards: int = 64,
    sep: str = "<eos>",
) -> DataFrame:
    """Materialize pack_sequences' bin assignments into actual training
    shards: one row per (shard, bin_id) with the member texts
    concatenated in id order around `sep` — the final write step of the
    chunk -> clean -> pack pipeline, producing the sequences a trainer
    ingests verbatim.

    Returns (shard, bin_id, n_docs, n_tokens, packed_text).

    Scale design: the assignment join and the per-bin aggregation both
    key on the pack metadata; the in-bin ordering is an in-row
    array_sort over bin members (bins hold a handful of documents by
    construction — the budget bounds them), never a global sort.
    """
    meta = pack_sequences(
        df.select(F.col(id_col), F.col(tok_count_col)),
        id_col,
        tok_count_col,
        budget,
        num_shards,
    )
    joined = meta.join(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")),
        "id",
    )
    member = F.struct(F.col("id").alias("i"), F.col("__text").alias("t"))
    return (
        joined.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(member)), lambda x: x["t"]
                ),
                sep,
            ).alias("packed_text"),
        )
    )


def split_dataset(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in a
    split according to md5(key | salt) % 1e6 against the cumulative
    split boundaries — the reproducible partitioning every training
    pipeline needs (same key -> same split across runs, engines, and
    cluster sizes; keys never straddle splits, so grouping by a
    document/user key upstream guarantees no leakage between train and
    eval).  `splits` maps name -> fraction (must sum to ~1; default
    80/10/10 train/val/test).  Returns the input plus a `split` column.

    A pure projection — pushes down like any expression; vary `salt`
    for an independent re-split.
    """
    from ..functions.text import md5_long

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not splits or abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    buckets = 1_000_000
    b = F.pmod(
        md5_long(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        F.lit(buckets),
    )
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)
