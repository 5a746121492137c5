"""Text-analysis column functions for large-scale corpus pipelines.

These are beyond-reference additions (the reference has no text operators;
SURVEY.md §2C) designed for LLM training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Every function is built from JVM-side pyspark.sql.functions only (no
Python UDFs) so the expressions stay inside whole-stage codegen, and every
formula is deliberately *portable*: the same computation is expressible in
ANSI/DuckDB SQL for oracle verification.  The shared hash primitive is a
60-bit integer from the md5 hex prefix:

    Spark :  conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language, used by lang_id (n-gram/stopword heuristic).
# Kept tiny and hard-coded so the oracle SQL can embed the same literals.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "los", "las", "que", "y", "es", "una", "para"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "wo", "ta"],
}

PUNCT_CLASS = r"[.,!?;:]"
DIGIT_CLASS = r"[0-9]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column, toks: Column | None = None) -> Column:
    """Whitespace token count.  Pass a pre-projected `tokens(col)` column
    as `toks` in hot paths so the split runs once per row (see lang_id)."""
    return F.size(tokens(col) if toks is None else toks)


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-flavored token estimate: word-piece count where every run of 4
    characters beyond the first counts as an extra token (≈ GPT-style
    chars/4 heuristic blended with word count)."""
    n_words = token_count(col)
    n_chars = F.length(col)
    return (n_words + F.greatest(F.lit(0), (n_chars - 4 * n_words)) / 4).cast("long")


def _contains_count(toks: Column, words: list[str]) -> Column:
    """How many of `words` occur in the token array (0..len(words)).

    size(array_intersect) instead of a sum of array_contains: one array
    pass and one compact codegen expression per language instead of
    len(words) scans — the sum-of-contains form, multiplied by predicate
    pushdown inlining, was the main contributor to the Janino 64 KB
    codegen fallback on the corpus pipeline.  `words` are distinct, so
    the intersect size equals the contains-sum exactly.
    """
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def lang_scores(col: Column, toks: Column | None = None) -> dict[str, Column]:
    t = tokens(col) if toks is None else toks
    return {lang: _contains_count(t, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Deterministic marker-stopword language ID.

    Picks the language with the most distinct marker hits; ties and
    zero-hit texts resolve in the fixed iteration order of LANG_MARKERS
    with 'und' (undetermined) when no marker matches at all.

    Hot paths MUST pass `toks` (a pre-projected `tokens(col)` column):
    inlining re-derives split(trim(lower(text))) once per marker word and
    the combined projection blows Janino's 64 KB method limit, dropping
    the whole stage out of codegen (observed on corpus_clean at r2).
    """
    scores = lang_scores(col, toks)
    # linear CASE: greatest(scores) once, then first language (in marker
    # order) hitting the maximum wins.  The previous running-max fold nested
    # every prior CASE inside the next comparison, growing the expression
    # tree exponentially in the language count — big enough to trip Janino's
    # 64 KB method limit even with tokens pre-projected.
    m = F.greatest(*scores.values())
    out = F.when(m == F.lit(0), F.lit("und"))
    for lang, s in scores.items():
        out = out.when(s == m, F.lit(lang))
    return out


def punct_ratio(col: Column) -> Column:
    removed = F.regexp_replace(col, PUNCT_CLASS, "")
    return (F.length(col) - F.length(removed)) / F.greatest(F.length(col), F.lit(1))


def digit_ratio(col: Column) -> Column:
    removed = F.regexp_replace(col, DIGIT_CLASS, "")
    return (F.length(col) - F.length(removed)) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, toks: Column | None = None) -> Column:
    """Fraction of English marker stopwords present (0..1)."""
    t = tokens(col) if toks is None else toks
    words = LANG_MARKERS["en"]
    return _contains_count(t, words) / F.lit(len(words))


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] document-quality heuristic: rewards reasonable
    length, low punctuation/digit noise, and natural-language stopword
    presence.  Weights are fixed so the oracle SQL can reproduce exactly.
    Pass a pre-projected token column as `toks` in hot paths (see lang_id).
    """
    n_tok = token_count(col, toks).cast("double")
    length_term = F.least(n_tok / 50.0, F.lit(1.0))
    noise_term = F.greatest(
        F.lit(0.0), 1.0 - 5.0 * (punct_ratio(col) + digit_ratio(col))
    )
    stop_term = F.least(F.lit(1.0), stopword_ratio(col, toks) * 2.0)
    return F.round(0.4 * length_term + 0.3 * noise_term + 0.3 * stop_term, 6)


def md5_long(col: Column) -> Column:
    """Portable 60-bit hash (md5 hex prefix as integer)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# -- SQL-string renderings ---------------------------------------------------
#
# Plan-CONSTRUCTION cost (r10, see operators/similarity.py): the Column-API
# builders above pay one py4j round-trip per call, which dominates operators
# that compose them dozens of times (simhash: 1.4 s to BUILD the plan).  The
# renderers below emit the identical expression as a SQL fragment so a whole
# operator parses in ONE F.expr; operand order and literal types match the
# Column forms exactly (value-identity pinned by tests + the oracle gate).


def is_simple_ident(name: str) -> bool:
    """True iff `name` is a plain top-level identifier.  The SQL-rendered
    fast paths backtick-quote the WHOLE name, so a dotted/nested reference
    ('payload.vec') would resolve differently from F.col(name); callers
    gate on this and fall back to the Column path for non-simple names
    (ADVICE r10)."""
    return bool(_re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", name))


def tokens_sql(col_sql: str) -> str:
    """SQL form of tokens().  The whitespace regex is rendered as
    concat(char(92), 's+') — constant-folded to the same '\\s+' literal by
    Catalyst — so the fragment parses identically whether or not the
    session sets spark.sql.parser.escapedStringLiterals (under which a
    plain '\\\\s+' literal would keep its backslash doubled and silently
    split on a literal backslash-s instead; ADVICE r10)."""
    return f"split(trim(lower({col_sql})), concat(char(92), 's+'))"


def md5_long_sql(arg_sql: str) -> str:
    """SQL form of md5_long()."""
    return f"CAST(conv(substring(md5({arg_sql}), 1, 15), 16, 10) AS BIGINT)"


def word_ngrams_sql(toks_sql: str, n: int) -> str:
    """SQL form of word_ngrams_from_tokens(): same zip_with fold."""
    acc = toks_sql
    for k in range(1, n):
        shifted = f"slice({toks_sql}, {k + 1}, greatest(size({toks_sql}) - {k}, 0))"
        acc = f"zip_with({acc}, {shifted}, (a, b) -> concat_ws(' ', a, b))"
    return (
        f"CASE WHEN size({toks_sql}) < {n} THEN CAST(array() AS array<string>) "
        f"ELSE slice({acc}, 1, size({toks_sql}) - {n - 1}) END"
    )


def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-gram shingles from a token-array column.

    Built by zip_with-folding n shifted copies of the token array —
    linear in tokens, unlike the obvious `transform(sequence, i ->
    slice(toks, i, n))` which re-slices per index and is O(tokens²) per
    row (measured 6x slower on the documents table).  zip_with pads the
    shorter (shifted) side with NULLs, which concat_ws skips; those
    truncated tail grams are cut by the final slice."""
    acc = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.slice(acc, 1, F.size(toks) - (n - 1))
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-gram shingles as strings; empty array when fewer than n tokens.

    Hot paths should pre-project `tokens(col)` into a real column and call
    word_ngrams_from_tokens on it, so the regex split runs once per row."""
    return word_ngrams_from_tokens(tokens(col), n)


def repetition_ratio(col: Column, n: int = 2, toks: Column | None = None) -> Column:
    """Fraction of repeated word n-grams (0..1): 1 - distinct/total grams.

    A Gopher-style repetition quality signal — high values flag boilerplate
    and degenerate generations.  0.0 for documents with fewer than n tokens
    (no grams).  Pure JVM array expressions; pass a pre-projected token
    column in hot paths (see lang_id)."""
    grams = word_ngrams_from_tokens(tokens(col) if toks is None else toks, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6)
    )


def doc_fingerprint(col: Column, n: int = 5, toks: Column | None = None) -> Column:
    """Winnowing-flavored fingerprint: the minimum shingle hash over word
    n-grams (falls back to the hash of the whole text for short docs).
    Equal fingerprints => near-identical leading content."""
    grams = word_ngrams_from_tokens(tokens(col) if toks is None else toks, n)
    min_hash = F.array_min(F.transform(grams, md5_long))
    return F.coalesce(min_hash, md5_long(col))


# --- PII detection / redaction (round 4; beyond-reference) -----------------
# Patterns are deliberately RE2-compatible (no backrefs, no lookaround) so
# the identical regex string runs in Spark (java.util.regex) and the DuckDB
# oracle (RE2) with the same matches.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b"


# Latin-1 accent fold table for normalize_text(ascii_fold=True): fixed
# literals so DuckDB's translate() replays the identical mapping.  Scope is
# deliberately Latin-1/Latin-Extended-A basics (the pragmatic crawl-cleanup
# set), not full Unicode NFKD — Spark has no built-in normalizer and a
# Python UDF would leave the JVM for every row.
ACCENT_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝšžŠŽœŒæÆ"
ACCENT_TO = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUYszSZoOaA"


def normalize_text(
    col: Column,
    *,
    lower: bool = True,
    collapse_ws: bool = True,
    strip_punct: bool = False,
    ascii_fold: bool = False,
) -> Column:
    """Canonical text form for dedup/fingerprinting.  Default: lowercase,
    collapse all whitespace runs to single spaces, trim.  Options add the
    other standard crawl-cleanup passes: `strip_punct` removes ASCII
    punctuation, `ascii_fold` maps common Latin accents to their base
    letters (fixed translate table, see ACCENT_FROM/ACCENT_TO).

    Pure JVM expression (translate/lower/regexp_replace/trim) — stays
    inside codegen; every step has an identical portable SQL spelling
    (DuckDB: translate / lower / regexp_replace(..., 'g') / trim), so
    normalized-text hashes are reproducible across engines.  Fold runs
    first (case-preserving table, so lower() still applies), punctuation
    strip before whitespace collapse (punct may leave double spaces)."""
    out = col
    if ascii_fold:
        out = F.translate(out, ACCENT_FROM, ACCENT_TO)
    if lower:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, r"[!-/:-@\[-`{-~]", "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses and phone-shaped numbers with typed
    placeholder tags — the standard pre-training scrub pass.  Order
    matters: emails first (their domains contain dot-runs an IPv4 pattern
    could nibble), then IPs, then phones.  Chained regexp_replace, all
    JVM-side; Spark replaces every occurrence (DuckDB needs the 'g'
    flag for the same semantics)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document PII hit counts by type (before redaction) — the audit
    metric that decides whether a source needs the scrub at all."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(col, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)),
    }
