"""Text-analysis operators (SURVEY.md E16): tokenization, quality scoring,
language-ID heuristic, fingerprinting.

All pure Catalyst expressions (split/regexp/md5/higher-order functions) so
they vectorize and survive at corpus scale — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English function-word list for the stopword-ratio heuristics
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")


def tokens(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count(text_col: str | Column) -> Column:
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str | Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND letter/digit/
    punctuation boundaries — a cheap deterministic proxy for BPE tokenizers
    when budgeting LLM training data."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.split(col, r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])")
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_ratio(text_col: str | Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def mean_token_len(text_col: str | Column) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col: str | Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    function-word presence — the standard cheap pre-filter for LLM corpora."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    len_ok = F.when((F.length(col) >= 50) & (F.length(col) <= 20000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(col) >= 0.05, 1.0).otherwise(0.6)
    return F.round((len_ok + punct_ok + stop_ok) / 3.0, 6)


def langid_en_score(text_col: str | Column) -> Column:
    """English-likeness score = stopword hit-rate of the token stream.

    N-gram-free heuristic language ID: real language detectors are a
    model lookup; at pipeline scale the stopword rate is the standard
    first-pass filter and is fully expressible in SQL for the oracle.
    """
    return F.round(stopword_ratio(text_col), 6)


def fingerprint(text_col: str | Column) -> Column:
    """Normalized document fingerprint: md5 over lowercased,
    whitespace-collapsed text. Stable across engines (oracle-checkable),
    and the natural key for exact dedup of noisy text."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    "Repetition removal" — the standard LLM-corpus cleaning family):

    - ``top_unigram_share``: occurrences of the most frequent token /
      total tokens (a high share marks keyword-stuffed or looping text);
    - ``dup_token_frac``: 1 - distinct/total tokens;
    - ``dup_bigram_frac``: 1 - distinct/total word bigrams (catches
      repeated phrases that unigram stats miss).

    One posexploded token stream feeds two branches: unigram stats via
    (doc, token) then (doc) hash aggregations, and bigrams via a lead()
    window over (doc, position) then a (doc) aggregation. The window form
    was chosen over dedup.word_shingles (whose regex assumes single-space
    separators) and over element_at-in-transform array lambdas (which
    re-evaluate the tokenize per element, O(len^2) per doc). Everything
    is exact and engine-portable, so the whole panel is
    SQL-oracle-checkable.
    """
    from pyspark.sql import Window as W

    # one posexploded token stream feeds both aggregations; bigrams come
    # from a lead() window over (doc, position) — no per-element HOF
    # lambdas (an element_at-in-transform form re-evaluates the tokenize
    # per element: O(len^2) per doc), no sequence() edge cases
    toks = df.select(id_col, F.posexplode(tokens(text_col)).alias("_pos", "_t"))
    per_token = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_n"))
    uni = per_token.groupBy(id_col).agg(
        F.sum("_n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("_n").alias("_top_n"),
    )
    w = W.partitionBy(id_col).orderBy("_pos")
    bi = (
        toks.select(id_col, F.concat("_t", F.lit(" "), F.lead("_t", 1).over(w)).alias("_bi"))
        .filter(F.col("_bi").isNotNull())  # last token of each doc has no successor
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n_bi"), F.count_distinct("_bi").alias("_n_distinct_bi"))
    )
    return (
        uni.join(bi, id_col, "left")  # docs with < 2 tokens have no bigrams
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("_top_n") / F.greatest("n_tokens", F.lit(1)), 6).alias("top_unigram_share"),
            F.round(1 - F.col("n_distinct_tokens") / F.greatest("n_tokens", F.lit(1)), 6).alias("dup_token_frac"),
            # a doc with no bigrams (under 2 tokens) has nothing repeated
            F.when(F.coalesce("_n_bi", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(1 - F.col("_n_distinct_bi") / F.col("_n_bi"), 6))
            .alias("dup_bigram_frac"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).

    Character k-grams of the normalized text are hashed; a sliding window
    of ``w`` consecutive k-gram hashes keeps its minimum; the distinct
    window-minima are the document's fingerprint set. Any shared substring
    of length >= w+k-1 between two documents is GUARANTEED to share a
    fingerprint — the standard local (position-robust) alternative to the
    global md5 fingerprint, used for plagiarism/overlap detection.

    Engine-portable by construction: md5-hex k-gram hashes with
    lexicographic min, so a SQL engine computes bit-identical fingerprints
    (the Rabin-Karp rolling recurrence would be cheaper per gram but ties
    the fingerprints to one engine's integer arithmetic and can't be
    oracle-checked).

    Scale: one explode (len(text) rows per doc) + one per-doc window pass
    (shuffle keyed on the doc id; sort bounded by document length) +
    map-side-combinable distinct. Nothing crosses documents, so the
    operator partitions perfectly by doc.

    Returns (id_col, fp) — one row per distinct fingerprint per doc.
    """
    from pyspark.sql import Window as W

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    # repartition ON THE DOC ID between normalization and k-gram explode:
    # (a) it is the exact hash partitioning the window pass below requires,
    # so it adds no shuffle the plan wouldn't already have; (b) the
    # exchange is a projection-collapse barrier — without it Catalyst
    # inlines the regexp_replace into the per-element gram lambda and
    # re-normalizes the document once per k-gram.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    normed = df.select(id_col, normalized.alias("_norm")).repartition(n_parts, id_col)
    # explode POSITIONS, then hash as a flat row expression: md5/substr at
    # the top level compile into whole-stage codegen, where the same
    # expressions inside a transform() lambda evaluate interpreted per
    # element (the repo's measured ~90ns/element HOF tax).
    # The when() guard is load-bearing: docs with fewer than k normalized
    # chars (incl. empty/NULL text) have NO k-grams, but Spark's
    # sequence(1, stop) with stop < 1 infers a NEGATIVE step and yields
    # [1, 0] instead of an empty array — which would hand every short doc
    # a spurious md5-of-fragment fingerprint and disagree with SQL
    # generate_series (empty). when-without-otherwise yields NULL, and
    # posexplode of NULL emits no rows. (A row filter would be wrong too:
    # pushed below the projection, it re-evaluates the normalization regex
    # per row — pinned at one evaluation by test_plans.)
    positions = normed.select(
        id_col,
        "_norm",
        F.posexplode(
            F.when(F.length("_norm") >= k, F.sequence(F.lit(1), F.length("_norm") - (k - 1)))
        ).alias("_pos", "_i"),
    )
    exploded = positions.select(id_col, "_pos", F.md5(F.col("_norm").substr(F.col("_i"), F.lit(k))).alias("_h"))
    win = W.partitionBy(id_col).orderBy("_pos").rowsBetween(W.currentRow, w - 1)
    return exploded.select(id_col, F.min("_h").over(win).alias("fp")).distinct()


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document stat panel."""
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        F.round(mean_token_len(text_col), 6).alias("mean_token_len"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )


# PII patterns chosen for identical semantics under Java regex (Spark) and
# RE2 (DuckDB): no lookarounds, no backreferences, ASCII classes only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+1-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
)


def pii_counts(text_col: str | Column) -> list[Column]:
    """Per-pattern match counts (email, phone, ip) — pure Catalyst regex."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(f"n_{name}s")
        for name, pat, _tok in PII_PATTERNS
    ]


def pii_scrub(text_col: str | Column) -> Column:
    """Redact PII spans with typed placeholder tokens.

    Patterns apply in declaration order (email before ip so a dotted
    local-part is consumed as part of the email, not re-matched as an
    address). Everything is JVM-side regexp_replace — the scrub runs at
    scan speed with no shuffle and no Python.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def html_escape(text_col: str | Column) -> Column:
    """Escape text into HTML body content (&, <, > — amp FIRST, or the
    escapes themselves would be double-escaped). The synthesis half of
    the q148 round-trip."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def html_strip(html_col: str | Column) -> Column:
    """Boilerplate removal: drop tags, then decode the core entities
    (&lt; &gt; &quot; &#39; then &amp; LAST — the inverse order of
    escaping, or '&amp;lt;' would decode twice to '<'). The web-corpus
    curation step that runs before any text-quality scoring; pure
    Catalyst (regexp + replace chain), no Python row path."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    c = F.regexp_replace(c, r"<[^>]*>", "")
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&#39;"), F.lit("'"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))
