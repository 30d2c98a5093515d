"""Winnowing fingerprint tests: the SIGMOD'03 guarantee and determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_connect_bigquery_storage_write_spark.operators.text import winnow_fingerprints

K, W = 8, 16


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, k=K, w=W)
    return {
        doc: {r.fp for r in grp}
        for doc, grp in _group(out.collect())
    }


def _group(rows):
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r)
    return by.items()


def test_shared_substring_guarantees_shared_fingerprint(spark):
    """Any common substring of length >= w + k - 1 must yield at least one
    common fingerprint — the winnowing guarantee that makes the fingerprint
    set usable for overlap detection."""
    shared = "the quick brown fox jumps over a lazy dog near the bank"  # 56 chars >= 23
    a = "PREFIX AAA " + shared + " SUFFIX one"
    b = "other lead-in text " + shared + " unrelated tail"
    fps = _fps(spark, [(1, a), (2, b)])
    assert fps[1] & fps[2], "documents sharing a long substring must share a fingerprint"


def test_disjoint_texts_share_nothing(spark):
    fps = _fps(
        spark,
        [(1, "alpha beta gamma delta epsilon zeta eta theta"), (2, "0123456789 9876543210 abcdefgh hgfedcba")],
    )
    assert not (fps[1] & fps[2])


def test_fingerprints_position_invariant(spark):
    """Winnowing is local: shifting a document inside unrelated padding
    preserves the interior fingerprints (unlike the global md5)."""
    body = "consistent interior content that is plenty long for several windows"
    fps = _fps(spark, [(1, body), (2, "XXXX YYYY ZZZZ " + body)])
    # every interior fingerprint of doc 1 whose k-grams lie fully in `body`
    # also appears for doc 2; assert substantial overlap rather than exact
    # equality (boundary windows differ)
    inter = fps[1] & fps[2]
    assert len(inter) >= max(1, len(fps[1]) // 2)


def test_deterministic_across_runs(spark):
    rows = [(i, f"document number {i} with some repeated filler text " * 3) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, winnow_fingerprints(df, k=K, w=W).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df, k=K, w=W).collect()))
    assert a == b


def test_normalization_collapses_whitespace_and_case(spark):
    fps = _fps(
        spark,
        [(1, "Sphinx of Black Quartz,   Judge my VOW please"), (2, "sphinx of black quartz, judge my vow please")],
    )
    assert fps[1] == fps[2]


def test_fingerprint_count_bounded_by_grams(spark):
    text = "a" * 100  # 93 identical k-grams -> all windows share one min
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = winnow_fingerprints(df, k=K, w=W)
    assert out.count() == 1


def test_distinct_output_no_duplicate_rows(spark):
    df = spark.createDataFrame([(1, "some repeating text " * 10)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    assert len(rows) == len({(r.doc_id, r.fp) for r in rows})


def test_winnow_matches_pure_python_reference(spark):
    """Property check vs an independent reference implementation: for
    random texts the operator's fingerprint set must equal a direct
    python transcription of the winnowing definition (hashlib md5,
    trailing windows included, distinct per doc)."""
    import hashlib
    import random

    def reference(text: str, k: int = K, w: int = W) -> set[str]:
        t = " ".join(text.lower().strip().split())
        grams = [hashlib.md5(t[i : i + k].encode()).hexdigest() for i in range(max(len(t) - k + 1, 0))]
        return {min(grams[i : i + w]) for i in range(len(grams))} if grams else set()

    rng = random.Random(7)
    words = ["alpha", "bravo", "charlie", "Delta", "echo42", "fox-trot", "golf", "HOTEL", "india", "x"]
    rows = []
    for doc_id in range(30):
        n = rng.randint(0, 25)
        rows.append((doc_id, " ".join(rng.choice(words) for _ in range(n)) + ("   " if rng.random() < 0.3 else "")))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == reference(text), f"doc {doc_id}: {text!r}"


def test_short_empty_and_null_docs_have_no_fingerprints(spark):
    """Docs shorter than k (incl. empty/whitespace/NULL text) have no
    k-grams and must yield ZERO fingerprints — regression for Spark's
    sequence(1, 0) returning [1, 0] (descending) instead of empty."""
    rows = [(1, "x"), (2, ""), (3, "   "), (4, None), (5, "seven77"), (6, "exactly8")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, k=K, w=W).collect()
    assert {r.doc_id for r in got} == {6}  # only the doc with >= k chars
    assert len(got) == 1


def test_repetition_signals_known_values(spark):
    from kafka_connect_bigquery_storage_write_spark.operators.text import repetition_signals

    rows = [
        (1, "spam spam spam spam"),          # one token repeated 4x
        (2, "all tokens here are unique"),   # no repetition
        (3, "one"),                          # single token: no bigrams
        (4, "ab cd ab cd ab cd"),            # bigram loop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert got[1].n_tokens == 4 and got[1].top_unigram_share == 1.0 and got[1].dup_token_frac == 0.75
    assert got[1].dup_bigram_frac == round(1 - 1 / 3, 6)  # 3 bigrams, all "spam spam"
    assert got[2].dup_token_frac == 0.0 and got[2].dup_bigram_frac == 0.0
    assert got[3].n_tokens == 1 and got[3].dup_bigram_frac == 0.0  # no bigrams -> 0, not NULL
    # "ab cd" x3: 5 bigrams, 2 distinct ("ab cd", "cd ab")
    assert got[4].dup_bigram_frac == round(1 - 2 / 5, 6)


def test_pii_scrub_agrees_with_python_re_on_adversarial_strings(spark):
    """Cross-check the Catalyst regex path against Python re over
    adversarial embeddings of PII in noise: same counts, same scrubbed
    text, and no pattern survives its own scrub."""
    import re

    from kafka_connect_bigquery_storage_write_spark.operators.text import PII_PATTERNS, pii_counts, pii_scrub

    cases = [
        "plain text with nothing to find",
        "a@b.co",
        "x a.b-c_d%e+f@sub.domain-x.org y",
        "no@tld or @missing and trailing@dot.",
        "+1-555-0199 and +1-000-0000 but not +2-555-0199",
        "10.0.0.1 edge 255.255.255.255 not 1234.1.1.1 inner 1.2.3.4.5",
        "mixed: u1@example.com from 10.1.2.3 call +1-555-1234 twice +1-555-9999",
        "email-in-url http://u2@example.com/path and ip:8.8.8.8.",
        "dotted.local.part@x.io beside 192.168.0.10",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, note string")
    got = {
        r.i: (r.n_emails, r.n_phones, r.n_ips, r.scrubbed)
        for r in df.select("i", *pii_counts("note"), pii_scrub("note").alias("scrubbed")).collect()
    }
    for i, c in enumerate(cases):
        expected = c
        counts = []
        for _name, pat, token in PII_PATTERNS:
            counts.append(len(re.findall(pat, expected)))
            expected = re.sub(pat, lambda _m, t=token: t, expected)
        assert got[i] == (*counts, expected), (c, got[i], (counts, expected))
        # nothing PII-shaped survives the scrub
        for _name, pat, _token in PII_PATTERNS:
            assert not re.search(pat, got[i][3].replace("[EMAIL]", "").replace("[PHONE]", "").replace("[IP]", ""))


def test_html_strip_roundtrip_property():
    """strip(wrap(text)) == text for adversarial content — entity-looking
    literals ('&amp;', '&lt;'), angle brackets, quotes, newlines — the
    exact inputs where a wrong decode order double-decodes."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.text import html_escape, html_strip

    texts = [
        "&amp; already escaped?", "<script>alert(1)</script>", "a & b < c > d",
        "&lt;nested&gt; &amp;lt;", "quotes \" and ' here", "line1\nline2\ttab",
        "", "&", "<", ">", "&#39;", "&quot;ok&quot;",
    ]
    import kafka_connect_bigquery_storage_write_spark.session as S

    spark = S.get_spark(app_name="html-prop", cpus=2, shuffle_partitions=2)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    page = F.concat(F.lit("<html><body><p>"), html_escape("text"), F.lit("</p></body></html>"))
    out = df.select("text", html_strip(page).alias("back")).collect()
    for r in out:
        assert r["back"] == r["text"], (r["text"], r["back"])


def test_group_disjoint_split_no_straddle(spark, sf_dir):
    """q183's contract: no source appears in two splits, every doc is in
    exactly one split, and all three splits are nonempty on the fixture."""
    import pyspark.sql.functions as F

    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("source"), 1, 2), 16, 10).cast("int") % 10
    tagged = docs.withColumn(
        "split", F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    per_source = tagged.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_source)
    assert tagged.count() == docs.count()
    splits = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
