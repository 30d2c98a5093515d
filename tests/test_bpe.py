"""BPE tokenization tests (operators/bpe.py): the apply loop against an
independent sequential reference, trainer determinism, distributed/local
parity, and the q164 planted-table closed form."""

from __future__ import annotations

import random

from kafka_connect_bigquery_storage_write_spark.operators.bpe import (
    apply_merges,
    bpe_tokens_udf,
    bpe_train,
    train_merges,
    vocab_ids,
)


def _sequential_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: apply merges ONE AT A TIME in rank order,
    each merging all non-overlapping adjacent occurrences leftmost-first —
    the definition the q164 sentinel-replace oracle implements. For
    well-formed merge lists this equals the operator's rank-priority loop
    (operators/bpe.py module docstring)."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


PLANTED = [
    ("t", "h"), ("i", "n"), ("a", "n"), ("th", "e"), ("in", "g"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("e", "s"), ("th", "ing"),
]


def test_apply_matches_sequential_on_handpicked_words():
    for w, want in [
        ("the", ["the"]),
        ("thing", ["thing"]),
        ("things", ["thing", "s"]),  # 's' left over; 'es' never forms (e consumed)
        ("there", ["the", "re"]),
        ("ther", ["the", "r"]),      # 'the' beats 'er' for the shared e
        ("ering", ["er", "ing"]),
        ("anon", ["an", "on"]),
        ("tthhe", ["t", "th", "h", "e"]),
        ("ththe", ["th", "the"]),
        ("es", ["es"]),
        ("x", ["x"]),
        ("", []),
    ]:
        ranks = {p: i for i, p in enumerate(PLANTED)}
        assert apply_merges(w, ranks) == want, w
        assert _sequential_apply(w, PLANTED) == want, w


def test_apply_matches_sequential_on_random_words():
    """Priority loop == rank-order sequential application on random words
    over a small alphabet (dense pair hits), for the planted table AND for
    random well-formed trained tables."""
    rng = random.Random(42)
    alpha = "theringsaon"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 24))) for _ in range(400)]
    ranks = {p: i for i, p in enumerate(PLANTED)}
    for w in words:
        got = apply_merges(w, ranks)
        assert got == _sequential_apply(w, PLANTED), w
        assert "".join(got) == w  # tokenization is a partition of the word
    # trained tables are well-formed by construction — same equivalence,
    # including same-char pairs like ('e','e') the planted table avoids
    freqs = [(w, rng.randint(1, 9)) for w in words]
    merges = train_merges(freqs, n_merges=12)
    ranks2 = {p: i for i, p in enumerate(merges)}
    for w in words:
        got = apply_merges(w, ranks2)
        assert got == _sequential_apply(w, merges), (w, merges)
        assert "".join(got) == w


def test_trainer_matches_hand_computation():
    """aaab x3 + ab x2: pair counts round 1: (a,a)=6, (a,b)=5 -> merge
    (a,a); round 2: (aa,a)=3, (a,b)=3+2=... recount on merged corpus:
    words aa,a,b / a,b -> (aa,a)=3, (a,b)=5 -> merge (a,b)."""
    merges = train_merges([("aaab", 3), ("ab", 2)], n_merges=2)
    assert merges == [("a", "a"), ("a", "b")]
    # deterministic tie-break: equal counts pick the lexicographically
    # smallest pair
    assert train_merges([("ab", 1), ("cd", 1)], n_merges=1) == [("a", "b")]


def test_distributed_train_and_apply_match_local(spark):
    rng = random.Random(7)
    alpha = "abcde"
    corpus = ["".join(rng.choice(alpha) for _ in range(rng.randint(2, 10))) for _ in range(300)]
    freqs: dict[str, int] = {}
    for w in corpus:
        freqs[w] = freqs.get(w, 0) + 1
    words_df = spark.createDataFrame(sorted(freqs.items()), "token string, f long")
    merges = bpe_train(words_df, n_merges=8)
    assert merges == train_merges(sorted(freqs.items()), 8)
    # distributed apply kernel == local apply, word by word
    import pyspark.sql.functions as F

    enc = bpe_tokens_udf(merges)
    got = {r["token"]: r["toks"] for r in words_df.select("token", enc(F.col("token")).alias("toks")).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for w in freqs:
        assert got[w] == apply_merges(w, ranks), w


def test_vocab_ids_layout():
    ids = vocab_ids(["b", "a"], [("a", "b"), ("ab", "a")])
    assert ids == {"a": 1, "b": 2, "ab": 3, "aba": 4}


def test_q164_plan_applies_at_distinct_word_grain(spark, sf_dir):
    """The Python kernel must run on the distinct-word relation (AFTER the
    word-frequency hash aggregate), never on the doc-grain exploded tokens,
    and the id table must broadcast — the q74/q96 economics pinned."""
    import contextlib
    import io

    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q164_bpe_encode"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # exactly one Python eval site, fed by the word-grain aggregate: the
    # ArrowEvalPython node must appear with HashAggregate below it in the
    # formatted tree (node ids ascend from the leaves in the header tree)
    assert plan.count("ArrowEvalPython") >= 1, plan
    header = plan.split("\n\n")[0]
    agg_lines = [i for i, l in enumerate(header.splitlines()) if "HashAggregate" in l]
    py_lines = [i for i, l in enumerate(header.splitlines()) if "ArrowEvalPython" in l]
    assert py_lines and agg_lines, plan
    # at least one aggregate sits BELOW the python eval in the tree text
    # (formatted header prints root first, so below = larger line index)
    assert any(a > min(py_lines) for a in agg_lines), plan


def test_viterbi_segment_matches_exhaustive_enumeration():
    """DP best score AND co-optimal count equal brute-force enumeration
    of all 2^(n-1) boundary masks, across 200 random vocabularies."""
    import random

    from kafka_connect_bigquery_storage_write_spark.operators.bpe import viterbi_segment

    rng = random.Random(5)
    for _ in range(200):
        w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        scores = {c: rng.randint(-50, -1) for c in "abc"}
        for _ in range(4):
            i = rng.randint(0, len(w) - 1)
            j = rng.randint(i + 1, len(w))
            scores[w[i:j]] = rng.randint(-60, -1)
        best, cnt = None, 0
        n = len(w)
        for mask in range(1 << (n - 1)):
            pieces, start = [], 0
            for i in range(1, n):
                if mask >> (i - 1) & 1:
                    pieces.append(w[start:i])
                    start = i
            pieces.append(w[start:])
            if all(p in scores for p in pieces):
                s = sum(scores[p] for p in pieces)
                if best is None or s > best:
                    best, cnt = s, 1
                elif s == best:
                    cnt += 1
        assert viterbi_segment(w, scores) == (best, cnt), (w, scores)


def test_viterbi_segment_raises_on_unsegmentable():
    import pytest as _pytest

    from kafka_connect_bigquery_storage_write_spark.operators.bpe import viterbi_segment

    with _pytest.raises(ValueError):
        viterbi_segment("xy", {"x": -1})


def test_viterbi_segment_pieces_longer_than_eight_chars():
    """ADVICE r8: the DP window derives from the vocab's true max piece
    length — a 12-char piece must win, not be silently skipped."""
    from kafka_connect_bigquery_storage_write_spark.operators.bpe import viterbi_segment

    word = "abcdefghijkl"
    scores = {c: -10 for c in word}
    assert viterbi_segment(word, scores) == (-120, 1)
    scores[word] = -5  # one 12-char piece beats 12 singles
    assert viterbi_segment(word, scores) == (-5, 1)
    # explicit window narrower than the vocab still honors the contract via
    # the caller passing the true max; the default derives it
    assert viterbi_segment(word, scores, max_piece=len(word)) == (-5, 1)


def test_byte_encode_bijection_and_totality():
    from kafka_connect_bigquery_storage_write_spark.operators.bpe import byte_decode, byte_encode

    for s in ["hello", "thé", "日本語", "a\x00b", "🙂ok", ""]:
        enc = byte_encode(s)
        assert len(enc) == len(s.encode("utf-8"))
        assert all(0x100 <= ord(c) <= 0x1FF for c in enc)
        assert byte_decode(enc).decode("utf-8") == s


def test_byte_bpe_merges_span_codepoint_boundaries():
    """Train on words containing 'é' (2 UTF-8 bytes): the trainer must
    fuse the C3+A9 pair and then fuse ACROSS the codepoint boundary —
    and apply must reproduce the training segmentation."""
    from kafka_connect_bigquery_storage_write_spark.operators.bpe import (
        apply_merges,
        byte_bpe_train,
        byte_encode,
    )

    freqs = [("thé", 50), ("théâtre", 20), ("the", 5)]
    merges = byte_bpe_train(freqs, 4)
    bc = lambda ch: chr(256 + ch)
    # most frequent pair is t+h (55) then th+C3 (70 occurrences? no: thé
    # words 70) — the exact ranking is deterministic; just pin the
    # spanning property and round-trip:
    assert (bc(0xC3), bc(0xA9)) in merges or any(
        (0xC3 in [ord(x) - 256 for x in a + b]) and (0xA9 in [ord(x) - 256 for x in a + b])
        for a, b in merges
    )
    ranks = {p: i for i, p in enumerate(merges)}
    toks = apply_merges(byte_encode("thé"), ranks)
    # 'thé' (4 bytes) compresses under 4 merges trained on it
    assert 1 <= len(toks) <= 2
    # totality: a word with bytes never seen in training still tokenizes
    toks2 = apply_merges(byte_encode("日本"), ranks)
    assert b"".join(__import__("kafka_connect_bigquery_storage_write_spark.operators.bpe", fromlist=["byte_decode"]).byte_decode(t) for t in toks2).decode("utf-8") == "日本"
