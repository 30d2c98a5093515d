"""Byte-pair-encoding tokenization (SURVEY.md E16 extension): merge-table
training and distributed merge application — the step between text curation
(q40-q46) and sequence packing (q79/q153) that every LLM training pipeline
runs to turn curated text into token ids.

Algorithm (Sennrich et al. 2016, the GPT-2 apply variant): a word starts as
its character sequence; a TRAINED, RANKED list of symbol-pair merges is
applied by repeatedly merging the lowest-ranked adjacent pair present until
none applies. Training picks each next merge as the corpus-frequency argmax
of adjacent pairs (q144_bpe_pair_stats computes exactly one round of those
statistics; this module iterates it to a full merge table and then applies
it).

Scale shape — the economics mirror q74/q96/q144:

- TRAIN: the heavy corpus pass collapses to the DISTINCT-WORD frequency
  relation (vocabulary grain) on the cluster; the iterative merge loop then
  runs driver-side over the top-``max_words`` slice of that relation (the
  standard practice: word-count distributed, trainer in memory — at 100 TB
  the distinct-word head covers ~99.9% of token mass, and the cap is the
  knob). The trainer never sees documents.
- APPLY: merges broadcast as a closure constant (a merge table is KBs);
  the pandas kernel runs at DISTINCT-WORD grain, never per document — the
  per-document expansion is a JVM-side broadcast join + explode weighted by
  word frequency, so Python cost is O(|vocab|), not O(corpus).

Equivalence note (the q164 oracle's foundation): for a WELL-FORMED merge
list (each merge's parts are base characters or outputs of strictly earlier
merges — every trained table is), applying merges one at a time in rank
order, each merging ALL its non-overlapping adjacent occurrences leftmost-
first, yields the same result as the rank-priority loop below: a later
merge's output symbol cannot create an adjacency an earlier merge matches.
And for a pair (a, b) with a != b, merge-all-adjacent over the symbol
sequence equals a greedy left-to-right string replace — which is how the
q164 DuckDB oracle replays the planted merges with single-char sentinels.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word under a rank table: repeatedly merge the
    lowest-ranked adjacent symbol pair (all non-overlapping occurrences,
    leftmost first) until no ranked pair remains. Pure function; the
    distributed path calls it from the pandas kernel at distinct-word
    grain."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def train_merges(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Fit a BPE merge table from a (word, frequency) relation: each round
    counts adjacent symbol pairs weighted by word frequency (the q144
    statistic), picks the (count DESC, pair ASC) argmax — fully
    deterministic, no hash-order dependence — merges it everywhere, and
    repeats. O(n_merges * total_symbols); intended for the CAPPED
    distinct-word head that ``bpe_train`` collects, not raw corpora."""
    words: list[tuple[list[str], int]] = [(list(w), f) for w, f in word_freqs if len(w) >= 2]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for k, (syms, f) in enumerate(words):
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[k] = (out, f)
    return merges


def bpe_train(words_df: DataFrame, n_merges: int, max_words: int = 200_000) -> list[tuple[str, str]]:
    """Distributed trainer front-end: ``words_df`` is the distinct-word
    frequency relation (columns ``token``, ``f``). The cluster computes it;
    the driver collects only the top-``max_words`` head by (f DESC, token)
    — a bounded relation at any corpus size — and fits merges locally.
    Truncation is the standard trade: dropped tail words still TOKENIZE
    fine at apply time (their pairs just never become merges)."""
    head = words_df.orderBy(F.col("f").desc(), "token").limit(max_words).collect()
    return train_merges([(r["token"], r["f"]) for r in head], n_merges)


def bpe_tokens_udf(merges: list[tuple[str, str]]) -> Column:
    """Factory for the Arrow-batched apply kernel: a pandas UDF mapping a
    word column to its token array under ``merges``. The rank table rides
    in the closure (broadcast once per executor, KBs). Call it on the
    DISTINCT-WORD relation and join back by word — never on a per-document
    column."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(words: pd.Series) -> pd.Series:
        return words.map(lambda w: apply_merges(w, ranks))

    return _encode


def vocab_ids(chars: list[str], merges: list[tuple[str, str]]) -> dict[str, int]:
    """Stable vocabulary: base characters (sorted) get ids 1..A, merged
    tokens get A+1..A+M in merge order — the id layout a tokenizer ships,
    independent of corpus counts."""
    ids = {c: i + 1 for i, c in enumerate(sorted(chars))}
    for j, (a, b) in enumerate(merges):
        ids[a + b] = len(chars) + j + 1
    return ids


def viterbi_segment(word: str, scores: dict[str, int], max_piece: int | None = None) -> tuple[int, int]:
    """Unigram-LM (SentencePiece-style) optimal segmentation by Viterbi
    DP over integer micro-log-prob piece scores: returns
    (best_score, n_optimal) — the maximum total score over ALL
    segmentations of ``word`` into vocabulary pieces, and the exact
    number of distinct segmentations achieving it. Pure integer
    arithmetic, so both values are engine- and replay-exact (q204's
    oracle recomputes them by exhaustive 2^(n-1) mask enumeration).

    Every single character is expected to be in ``scores`` (the unigram
    vocab always contains the alphabet), so a segmentation always
    exists; raises if a character is missing rather than guessing.
    """
    n = len(word)
    NEG = None
    best = [NEG] * (n + 1)
    ways = [0] * (n + 1)
    best[0], ways[0] = 0, 1
    # DP window = the vocab's true max piece length: a hardcoded cap would
    # silently drop segmentations using longer pieces, breaking the
    # "optimal over ALL segmentations" contract (ADVICE r8)
    if max_piece is None:
        max_piece = max(map(len, scores), default=1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece), i):
            if best[j] is None:
                continue
            s = scores.get(word[j:i])
            if s is None:
                continue
            cand = best[j] + s
            if best[i] is None or cand > best[i]:
                best[i], ways[i] = cand, ways[j]
            elif cand == best[i]:
                ways[i] += ways[j]
    if best[n] is None:
        raise ValueError(f"word {word!r} has no segmentation under the vocab")
    return best[n], ways[n]


def viterbi_udf(scores: dict[str, int]) -> Column:
    """Arrow-batched kernel applying viterbi_segment at DISTINCT-WORD
    grain (the q144/q164 economics: per-vocabulary-entry cost, never
    per-occurrence). ``scores`` ships in the closure — vocabulary-sized,
    a broadcast variable on a real cluster. Returns a struct column
    (best_micro, n_best)."""

    mp = max(map(len, scores), default=1)  # scan the vocab once, not per word

    @pandas_udf("best_micro long, n_best long")
    def _seg(words: pd.Series) -> pd.DataFrame:
        rows = [viterbi_segment(w, scores, mp) for w in words]
        return pd.DataFrame(rows, columns=["best_micro", "n_best"])

    return _seg


# ---- byte-level BPE (round 9, VERDICT r8 #5) -------------------------------
#
# Production GPT-2-family tokenizers operate on UTF-8 BYTES, not unicode
# chars, with a printable byte<->char bijection making every byte a
# one-char symbol — that is what makes the tokenizer TOTAL on arbitrary
# unicode (any codepoint decomposes into bytes already in the alphabet;
# nothing is ever OOV). This engine uses the uniform bijection
# byte b -> chr(256 + b): every byte-symbol lands in U+0100..U+01FF,
# disjoint from ASCII (so oracle sentinels stay collision-free) and
# computable in one expression on BOTH engines (Python chr / DuckDB chr),
# unlike GPT-2's piecewise printable map, which encodes the same
# information with a lookup nobody else needs to share. The char-grain
# trainer/apply kernels (train_merges / apply_merges) work UNCHANGED on
# byte-char strings, so the distinct-word-grain economics and the q164
# sentinel-replace oracle equivalence carry over verbatim.

BYTE_CHAR_OFFSET = 256


def byte_encode(word: str) -> str:
    """UTF-8 bytes of ``word`` as a byte-char string (one char per byte)."""
    return "".join(chr(BYTE_CHAR_OFFSET + b) for b in word.encode("utf-8"))


def byte_decode(sym: str) -> bytes:
    """Inverse bijection: a byte-char token back to its raw bytes (which
    may be a partial UTF-8 sequence — byte tokens need not align to
    codepoints; that is the point of byte-level BPE)."""
    return bytes(ord(c) - BYTE_CHAR_OFFSET for c in sym)


def byte_bpe_train(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Fit byte-level merges: byte-encode the (word, f) head, then the
    char-grain trainer runs unchanged over byte-char symbols. Merges may
    span codepoint boundaries (e.g. fuse the two bytes of 'é' and then
    fuse that with a neighboring ASCII byte)."""
    return train_merges([(byte_encode(w), f) for w, f in word_freqs], n_merges)


def byte_bpe_tokens_udf(merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched byte-level apply kernel: word column -> array of
    byte-char tokens under ``merges``. Same distinct-word-grain contract
    as bpe_tokens_udf; byte-encoding happens inside the kernel so the
    JVM side never materializes the byte-char intermediate."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(words: pd.Series) -> pd.Series:
        return words.map(lambda w: apply_merges(byte_encode(w), ranks))

    return _encode
