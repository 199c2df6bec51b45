"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched encode.

The real thing, not the regex proxy (`text.bpe_token_count_col` estimates
token counts from the pre-tokenization split; this module learns an actual
merge table and tokenizes with it — what a training-data pipeline needs to
report true token budgets, pack sequences to a real vocabulary, and feed
samplers).

Training (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units", algorithm 1) factors exactly the way BPE has always
been trained at scale:

1. **Corpus pass — distributed.** ONE ``groupBy(word).count()`` over the
   whitespace pre-tokenization (map-side-partial combine, the only shuffle),
   then ``TakeOrdered`` of the top ``max_words`` by ``(count DESC, word
   ASC)`` to the driver. The word-frequency dict is the standard BPE
   training input; distinct words grow ~Heaps-law sublinearly in corpus
   size and the deterministic cap bounds driver memory regardless — a
   100 TB corpus reaches the driver as at most ``max_words`` rows.
2. **Merge loop — driver, exact.** Classic indexed implementation: pair
   counts plus a pair→words inverted index, so each merge touches only the
   words containing it. Ties break to the lexicographically smallest pair;
   the loop stops at ``num_merges`` or when the best pair's count drops
   below ``min_frequency``. Every step is integer arithmetic over the
   frequency dict — the merge table is a pure function of the corpus
   (partitioning- and order-independent, pinned by tests).

A merge is applied as ONE left-to-right non-overlapping replacement pass.
Encoding applies the merge table in rank order, one such pass per merge —
this is exactly the trainer's own application rule, and since a merge's
output symbol cannot appear in any earlier merge (it did not exist yet),
one pass per rank is a fixed point: encoding a training word reproduces the
trainer's final symbol sequence (tested).

Encoding runs as ``mapInPandas`` (Arrow batches, never per-row Python) with
a per-batch word cache — web corpora repeat words heavily, so each task
pays ~O(unique words × merges) not O(tokens). The merge table rides the
closure (a few thousand pairs, far below broadcast-worthy size).

Reference parity: not present in the reference (it moves rows, it doesn't
read them) — this is the repo's LLM-data-pipeline layer. The gate row is
rows-only: an iterative merge loop is not expressible in ANSI SQL, so the
DuckDB side cannot twin it; correctness is pinned by the independent
from-scratch reimplementation in ``tests/test_bpe.py`` instead.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker appended to every word's symbol sequence

DEFAULT_NUM_MERGES = 200
DEFAULT_MAX_WORDS = 100_000
DEFAULT_MIN_FREQUENCY = 2


# ------------------------------------------------------------------ kernel
# pure-python pieces shared by trainer and encoder (and importable by the
# test-side oracle for independent cross-checking)


def merge_word(syms: tuple, pair: tuple) -> tuple:
    """One left-to-right non-overlapping replacement pass of ``pair``."""
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str, merges: list[tuple]) -> tuple:
    """Symbol sequence of ``word`` under the merge table (rank order, one
    pass per merge — the trainer's own application rule)."""
    syms = tuple(word) + (EOW,)
    for pair in merges:
        if len(syms) == 1:
            break
        syms = merge_word(syms, pair)
    return syms


def learn_merges(
    word_freqs: dict[str, int],
    num_merges: int = DEFAULT_NUM_MERGES,
    min_frequency: int = DEFAULT_MIN_FREQUENCY,
) -> list[tuple]:
    """Exact BPE merge loop over a word-frequency dict (indexed: each merge
    re-counts only the words that contain it)."""
    vocab: list[list] = []  # [symbols tuple, freq]
    for w, f in word_freqs.items():
        if w:
            vocab.append([tuple(w) + (EOW,), int(f)])

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)

    def account(idx: int, sign: int) -> None:
        syms, freq = vocab[idx]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += sign * freq
            if sign > 0:
                pair_words[p].add(idx)
            # stale negative-side membership is pruned lazily below

    for i in range(len(vocab)):
        account(i, +1)

    merges: list[tuple] = []
    while len(merges) < num_merges and pair_counts:
        # deterministic argmax: highest count, then smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_frequency:
            break
        merges.append(best)
        for idx in sorted(pair_words.pop(best, ())):
            syms, freq = vocab[idx]
            if best not in set(zip(syms, syms[1:])):
                continue  # lazily-pruned stale index entry
            account(idx, -1)
            vocab[idx][0] = merge_word(syms, best)
            account(idx, +1)
        # drop exhausted counters so the argmax scan stays tight
        for p in [p for p, c in pair_counts.items() if c <= 0]:
            del pair_counts[p]
            pair_words.pop(p, None)
    return merges


# ------------------------------------------------------------ Spark surface


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int = DEFAULT_MAX_WORDS
) -> list[tuple[str, int]]:
    """The one distributed step: word → count (map-side-partial agg, one
    shuffle), top ``max_words`` by (count DESC, word ASC) to the driver."""
    counts = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("_w")
        )
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    rows = (
        counts.orderBy(F.col("_c").desc(), F.col("_w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["_w"], r["_c"]) for r in rows]


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = DEFAULT_NUM_MERGES,
    max_words: int = DEFAULT_MAX_WORDS,
    min_frequency: int = DEFAULT_MIN_FREQUENCY,
) -> list[tuple]:
    """Learn a BPE merge table from a document corpus. Returns the ordered
    merge list ``[(left, right), ...]`` — rank = list position."""
    freqs = dict(word_frequencies(docs, text_col, max_words))
    return learn_merges(freqs, num_merges, min_frequency)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge table. Returns one row per
    document: ``id_col``, ``tokens array<string>``, ``n_tokens``; NULL text
    → NULL tokens, ``n_tokens = 0``. Arrow-batched ``mapInPandas`` with a
    per-batch unique-word cache — no shuffle, no per-row Python."""
    import pandas as pd

    frozen = [tuple(p) for p in merges]
    in_schema = docs.select(id_col, text_col).schema
    id_t = in_schema[0].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, tokens array<string>, n_tokens long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple] = {}

        def enc(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, frozen)
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(
                        lambda t: 0 if t is None else len(t)
                    ).astype("int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
