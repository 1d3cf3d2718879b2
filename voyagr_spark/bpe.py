"""Byte-pair-encoding tokenizer: merge learning + distributed application.

A training-data pipeline op from the brief (real token counting under a
learned subword vocabulary), not a reference-engine operator: the algorithm
is Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units" (ACL 2016) — learn_bpe's most-frequent-pair loop and
apply_bpe's rank-greedy merge, re-expressed for Spark:

* **Training** is the offline tokenizer-train step every real pipeline runs
  single-node over a bounded vocabulary (HF tokenizers, sentencepiece do the
  same): the DISTRIBUTED part is the word-frequency count (one partial-agg
  shuffle over the corpus); the merge loop then runs driver-side over the
  collected top-`max_words` vocabulary, which is bounded regardless of
  corpus size.
* **Application** costs Python time proportional to the DISTINCT-WORD
  vocabulary, not the corpus: each distinct word is encoded once in an
  Arrow-batched mapInPandas pass with the merge ranks broadcast, and the
  per-word subtoken counts broadcast-join back onto the per-(doc, word)
  count table.  The corpus-sized work is all JVM-side (split / explode /
  partial-agg sums).

Everything is deterministic (count-desc, pair-asc tie-breaks), so the same
corpus always yields the same merge table on any cluster size.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: end-of-word marker appended as a separate symbol (Sennrich §3.2)
END = "</w>"


def bpe_learn(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn an ordered merge list from word frequencies (learn_bpe).

    Each iteration merges the most frequent adjacent symbol pair across the
    vocabulary (counts weighted by word frequency); ties break to the
    lexicographically smallest pair so the result is deterministic.  Stops
    early when no pair occurs twice."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_apply(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with a learned merge table (apply_bpe): repeatedly
    merge the adjacent pair with the LOWEST merge rank (all its occurrences,
    left to right) until no adjacent pair is in the table."""
    sym: list[str] = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _doc_words(spark, sf_dir: str) -> DataFrame:
    """(doc_id, word, n) — per-doc whitespace-word counts, one partial-agg
    shuffle; the shared corpus-side input of train and apply."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    spark, sf_dir: str, num_merges: int = 40, max_words: int = 50_000
) -> list[tuple[str, str]]:
    """Distributed word count -> driver-side merge learning.

    The collect is bounded at `max_words` most-frequent words (count desc,
    word asc — deterministic), the standard tokenizer-training cut; at
    100 TB the word count is the only corpus-sized job here."""
    wc = (
        _doc_words(spark, sf_dir)
        .groupBy("word")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return bpe_learn({r["word"]: r["c"] for r in wc}, num_merges)


def bpe_word_subtokens(
    spark, words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode each DISTINCT word once -> (word, subtokens array, n_sub).

    One Arrow-batched mapInPandas pass over the distinct-word table with the
    merge ranks broadcast — the Python cost scales with vocabulary size, and
    the pass is map-only (no shuffle)."""
    ranks = {p: i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def kernel(batches):
        r = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            subs = []
            for w in pdf["word"]:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = bpe_apply(w, r)
                subs.append(got)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subtokens": subs,
                    "n_sub": [len(s) for s in subs],
                }
            )

    return words.select("word").distinct().mapInPandas(
        kernel, "word string, subtokens array<string>, n_sub long"
    )


def bpe_token_counts(
    spark, sf_dir: str, num_merges: int = 40
) -> DataFrame:
    """q: per-doc BPE token counts under a corpus-trained merge table ->
    (doc_id, n_words, n_bpe) — real subword token counting for training-data
    budgeting (the upgrade over whitespace/regex approximations).

    Scale shape: one (doc, word) partial-agg shuffle, a vocabulary-sized
    map-only encode, a broadcast join of the (small) word->n_sub dictionary
    back onto the counts, one doc-keyed partial-agg sum."""
    merges = bpe_train(spark, sf_dir, num_merges)
    dw = _doc_words(spark, sf_dir)
    subs = bpe_word_subtokens(spark, dw, merges).select("word", "n_sub")
    return (
        dw.join(F.broadcast(subs), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_sub")).alias("n_bpe"),
        )
    )
