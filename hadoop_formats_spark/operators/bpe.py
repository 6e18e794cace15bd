"""Distributed BPE merge training (Sennrich et al. 2016) — learn the
top byte-pair-encoding merges from a corpus, Spark-first.

The training state is tiny (one merge rule per round); the work is
corpus-sized and stays distributed: the word-frequency table is one
partial-aggregating groupBy (vocabulary-sized from then on — BPE
training never rescans raw text after round 0), per-round pair
counting is another partial-agg groupBy over adjacent symbol pairs,
and applying a merge is a map-only higher-order fold over each word's
symbol list.  Like ``kmeans_iterations`` (similarity.py), the single
winning pair per round is collected to the driver (one row — the
MLlib-style iterative pattern) and embedded as a literal in the next
round's plan, so plans stay shallow and each round's work is one
vocabulary scan.

Symbol sequences are encoded as a unit-separator (0x1f) string so the
greedy left-to-right merge is ONE string fold with no array
re-allocation per step, and — deliberately — the exact same
``list_reduce`` fold is expressible in DuckDB SQL, making the whole
trainer oracle-checkable bit-for-bit: a merge fires when the
accumulator's LAST symbol equals the left part (boundary-guarded by
the separator) and the incoming symbol equals the right part; the
merged symbol is their concatenation, which can never equal the left
part again, so rescanning is impossible and the fold is exactly
greedy non-overlapping left-to-right — standard BPE application
order.

Simplification vs production BPE (documented, not hidden): symbols
start as characters of whitespace-lowercased words with no
end-of-word marker and no byte fallback; the merge-learning loop —
the distributed part — is the real algorithm."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def word_freqs(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, freq, syms) — the vocabulary-with-counts table BPE
    trains on; ``syms`` is the character sequence, SEP-encoded.  One
    partial-agg groupBy over the exploded token stream; everything
    after this is vocabulary-sized."""
    words = docs.select(
        F.explode(
            F.array_remove(F.split(F.lower(F.col(text_col)), " "), "")
        ).alias("word")
    )
    freq = words.groupBy("word").agg(F.count("*").alias("freq"))
    chars = F.array_remove(F.split(F.col("word"), ""), "")
    return freq.withColumn("syms", F.array_join(chars, SEP))


def pair_counts(corpus: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the current segmentation:
    (a, b, n).  Partial-aggregating groupBy — each task emits one row
    per distinct pair it saw."""
    toks = F.split(F.col("syms"), SEP)
    n = F.size(toks)
    pairs = corpus.select(
        F.col("freq"),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    )
    return pairs.select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq"
    ).groupBy("a", "b").agg(F.sum("freq").alias("n"))


def merge_fold(syms_col: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right merge of pair (a, b) in a SEP-encoded
    symbol string — one higher-order fold, no UDF."""
    toks = F.split(syms_col, SEP)
    return F.aggregate(
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.element_at(toks, 1),
        lambda acc, x: F.when(
            ((acc == a) | acc.endswith(F.concat(F.lit(SEP), a))) & (x == b),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def bpe_train(
    docs: DataFrame,
    *,
    rounds: int = 3,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``rounds`` merges.  Returns one dict per round:
    {round, left_sym, right_sym, pair_n} — the driver-held model
    (like k-means centroids).  Ties break deterministically by
    (count desc, left asc, right asc), so retries reproduce the same
    merge table."""
    base = word_freqs(docs, text_col=text_col).persist()
    try:
        corpus = base
        merges: list[dict] = []
        for r in range(rounds):
            best = (
                pair_counts(corpus)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .first()
            )
            if best is None:
                break
            merges.append(
                {
                    "round": r,
                    "left_sym": best.a,
                    "right_sym": best.b,
                    "pair_n": best.n,
                }
            )
            corpus = corpus.withColumn(
                "syms",
                merge_fold(F.col("syms"), F.lit(best.a), F.lit(best.b)),
            )
        return merges
    finally:
        # the raw-text scan really does run once: every round's action
        # replays only persisted-vocabulary + chained folds (the same
        # persist discipline kmeans_iterations uses for its training set)
        base.unpersist()


def apply_merges(
    corpus: DataFrame, merges: list[dict]
) -> DataFrame:
    """Re-apply a learned merge table declaratively (chained folds,
    map-only) — the tokenizer side of BPE."""
    out = corpus
    for m in merges:
        out = out.withColumn(
            "syms",
            merge_fold(
                F.col("syms"), F.lit(m["left_sym"]), F.lit(m["right_sym"])
            ),
        )
    return out
