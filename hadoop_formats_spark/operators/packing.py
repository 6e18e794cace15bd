"""Sequence packing for LLM pretraining: assign documents to
fixed-token-budget training sequences (bins).

The packing rule is cumulative-sum binning: within a partition key,
documents are taken in a deterministic order and a document's bin is
``floor(exclusive_cumsum_tokens / budget)`` — the standard streaming
greedy packer (documents are never split; a bin may overflow by at most
one document's tail, which the fill_frac statistics expose).  This is
the semantics an `ORDER BY`-window can express, so the DuckDB oracle
can mirror it bit-for-bit.

Scale: the window partitions by (part_cols..., shard), where shard =
``doc_id % n_shards``.  A window partitioned only by a low-cardinality
key (e.g. lang) would sort each language's entire corpus inside single
tasks — the classic global-sort bottleneck; sharding bounds every sort
to corpus/n_shards rows while keeping assignment deterministic (each
shard packs independently, exactly like independent writer tasks in a
real pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int = 512,
    part_cols: tuple[str, ...] = ("lang",),
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bin assignment: (part_cols..., shard, doc_id,
    n_tokens, bin_id).  Token count is whitespace tokens of the
    lowercased text (swap in ``bpe_ish_tokens`` size for a
    BPE-tracking count)."""
    n_tok = F.size(F.split(F.lower(F.col(text_col)), " "))
    base = docs.select(
        *part_cols,
        (F.col(id_col) % n_shards).alias("shard"),
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*part_cols, "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget),
    )


def pack_stats(
    packed: DataFrame,
    *,
    budget: int,
    part_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Per-bin packing statistics: (part_cols..., shard, bin_id,
    n_docs, total_tokens, fill_frac).  fill_frac > 1 marks the bins
    that absorbed a document's overflow tail."""
    return packed.groupBy(*part_cols, "shard", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(budget), 4).alias("fill_frac"),
    )


def chunk_tokens(
    docs: DataFrame,
    *,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking — context-window preparation with
    overlap (window - stride tokens shared between neighbors), the
    other half of sequence prep next to :func:`pack_sequences`
    (packing composes whole short documents; chunking splits long
    ones).

    Chunk starts are 0, stride, 2·stride, …; the count is
    1 + ceil(max(n - window, 0) / stride), so every token is covered
    and only the final chunk may run short.  Map-only: tokenize,
    compute the chunk count, ``explode`` a sequence, ``slice`` —
    no shuffle, no UDF; a 100 TB corpus chunks at scan speed and the
    fan-out is rows-out ≈ rows-in · n/stride."""
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), " "), "")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("n", F.size("toks"))
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.col("n") - window, F.lit(0)) + stride - 1) / stride
    ).cast("int")
    return (
        base.select(
            "doc_id",
            "toks",
            "n",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                F.col("toks"), F.col("chunk_id") * stride + 1, window
            ).alias("chunk_toks"),
            F.least(
                F.lit(window), F.col("n") - F.col("chunk_id") * stride
            ).alias("n_tokens"),
        )
    )
